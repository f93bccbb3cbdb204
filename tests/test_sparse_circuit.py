"""Sparse Newton path on real circuits: equality with dense, and scale."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "gf180_dff"))


def test_dff_chain_sparse_matches_dense():
    from chain import build
    from cedarsim_tpu import solve_dc, SimSpec
    ctx = SimSpec.make(gmin=1e-15)
    xs = {}
    for sp in (False, True):
        c = build(6, sparse=sp)
        r = solve_dc(c, ctx=ctx, mode="tranop")
        assert bool(r.converged)
        xs[sp] = np.asarray(r.x)
    assert np.abs(xs[True] - xs[False]).max() < 1e-10


def test_sparse_chord_newton_transient_matches_full():
    """Per-step chord Newton (jac_reuse=1) on the SPARSE path: frozen
    factorization (SparseOps.factorize/solve_factorized — KLU's
    klu_factor/klu_solve split), exact residuals, so the converged corrector
    solutions match full Newton's; only the iteration path differs."""
    from chain import build
    from cedarsim_tpu import tran, TranOptions, SimSpec
    from cedarsim_tpu.core.compile import use_sparse_solver
    c = build(2, sparse=True)
    assert use_sparse_solver(c)
    ctx = SimSpec.make(gmin=1e-15)
    sols = {}
    for jr in (0, 1):
        sol = tran(c, (0.0, 1e-7), ctx=ctx,
                   opts=TranOptions(max_steps=16384, jac_reuse=jr))
        assert sol.converged, f"jac_reuse={jr}"
        sols[jr] = sol
    # identical physics at flat-region probes (step sequences may differ)
    for t_probe in (4.5e-8, 6.8e-8, 9.9e-8):
        v0 = float(sols[0].interp("d1", t_probe))
        v1 = float(sols[1].interp("d1", t_probe))
        assert abs(v0 - v1) < 1e-2, (t_probe, v0, v1)


@pytest.mark.skipif(not os.environ.get("CEDARSIM_RUN_SLOW"),
                    reason="slow: set CEDARSIM_RUN_SLOW=1")
def test_large_chain_sparse_dc():
    """>=1000-unknown circuit solves through the sparse path (the dense
    path's O(n^2) memory / O(n^3) solve wall — VERDICT r1 weak #7)."""
    from chain import build
    from cedarsim_tpu import solve_dc, SimSpec
    c = build(90, sparse=True)
    assert c.n_x >= 1000, c.n_x
    r = solve_dc(c, ctx=SimSpec.make(gmin=1e-15), mode="tranop")
    assert bool(r.converged)
    x = np.asarray(r.x)
    # physics: every cell's Q node settles at a rail
    for k in range(1, 91):
        v = x[c.node_names.index(f"d{k}")]
        assert min(abs(v), abs(v - 5.0)) < 0.05, (k, v)


@pytest.mark.skipif(not os.environ.get("CEDARSIM_RUN_SLOW"),
                    reason="slow: set CEDARSIM_RUN_SLOW=1")
def test_bsim4_chain_sparse_matches_dense_dc():
    """Compact-model Jacobians (20 decades of entry magnitude, off-state
    zeros on structurally-present positions) are what broke the greedy
    static pivoting; the MC64 max-product matching + GESP boosting +
    equilibrated refinement must reproduce the dense answer."""
    from chain import build
    from cedarsim_tpu import solve_dc, SimSpec
    from cedarsim_tpu.analysis.dc import NewtonOptions
    ctx = SimSpec.make(gmin=1e-15)
    o = NewtonOptions(max_step=1.0, gmin_steps=14)
    xs = {}
    for sp in (False, True):
        c = build(20, models="bsim4", sparse=sp)
        r = solve_dc(c, ctx=ctx, mode="tranop", opts=o)
        assert bool(r.converged), f"sparse={sp}"
        xs[sp] = np.asarray(r.x)
    assert np.abs(xs[True] - xs[False]).max() < 1e-9


@pytest.mark.skipif(not os.environ.get("CEDARSIM_RUN_SLOW"),
                    reason="slow: set CEDARSIM_RUN_SLOW=1")
def test_bsim4_chain_40cell_sparse_transient():
    """End-to-end 40-cell (452-unknown) BSIM4 shift register through the
    sparse Newton path: the pulse on d0 must march down the chain one
    clock period per stage (ROADMAP round-3 #2 workload)."""
    from chain import build
    from cedarsim_tpu import solve_dc, tran, TranOptions, SimSpec
    from cedarsim_tpu.analysis.dc import NewtonOptions
    ctx = SimSpec.make(gmin=1e-15)
    o = NewtonOptions(max_step=1.0, gmin_steps=14)
    c = build(40, models="bsim4")
    from cedarsim_tpu.core.compile import use_sparse_solver
    assert use_sparse_solver(c) and c.n_x >= 400
    sol = tran(c, (0.0, 2e-7), ctx=ctx,
               opts=TranOptions(max_steps=16384), dc_opts=o)
    assert sol.converged
    # shift register: d1 high at 100 ns, d2 high one period later, d3 next
    assert abs(float(sol.interp("d1", 1.0e-7)) - 5.0) < 0.1
    assert abs(float(sol.interp("d2", 1.5e-7)) - 5.0) < 0.1
    assert abs(float(sol.interp("d3", 1.99e-7)) - 5.0) < 0.1
    assert abs(float(sol.interp("d2", 1.99e-7))) < 0.1


def test_breakpoint_near_duplicates_merge():
    """The same edge time computed through different float paths (45n+50n
    vs 20n+25n+50n) lands 1 ULP apart; the step controller then attempts
    the 1e-23 s step between them and h collapses.  breakpoints() must
    merge sub-femtosecond neighbors."""
    from chain import build
    import numpy as np
    c = build(2)
    bps = c.breakpoints(2e-7)
    assert len(bps) > 5
    assert np.diff(bps).min() > 1e-16, np.diff(bps).min()


def test_chain_transient_through_coincident_edges():
    """End-to-end: the 2-cell chain transient crosses the 96 ns corner
    where CLKN and D edges coincide (the h-collapse regression)."""
    from chain import build
    from cedarsim_tpu import tran, TranOptions, SimSpec
    c = build(2)
    sol = tran(c, (0.0, 2e-7), ctx=SimSpec.make(gmin=1e-15),
               opts=TranOptions(max_steps=16384))
    assert sol.converged
    v1 = float(sol.interp("d1", 1.99e-7))
    assert min(abs(v1), abs(v1 - 5.0)) < 0.1, v1
