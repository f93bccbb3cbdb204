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


def test_sparse_plan_builds_lazily_under_ambient_trace():
    """Regression (VERDICT r3 weak #3): the 384-cell scale-curve leg died
    with TracerArrayConversionError inside SparseOps._numeric_weights when
    the LU plan was built lazily at trace time (dc_core/tran_core call
    get_sparse_ops while jit is tracing).  The probe must stay a concrete
    host-side computation — numpy input prep, eager CPU dispatch — with an
    ambient jit AND vmap trace active and traced params flowing through
    the solver itself."""
    import jax
    import jax.numpy as jnp
    from chain import build
    from cedarsim_tpu import SimSpec
    from cedarsim_tpu.analysis.dc import dc_core, default_newton_options

    c = build(6, sparse=True)
    assert "_sparse_ops" not in c.__dict__      # plan NOT prebuilt
    ctx = SimSpec.make(gmin=1e-15).with_mode("tranop")
    opts = default_newton_options(c)
    nb = 3
    pb = jax.tree.map(lambda a: jnp.repeat(a[None], nb, 0), c.params0)
    x0 = jnp.zeros((nb, c.n_x), c.dtype)
    # the plan is constructed INSIDE this trace
    r = jax.jit(jax.vmap(lambda p, x: dc_core(c, p, ctx, x, opts)))(pb, x0)
    assert "_sparse_ops" in c.__dict__          # built during tracing
    assert bool(np.all(np.asarray(r.converged)))
    # physics: matches the dense answer
    cd = build(6, sparse=False)
    from cedarsim_tpu import solve_dc
    rd = solve_dc(cd, ctx=SimSpec.make(gmin=1e-15), mode="tranop")
    assert np.abs(np.asarray(r.x[0]) - np.asarray(rd.x)).max() < 1e-8


def test_numeric_weights_include_mult():
    """The pivot-weight probe must scale KCL rows by the $mult instance
    multiplier exactly like the real assembly (res_jacs_sparse) — an m=8
    resistor's matrix entries are 8x the m=1 entries, and the static pivot
    matching should see them that way (ADVICE r3)."""
    from cedarsim_tpu import parse_spice, elaborate
    from cedarsim_tpu.core.compile import compile_circuit
    from cedarsim_tpu.core.sparse_ops import SparseOps

    def weights_for(m):
        nl = parse_spice(f"""* mult probe
V1 a 0 1
R1 a b 1k m={m}
R2 b 0 1k
.end
""")
        comp = compile_circuit(elaborate(nl), sparse=True)
        return SparseOps(comp), comp

    s1, c1 = weights_for(1)
    s8, c8 = weights_for(8)
    w1 = np.asarray(s1.probe_weights)
    w8 = np.asarray(s8.probe_weights)
    assert w1.shape == w8.shape
    # entries touched by the m= device scale by 8; the rest (V1 branch
    # rows, R2 rows, diagonal floor) stay equal
    ratio = w8 / w1
    assert ratio.max() > 7.9 and ratio.max() < 8.1, ratio
    assert np.all(ratio >= 0.99), ratio


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
