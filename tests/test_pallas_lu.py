"""Pallas batched-LU kernel tests (interpret mode on CPU; the same kernels
legalize under Mosaic and run on-chip — benchmarks/pallas_lu_bench.json)."""

import jax
import jax.numpy as jnp
import numpy as np

from cedarsim_tpu.ops.pallas_lu import (lu_solve_batched_f32,
                                        lu_solve_batched_sublane_f32)


def test_pallas_lu_interpret_matches_linalg():
    key = jax.random.PRNGKey(0)
    B, n = 4, 25
    A = jax.random.normal(key, (B, n, n), jnp.float32) + 8 * jnp.eye(n)
    b = jax.random.normal(jax.random.PRNGKey(1), (B, n), jnp.float32)
    x = lu_solve_batched_f32(A, b, interpret=True)
    ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    assert float(jnp.max(jnp.abs(x - ref) / (1 + jnp.abs(ref)))) < 1e-5


def test_pallas_lu_pivoting():
    key = jax.random.PRNGKey(2)
    B, n = 2, 9
    A = jax.random.normal(key, (B, n, n), jnp.float32) + 5 * jnp.eye(n)
    A = A.at[:, 0, 0].set(1e-8)   # forces a pivot swap
    b = jnp.ones((B, n), jnp.float32)
    x = lu_solve_batched_f32(A, b, interpret=True)
    ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    assert float(jnp.max(jnp.abs(x - ref) / (1 + jnp.abs(ref)))) < 1e-4


def test_pallas_lu_sublane_matches_linalg():
    # the throughput kernel: batch in the sublane axis, GESP no-pivot.
    # Diagonally-dominant MNA-flavored systems (its contract: callers
    # equilibrate / iterate-refine for ill-scaled matrices).
    rng = np.random.default_rng(0)
    B, n = 16, 25
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    A += (n + 10) * np.eye(n, dtype=np.float32)
    b = rng.standard_normal((B, n)).astype(np.float32)
    x = lu_solve_batched_sublane_f32(jnp.asarray(A), jnp.asarray(b),
                                     interpret=True)
    ref = np.linalg.solve(A.astype(np.float64), b[..., None])[..., 0]
    rel = float(np.max(np.abs(np.asarray(x) - ref) / (1 + np.abs(ref))))
    assert rel < 1e-4


def test_pallas_lu_sublane_batch_not_multiple_of_tile():
    # B that isn't a multiple of the 128-lane tile: padding must not
    # corrupt real lanes, and identity-padded rows must stay harmless
    rng = np.random.default_rng(1)
    B, n = 37, 11
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    A += (n + 6) * np.eye(n, dtype=np.float32)
    b = rng.standard_normal((B, n)).astype(np.float32)
    x = lu_solve_batched_sublane_f32(jnp.asarray(A), jnp.asarray(b),
                                     interpret=True)
    ref = np.linalg.solve(A.astype(np.float64), b[..., None])[..., 0]
    rel = float(np.max(np.abs(np.asarray(x) - ref) / (1 + np.abs(ref))))
    assert rel < 1e-4


def test_pallas_lu_factor_subst_split():
    # the chord-Newton split: factor once, substitute many
    rng = np.random.default_rng(3)
    B, n = 12, 17
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    A += (n + 8) * np.eye(n, dtype=np.float32)
    from cedarsim_tpu.ops.pallas_lu import (lu_factor_batched_sublane_f32,
                                            lu_subst_batched_sublane_f32)
    LU = lu_factor_batched_sublane_f32(jnp.asarray(A), interpret=True)
    for seed in (4, 5):
        b = np.random.default_rng(seed).standard_normal((B, n)) \
            .astype(np.float32)
        x = lu_subst_batched_sublane_f32(LU, jnp.asarray(b), interpret=True)
        ref = np.linalg.solve(A.astype(np.float64), b[..., None])[..., 0]
        rel = float(np.max(np.abs(np.asarray(x) - ref) / (1 + np.abs(ref))))
        assert rel < 1e-4, (seed, rel)


def test_tran_dense_lu_mixed_matches_physics(monkeypatch):
    """End-to-end: a vmapped transient sweep with dense_lu='mixed' routes
    the chord factor/solve through the Pallas sublane kernels (interpret
    mode on CPU) and must land on the same RC closed form as the default
    exact-f64 path."""
    from cedarsim_tpu.ops import linalg
    monkeypatch.setattr(linalg, "_MIXED_INTERPRET", True)
    from cedarsim_tpu import (Circuit, Resistor, Capacitor, VSourcePULSE,
                              compile_circuit, Sweep)
    from cedarsim_tpu.analysis.tran import TranOptions
    from cedarsim_tpu.parallel.mesh import make_mesh, tran_sweep_sharded

    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourcePULSE, "V1", (vin, ckt.gnd),
            dict(v1=0.0, v2=2.0, td=1e-6, tr=1e-9, tf=1e-9, pw=8e-6,
                 per=20e-6))
    ckt.add(Resistor, "R1", (vin, vout), dict(r=1000.0))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=1e-9))
    comp = compile_circuit(ckt, dynamic_params=["r"])
    mesh = make_mesh()
    rs = np.linspace(500.0, 2200.0, 8)
    opts = TranOptions(dense_lu="mixed", jac_reuse=1)
    res = tran_sweep_sharded(comp, Sweep("R1.r", rs), (0.0, 6e-6), mesh,
                             opts=opts)
    assert np.asarray(res.finished).all()
    iv = comp.node_names.index("vout")
    ts = np.asarray(res.ts)
    vs = np.asarray(res.xs)[:, :, iv]
    t_probe = 3e-6
    for lane, r in enumerate(rs):
        got = np.interp(t_probe, ts[lane], vs[lane])
        want = 2.0 * (1 - np.exp(-(t_probe - 1e-6 - 0.5e-9) / (r * 1e-9)))
        assert abs(got - want) < 5e-3, (lane, r, got, want)


def test_pallas_lu_sublane_agrees_with_cell_kernel():
    rng = np.random.default_rng(2)
    B, n = 8, 20
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    A += (n + 8) * np.eye(n, dtype=np.float32)
    b = rng.standard_normal((B, n)).astype(np.float32)
    xs = lu_solve_batched_sublane_f32(jnp.asarray(A), jnp.asarray(b),
                                      interpret=True)
    xc = lu_solve_batched_f32(jnp.asarray(A), jnp.asarray(b),
                              interpret=True)
    assert float(jnp.max(jnp.abs(xs - xc))) < 1e-3
