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
