"""Pallas batched-LU kernel tests (interpret mode; see module docstring for
the Mosaic status on this libtpu)."""

import jax
import jax.numpy as jnp
import numpy as np

from cedarsim_tpu.ops.pallas_lu import lu_solve_batched_f32


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
