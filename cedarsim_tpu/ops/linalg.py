"""Dense linear algebra that works in f64/c128 on TPU.

XLA:TPU's builtin LuDecomposition expander only implements f32 and c64
(verified on hardware: "Only F32 and C64 types are implemented in
LuDecomposition"), but circuit matrices need f64 — conductances span ~15
decades.  TPUs *do* emulate f64 elementwise ops, so we provide a pure-JAX LU
with partial pivoting built only from elementwise ops, gathers, and outer
products; it compiles for any dtype and vmaps cleanly for batched sweeps.

On CPU (tests) and for f32/c64 on TPU we defer to the native
``jnp.linalg.solve`` (LAPACK / XLA expander), which is faster.

Replaces the reference's KLU/UMFPACK+LAPACK dependency (SURVEY.md §2.10) for
the dense path; circuits up to a few hundred unknowns are faster dense+batched
on the MXU than sparse.  A structurally-sparse path is planned for large
circuits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _native_ok(dtype) -> bool:
    if jax.default_backend() == "cpu":
        return True
    return jnp.dtype(dtype) in (jnp.dtype(jnp.float32), jnp.dtype(jnp.complex64))


def lu_factor(A):
    """LU with partial pivoting: returns (LU, perm) where LU packs L (unit
    diagonal, below) and U (on/above diagonal), and ``perm`` maps factored row
    order to original rows (P@A = L@U with P[i, perm[i]] = 1)."""
    n = A.shape[-1]
    idx = jnp.arange(n)
    tiny = jnp.asarray(1e-300 if A.real.dtype == jnp.float64 else 1e-30,
                       A.real.dtype)

    def body(k, carry):
        LU, perm = carry
        col = LU[:, k]
        mag = jnp.where(idx >= k, jnp.abs(col), -jnp.inf)
        p = jnp.argmax(mag)
        # swap rows k <-> p
        rk, rp = LU[k], LU[p]
        LU = LU.at[k].set(rp).at[p].set(rk)
        pk, pp = perm[k], perm[p]
        perm = perm.at[k].set(pp).at[p].set(pk)
        pivot = LU[k, k]
        safe = jnp.where(jnp.abs(pivot) < tiny,
                         jnp.where(jnp.real(pivot) < 0, -tiny, tiny), pivot)
        mult = jnp.where(idx > k, LU[:, k] / safe, jnp.zeros_like(col))
        # trailing update on columns > k; store multipliers in column k
        upd = jnp.outer(mult, LU[k])
        LU = LU - upd * (idx[None, :] > k)
        LU = LU.at[:, k].set(jnp.where(idx > k, mult, LU[:, k]))
        return LU, perm

    return jax.lax.fori_loop(0, n, body, (A, idx))


def lu_solve(LU, perm, b):
    """Solve with factors from :func:`lu_factor` (single RHS, shape [n])."""
    n = LU.shape[-1]
    idx = jnp.arange(n)
    bp = b[perm]

    def fwd(i, y):
        s = jnp.sum(jnp.where(idx < i, LU[i] * y, jnp.zeros_like(y)))
        return y.at[i].set(bp[i] - s)

    y = jax.lax.fori_loop(0, n, fwd, jnp.zeros_like(bp))

    def bwd(j, x):
        i = n - 1 - j
        s = jnp.sum(jnp.where(idx > i, LU[i] * x, jnp.zeros_like(x)))
        return x.at[i].set((y[i] - s) / LU[i, i])

    return jax.lax.fori_loop(0, n, bwd, jnp.zeros_like(y))


def solve(A, b):
    """A x = b for one system; dtype-generic, TPU-safe.

    Row-equilibrates before factoring: circuit Jacobians mix kΩ-level
    conductances with unit-coefficient branch constraints, and scaling keeps
    partial pivoting honest in emulated f64.
    """
    if _native_ok(A.dtype):
        return jnp.linalg.solve(A, b[..., None])[..., 0]
    r = jnp.max(jnp.abs(A), axis=-1)
    r = jnp.where(r == 0, jnp.ones_like(r), r)
    As = A / r[:, None]
    bs = b / r
    LU, perm = lu_factor(As)
    return lu_solve(LU, perm, bs)


def solve_batched(A, b):
    """Batched solve over leading axes."""
    if _native_ok(A.dtype):
        return jnp.linalg.solve(A, b[..., None])[..., 0]
    f = solve
    for _ in range(A.ndim - 2):
        f = jax.vmap(f)
    return f(A, b)
