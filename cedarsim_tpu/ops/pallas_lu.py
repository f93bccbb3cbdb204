"""Pallas TPU kernel: batched dense LU solve (f32). EXPERIMENTAL.

One grid cell per batch element; the matrix tile lives in VMEM for the whole
factorization+solve, so the sequential elimination runs without HBM traffic
or per-op dispatch.  This is the mixed-precision path's factor kernel
(f32 factorization + f64 residual/iterative refinement = inexact Newton);
the f64 path stays on the pure-JAX LU in ops/linalg.py (Mosaic has no f64).

Status: numerically validated in Pallas interpret mode (exact vs
jnp.linalg.solve, incl. pivoting cases).  The Mosaic build in this
environment (libtpu 0.0.34 via the axon AOT helper) fails to legalize the
combined kernel ("failed to legalize operation 'func.return'") even though
each constituent pattern (value-carried fori loops, masked-reduction row
swaps, pivot selection) compiles in isolation — tracked for the next round /
newer Mosaic.  Not yet wired into the solvers.

Kernel-writing notes baked in below: all constants must be f32 (global x64
makes bare literals f64, which Mosaic cannot convert), loop counters ride
the carry as (1,1) i32 (fori induction vars are i64 under x64), everything
stays 2D, and row/element selection is by masked reduction, not dynamic
gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _lu_solve_kernel(a_ref, b_ref, out_ref, *, n: int):
    """Factor A in-register (partial pivoting) and solve Ax=b for one batch
    cell.  All values stay 2D (Mosaic legalizes 2D vectors best) and all
    row/element selection is by masked reduction (no dynamic gathers).
    a_ref: (1, np_, L); b/out: (1, 8, L) with the rhs in row 0."""
    A = a_ref[0]                           # (np_, L)
    b = b_ref[0, 0:1, :]                   # (1, L)
    np_, L = A.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)   # (np_, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)    # (1, L)
    rows_f = rows.astype(jnp.float32)
    BIGF = jnp.float32(1e9)
    # under global x64, bare float literals are f64 — Mosaic has no f64
    Z = jnp.float32(0.0)
    NEG = jnp.float32(-3.4e38)
    TINY = jnp.float32(1e-30)

    def s11(v):
        return jnp.sum(v, keepdims=True).reshape(1, 1)

    def fact_body(_, carry):
        # i32 step counter (1,1) in the carry: under x64 the fori induction
        # variable is i64, which Mosaic cannot lower; 0-D scalars are also
        # avoided — everything stays a 2D tile
        A, b, k = carry
        ck = jnp.sum(jnp.where(lanes == k, A, Z), axis=1,
                     keepdims=True)                      # (np_, 1)
        mag = jnp.where(rows >= k, jnp.abs(ck), NEG)
        mmax = jnp.max(mag, keepdims=True)               # (1, 1)
        # pivot row index selected in FLOAT space (integer min-reductions
        # are not legal in this Mosaic version)
        p_f = jnp.min(jnp.where(mag == mmax, rows_f, BIGF), keepdims=True)
        is_p_row = rows_f == p_f                         # (np_, 1)
        lanes_f = lanes.astype(jnp.float32)
        is_p_lane = lanes_f == p_f                       # (1, L)
        rk = jnp.sum(jnp.where(rows == k, A, Z), axis=0, keepdims=True)
        rp = jnp.sum(jnp.where(is_p_row, A, Z), axis=0, keepdims=True)
        A = jnp.where(rows == k, rp, jnp.where(is_p_row, rk, A))
        bk = s11(jnp.where(lanes == k, b, Z))
        bp = s11(jnp.where(is_p_lane, b, Z))
        b = jnp.where(lanes == k, bp, jnp.where(is_p_lane, bk, b))
        pivot = s11(jnp.where(lanes == k, rp, Z))
        safe = jnp.where(jnp.abs(pivot) < TINY,
                         jnp.where(pivot < Z, -TINY, TINY), pivot)
        ck2 = jnp.sum(jnp.where(lanes == k, A, Z), axis=1, keepdims=True)
        mult = jnp.where(rows > k, ck2 / safe, Z)        # (np_, 1)
        A = A - mult * jnp.where(lanes > k, rp, Z)
        # forward-eliminate b: b[i>k] -= mult[i]·b[k]; transpose the column
        # vector into lane space with a masked reduction
        multL = jnp.sum(jnp.where(lanes == rows, mult, Z), axis=0,
                        keepdims=True)                   # (1, L)
        b = b - multL * bp
        return A, b, k + jnp.ones((1, 1), jnp.int32)

    A, b, _ = jax.lax.fori_loop(
        0, n, fact_body, (A, b, jnp.zeros((1, 1), jnp.int32)))

    def back_body(_, carry):
        x, i = carry
        rowi = jnp.sum(jnp.where(rows == i, A, Z), axis=0, keepdims=True)
        sacc = s11(jnp.where(lanes > i, rowi * x, Z))
        bi = s11(jnp.where(lanes == i, b, Z))
        aii = s11(jnp.where(lanes == i, rowi, Z))
        xi = (bi - sacc) / aii
        return (jnp.where(lanes == i, xi, x),
                i - jnp.ones((1, 1), jnp.int32))

    x, _ = jax.lax.fori_loop(
        0, n, back_body,
        (jnp.zeros_like(b), jnp.full((1, 1), n - 1, jnp.int32)))
    out_ref[0, 0:1, :] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def lu_solve_batched_f32(A, b, interpret=False):
    """Solve A[i] x[i] = b[i] for a batch of small dense systems in f32.
    A: [B, n, n], b: [B, n] → [B, n]."""
    B, n, _ = A.shape
    np_ = _round_up(max(n, 8), 8)
    L = _round_up(max(n, 128), 128)
    Af = jnp.zeros((B, np_, L), jnp.float32)
    Af = Af.at[:, :n, :n].set(A.astype(jnp.float32))
    idx = jnp.arange(n, np_)
    Af = Af.at[:, idx, idx].set(1.0)
    bf = jnp.zeros((B, 8, L), jnp.float32)
    bf = bf.at[:, 0, :n].set(b.astype(jnp.float32))

    kern = functools.partial(_lu_solve_kernel, n=n)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, np_, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, L), jnp.float32),
        interpret=interpret,
    )(Af, bf)
    return out[:, 0, :n]
