"""Pallas TPU kernels: batched dense LU solve (f32).

Two kernels:

* ``lu_solve_batched_f32`` — one grid cell per batch element, partial
  pivoting; the matrix tile lives in VMEM for the whole factorization+
  solve.  TPU grid cells execute SEQUENTIALLY on the core, so this shape
  leaves the 8x128 VPU mostly idle per step — correct, but a latency
  kernel, not a throughput one.
* ``lu_solve_batched_sublane_f32`` — the TPU-native layout: the BATCH
  rides the sublane axis (A as [n, TB, n] slabs, b/x as [n, TB]), so every
  elimination step is a fully-vectorized rank-1 update across TB cells at
  once and the per-step work saturates the VPU.  No pivoting; small
  pivots are GESP-boosted to ±tau (the static-pivot recipe the sparse path
  uses, ops/sparse_lu.py) — callers equilibrate and/or iterate-refine.

This is the mixed-precision path's factor kernel (f32 factorization + f64
residual certification = inexact Newton); the f64 path stays on the
pure-JAX LU in ops/linalg.py (Mosaic has no f64).

Mosaic legalization (round-4 root cause): with global x64 enabled, the two
sequential value-carried fori_loops get outlined into one function whose
return mixes the i32 (1,1) counters with the loops' i64 induction vars —
``failed to legalize 'func.return' (i32, i64, i64)``.  Each loop compiled
alone, which is why round 3 tracked this as a combined-kernel mystery.
Tracing the pallas_call under ``jax.enable_x64(False)`` makes induction
vars i32 and the kernel legalizes; inputs/outputs are f32 either way, so
callers see identical types.

Kernel-writing notes baked in below: all constants must be f32 (global x64
makes bare literals f64, which Mosaic cannot convert), loop counters ride
the carry as (1,1) i32, everything stays 2D, and row/element selection is
by masked reduction, not dynamic gathers.
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
    # trace under x64=off: fori induction vars become i32, which is what
    # lets Mosaic legalize the two-loop kernel (see module docstring)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            # raise the scoped-vmem ceiling from the 16 MB compiler
            # default (v5e carries 128 MB/core): larger (B, n) shapes --
            # e.g. the CMG DFF at B=128 under dense_lu="mixed" -- blow
            # the default kernel stack, not hardware
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
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


def _lu_sublane_kernel(a_ref, b_ref, out_ref, *, n: int):
    """GESP (no-pivot, boosted) factor+solve for TB batch cells at once.

    Layout: a_ref (np_, TB, L) = A[row, cell, col] — the batch in the
    SUBLANE axis of every (TB, L) slab, so each elimination step is one
    vectorized rank-1 update across all TB cells; b/out (np_r, TB) hold
    b[row, cell].  All selection is by masked reduction (no gathers), all
    constants f32, counters (1,1) i32."""
    A = a_ref[:]                            # (np_, TB, L)
    b = b_ref[:]                            # (np_r, TB)
    np_, TB, L = A.shape
    np_r = b.shape[0]
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (np_, 1, 1), 0)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (np_r, 1), 0)
    Z = jnp.float32(0.0)
    TAU = jnp.float32(1e-20)

    def fact_body(_, carry):
        A, b, k = carry
        k3 = k.reshape(1, 1, 1)
        k2 = k.reshape(1, 1)
        rowk = jnp.sum(jnp.where(rows3 == k3, A, Z), axis=0)      # (TB, L)
        colk = jnp.sum(jnp.where(lanes2[None] == k3, A, Z),
                       axis=2)                                     # (np_, TB)
        piv = jnp.sum(jnp.where(lanes2 == k2, rowk, Z),
                      axis=1, keepdims=True).reshape(1, TB)        # (1, TB)
        piv = jnp.where(jnp.abs(piv) < TAU,
                        jnp.where(piv < Z, -TAU, TAU), piv)
        mult = jnp.where(rows3[:, :, 0] > k2, colk / piv, Z)       # (np_, TB)
        rk_hi = jnp.where(lanes2 > k2, rowk, Z)                    # (TB, L)
        A = A - mult[:, :, None] * rk_hi[None]
        bk = jnp.sum(jnp.where(rows2 == k2, b, Z),
                     axis=0, keepdims=True)                        # (1, TB)
        b = b - jnp.where(rows2 > k2, mult[:np_r], Z) * bk
        return A, b, k + jnp.ones((1, 1), jnp.int32)

    A, b, _ = jax.lax.fori_loop(
        0, n, fact_body, (A, b, jnp.zeros((1, 1), jnp.int32)))

    # back-substitution: x kept in BOTH layouts — x2 (np_r, TB) for the
    # output write, xT (TB, L) lane-indexed for the row-dot reduction
    def back_body(_, carry):
        x2, xT, i = carry
        i3 = i.reshape(1, 1, 1)
        i2 = i.reshape(1, 1)
        rowi = jnp.sum(jnp.where(rows3 == i3, A, Z), axis=0)      # (TB, L)
        sacc = jnp.sum(jnp.where(lanes2 > i2, rowi * xT, Z),
                       axis=1, keepdims=True).reshape(1, TB)       # (1, TB)
        bi = jnp.sum(jnp.where(rows2 == i2, b, Z),
                     axis=0, keepdims=True)                        # (1, TB)
        aii = jnp.sum(jnp.where(lanes2 == i2, rowi, Z),
                      axis=1, keepdims=True).reshape(1, TB)
        aii = jnp.where(jnp.abs(aii) < TAU,
                        jnp.where(aii < Z, -TAU, TAU), aii)
        xi = (bi - sacc) / aii                                     # (1, TB)
        x2 = jnp.where(rows2 == i2, xi, x2)
        xT = jnp.where(lanes2 == i2, xi.reshape(TB, 1), xT)
        return x2, xT, i - jnp.ones((1, 1), jnp.int32)

    x2, _, _ = jax.lax.fori_loop(
        0, n, back_body,
        (jnp.zeros((np_r, TB), jnp.float32),
         jnp.zeros((TB, L), jnp.float32),
         jnp.full((1, 1), n - 1, jnp.int32)))
    out_ref[:] = x2


def sublane_tiles(B: int, n: int, tile_b: int = 128):
    """Padded dims + VMEM-budgeted batch tile for the sublane kernels:
    returns (np_, L, TB, Bp) or None when no feasible tiling exists.

    TB must be a multiple of 128 (the b/x slabs put the batch in the LANE
    axis) — or the whole padded batch, which Mosaic also accepts.  The A
    slab (np_, TB, L) must fit VMEM with double-buffering headroom (~6 MB
    of the 16 MB)."""
    L = _round_up(max(n, 128), 128)
    np_ = _round_up(max(n, 8), 8)
    budget = 6 * 1024 * 1024
    slab = np_ * L * 4
    TB = max(128, _round_up(tile_b, 128))
    while TB > 128 and TB * slab > budget:
        TB -= 128
    if TB * slab > budget:
        TB = _round_up(B, 8)
        if TB * slab > budget:
            return None
    return np_, L, TB, _round_up(B, TB)


def _pack_A(A, np_, L, Bp):
    """[B, n, n] -> [np_, Bp, L] slabs (row, cell, col), identity-padded
    rows so the elimination loop is harmless on padding."""
    B, n, _ = A.shape
    Af = jnp.zeros((np_, Bp, L), jnp.float32)
    Af = Af.at[:n, :B, :n].set(jnp.swapaxes(A.astype(jnp.float32), 0, 1))
    idx = jnp.arange(n, np_)
    Af = Af.at[idx, :, idx].set(1.0)
    return Af


def _pack_b(v, np_, Bp):
    """[B, n] -> [np_, Bp]."""
    B, n = v.shape
    vf = jnp.zeros((np_, Bp), jnp.float32)
    return vf.at[:n, :B].set(v.astype(jnp.float32).T)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def lu_solve_batched_sublane_f32(A, b, tile_b: int = 128, interpret=False):
    """Solve A[i] x[i] = b[i] for a batch of small dense systems in f32,
    batch in the sublane axis (the TPU-throughput layout — one vectorized
    elimination serves tile_b cells per step).  GESP: no pivoting, tiny
    pivots boosted; equilibrate / iterate-refine outside for ill-scaled
    systems.  A: [B, n, n], b: [B, n] -> [B, n].

    ``tile_b`` must be a multiple of 128: the batch axis is the LAST axis
    of the b/x slabs (lane-aligned), and the middle (sublane) axis of A."""
    B, n, _ = A.shape
    tiles = sublane_tiles(B, n, tile_b)
    if tiles is None:
        raise ValueError(
            f"lu_solve_batched_sublane_f32: n={n} B={B} exceeds the "
            "VMEM slab budget; use lu_solve_batched_f32 or the sparse path")
    np_, L, TB, Bp = tiles
    Af = _pack_A(A, np_, L, Bp)
    bf = _pack_b(b, np_, Bp)

    kern = functools.partial(_lu_sublane_kernel, n=n)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            grid=(Bp // TB,),
            in_specs=[
                pl.BlockSpec((np_, TB, L), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((np_, TB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((np_, TB), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((np_, Bp), jnp.float32),
            interpret=interpret,
        )(Af, bf)
    return out[:n, :B].T


def _lu_factor_sublane_kernel(a_ref, out_ref, *, n: int):
    """GESP factor-only for TB batch cells at once: writes the packed LU
    (unit-L multipliers below the diagonal, boosted-pivot U on/above) back
    in the same slab layout — the factor half of the chord (modified)
    Newton factor-once/solve-many split."""
    A = a_ref[:]                            # (np_, TB, L)
    np_, TB, L = A.shape
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (np_, 1, 1), 0)
    lanes3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    Z = jnp.float32(0.0)
    TAU = jnp.float32(1e-20)

    def fact_body(_, carry):
        A, k = carry
        k3 = k.reshape(1, 1, 1)
        k2 = k.reshape(1, 1)
        rowk = jnp.sum(jnp.where(rows3 == k3, A, Z), axis=0)      # (TB, L)
        colk = jnp.sum(jnp.where(lanes3 == k3, A, Z), axis=2)     # (np_, TB)
        piv = jnp.sum(jnp.where(lanes2 == k2, rowk, Z),
                      axis=1, keepdims=True).reshape(1, TB)        # (1, TB)
        piv = jnp.where(jnp.abs(piv) < TAU,
                        jnp.where(piv < Z, -TAU, TAU), piv)
        mult = jnp.where(rows3[:, :, 0] > k2, colk / piv, Z)       # (np_, TB)
        rk_hi = jnp.where(lanes2 > k2, rowk, Z)                    # (TB, L)
        A = A - mult[:, :, None] * rk_hi[None]
        # pack: multipliers into column k below the diagonal, the boosted
        # pivot onto the diagonal (so the substitution kernel never
        # re-derives the boost)
        colmask = lanes3 == k3                                     # (1,1,L)
        A = jnp.where(jnp.logical_and(colmask, rows3 > k3),
                      mult[:, :, None], A)
        A = jnp.where(jnp.logical_and(colmask, rows3 == k3),
                      piv.reshape(1, TB, 1), A)
        return A, k + jnp.ones((1, 1), jnp.int32)

    A, _ = jax.lax.fori_loop(
        0, n, fact_body, (A, jnp.zeros((1, 1), jnp.int32)))
    out_ref[:] = A


def _lu_subst_sublane_kernel(lu_ref, b_ref, out_ref, *, n: int):
    """Forward+back substitution with packed LU slabs from the factor
    kernel: y = L⁻¹b (unit diagonal), x = U⁻¹y.  Same dual-layout trick as
    the combined kernel: the running solution lives in both (np_r, TB)
    row-indexed and (TB, L) lane-indexed forms."""
    A = lu_ref[:]                           # (np_, TB, L) packed LU
    b = b_ref[:]                            # (np_r, TB)
    np_, TB, L = A.shape
    np_r = b.shape[0]
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (np_, 1, 1), 0)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (np_r, 1), 0)
    Z = jnp.float32(0.0)

    def fwd_body(_, carry):
        y2, yT, i = carry
        i3 = i.reshape(1, 1, 1)
        i2 = i.reshape(1, 1)
        rowi = jnp.sum(jnp.where(rows3 == i3, A, Z), axis=0)      # (TB, L)
        sacc = jnp.sum(jnp.where(lanes2 < i2, rowi * yT, Z),
                       axis=1, keepdims=True).reshape(1, TB)       # (1, TB)
        bi = jnp.sum(jnp.where(rows2 == i2, b, Z),
                     axis=0, keepdims=True)                        # (1, TB)
        yi = bi - sacc                                             # (1, TB)
        y2 = jnp.where(rows2 == i2, yi, y2)
        yT = jnp.where(lanes2 == i2, yi.reshape(TB, 1), yT)
        return y2, yT, i + jnp.ones((1, 1), jnp.int32)

    y2, yT, _ = jax.lax.fori_loop(
        0, n, fwd_body,
        (jnp.zeros((np_r, TB), jnp.float32),
         jnp.zeros((TB, L), jnp.float32),
         jnp.zeros((1, 1), jnp.int32)))

    def back_body(_, carry):
        x2, xT, i = carry
        i3 = i.reshape(1, 1, 1)
        i2 = i.reshape(1, 1)
        rowi = jnp.sum(jnp.where(rows3 == i3, A, Z), axis=0)      # (TB, L)
        sacc = jnp.sum(jnp.where(lanes2 > i2, rowi * xT, Z),
                       axis=1, keepdims=True).reshape(1, TB)       # (1, TB)
        yi = jnp.sum(jnp.where(rows2 == i2, y2, Z),
                     axis=0, keepdims=True)                        # (1, TB)
        aii = jnp.sum(jnp.where(lanes2 == i2, rowi, Z),
                      axis=1, keepdims=True).reshape(1, TB)        # boosted
        xi = (yi - sacc) / aii
        x2 = jnp.where(rows2 == i2, xi, x2)
        xT = jnp.where(lanes2 == i2, xi.reshape(TB, 1), xT)
        return x2, xT, i - jnp.ones((1, 1), jnp.int32)

    x2, _, _ = jax.lax.fori_loop(
        0, n, back_body,
        (jnp.zeros((np_r, TB), jnp.float32),
         jnp.zeros((TB, L), jnp.float32),
         jnp.full((1, 1), n - 1, jnp.int32)))
    out_ref[:] = x2


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def lu_factor_batched_sublane_f32(A, tile_b: int = 128, interpret=False):
    """GESP (no-pivot, boosted) LU factor of a batch of small dense systems
    in f32, batch in the sublane axis.  A: [B, n, n] -> packed LU [B, n, n]
    (unit-L below, boosted-pivot U on/above).  Pair with
    :func:`lu_subst_batched_sublane_f32`; equilibrate / iterate-refine
    outside for ill-scaled systems."""
    B, n, _ = A.shape
    tiles = sublane_tiles(B, n, tile_b)
    if tiles is None:
        raise ValueError(
            f"lu_factor_batched_sublane_f32: n={n} B={B} exceeds the VMEM "
            "slab budget; use the pure-JAX LU or the sparse path")
    np_, L, TB, Bp = tiles
    Af = _pack_A(A, np_, L, Bp)
    kern = functools.partial(_lu_factor_sublane_kernel, n=n)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            grid=(Bp // TB,),
            in_specs=[pl.BlockSpec((np_, TB, L), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((np_, TB, L), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((np_, Bp, L), jnp.float32),
            interpret=interpret,
        )(Af)
    return jnp.swapaxes(out[:n, :B, :n], 0, 1)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def lu_subst_batched_sublane_f32(LU, b, tile_b: int = 128, interpret=False):
    """Solve with packed-LU factors from
    :func:`lu_factor_batched_sublane_f32`.  LU: [B, n, n], b: [B, n] ->
    [B, n] (all f32)."""
    B, n, _ = LU.shape
    tiles = sublane_tiles(B, n, tile_b)
    if tiles is None:
        raise ValueError(
            f"lu_subst_batched_sublane_f32: n={n} B={B} exceeds the VMEM "
            "slab budget")
    np_, L, TB, Bp = tiles
    Af = _pack_A(LU, np_, L, Bp)
    bf = _pack_b(b, np_, Bp)
    kern = functools.partial(_lu_subst_sublane_kernel, n=n)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            grid=(Bp // TB,),
            in_specs=[
                pl.BlockSpec((np_, TB, L), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((np_, TB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((np_, TB), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((np_, Bp), jnp.float32),
            interpret=interpret,
        )(Af, bf)
    return out[:n, :B].T
