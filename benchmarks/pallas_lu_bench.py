"""Pallas batched-LU kernels vs the current XLA lowering — on-chip numbers.

VERDICT r3 next-step #5: ship one production Pallas kernel (or ledger the
negative result with numbers).  This harness times the dense batched
Newton-solve primitive at the bench-relevant shapes (the gf180 DFF is 25
unknowns; the scale-curve chain cells add internal nodes):

  * ``jax``      — ops/linalg.py pure-JAX LU, vmapped (what the solvers run
                   today; f64, the states' dtype)
  * ``jax_f32``  — same lowering in f32 (apples-to-apples precision with
                   the Pallas kernels)
  * ``pallas_cell``    — ops/pallas_lu.lu_solve_batched_f32 (one grid cell
                   per batch element, partial pivoting)
  * ``pallas_sublane`` — ops/pallas_lu.lu_solve_batched_sublane_f32 (batch
                   in the sublane axis, GESP no-pivot)

Methodology: each variant runs CHAIN chained solves inside ONE jitted
program (x_{k+1} = solve(A + I·k·0, normalize(x_k))) so the timing is
device-resident compute, not tunnel dispatch or host transfers — the
remote-TPU tunnel adds 10-40 ms per *call*, which would swamp a per-call
measurement.  Every variant is correctness-gated against numpy (f64) at
f32-appropriate tolerance before timing.

Writes benchmarks/pallas_lu_bench.json.
"""

import json
import os
import sys
import time

D = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(D))

import numpy as np  # noqa: E402

CHAIN = 32


def run_variant(name, solve_fn, A, b, ref, tol):
    import jax
    import jax.numpy as jnp

    def chained(A, b):
        def body(k, x):
            # renormalize so the iterates stay O(1); reuse A unchanged
            x = x / jnp.maximum(jnp.max(jnp.abs(x)), 1e-30)
            return solve_fn(A, x)
        return jax.lax.fori_loop(0, CHAIN, body, b)

    f = jax.jit(chained)
    # correctness gate (single application)
    x1 = np.asarray(jax.jit(solve_fn)(A, b))
    rel = float(np.abs(x1 - ref).max() / np.abs(ref).max())
    t0 = time.perf_counter()
    out = f(A, b)
    jax.block_until_ready(out)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = f(A, b)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / reps
    B = A.shape[0]
    per_solve_us = wall / CHAIN / B * 1e6
    ok = rel < tol
    return dict(variant=name, rel_err=rel, ok=ok,
                cold_s=round(cold, 2),
                wall_per_chain_ms=round(wall * 1e3, 3),
                us_per_solve=round(per_solve_us, 3),
                solves_per_sec=round(B * CHAIN / wall, 0))


def main():
    import jax
    import jax.numpy as jnp
    from cedarsim_tpu.ops import linalg
    from cedarsim_tpu.ops.pallas_lu import (lu_solve_batched_f32,
                                            lu_solve_batched_sublane_f32)

    backend = jax.default_backend()
    rows = []
    shapes = [(512, 25), (64, 122)]
    for B, n in shapes:
        rng = np.random.default_rng(0)
        # MNA-flavored test matrices: diagonally dominant + a few big
        # off-diagonal couplings, entries spanning decades
        A = rng.standard_normal((B, n, n))
        A += (n + 10) * np.eye(n)
        A *= 10.0 ** rng.uniform(-2, 2, size=(B, 1, n))
        b = rng.standard_normal((B, n))
        ref = np.linalg.solve(A, b[..., None])[..., 0]
        Aj = jnp.asarray(A)
        bj = jnp.asarray(b)
        A32 = jnp.asarray(A, jnp.float32)
        b32 = jnp.asarray(b, jnp.float32)

        variants = [
            ("jax_f64", lambda A_, b_: jax.vmap(linalg.solve)(A_, b_),
             Aj, bj, 1e-9),
            ("jax_f32", lambda A_, b_: jax.vmap(linalg.solve)(A_, b_),
             A32, b32, 5e-3),
            ("pallas_cell",
             lambda A_, b_: lu_solve_batched_f32(A_, b_), A32, b32, 5e-3),
            ("pallas_sublane",
             lambda A_, b_: lu_solve_batched_sublane_f32(A_, b_),
             A32, b32, 5e-3),
        ]
        for name, fn, Ax, bx, tol in variants:
            try:
                r = run_variant(name, fn, Ax, bx, ref, tol)
            except Exception as e:  # pragma: no cover
                r = dict(variant=name, error=f"{type(e).__name__}: "
                         f"{e}"[:300])
            r.update(B=B, n=n, backend=backend)
            rows.append(r)
            print(json.dumps(r), flush=True)

    out = dict(rows=rows, backend=backend, chain=CHAIN,
               note="chained on-device solves; per-solve time = "
                    "wall/CHAIN/B.  Gate: rel err vs numpy f64.")
    with open(os.path.join(D, "pallas_lu_bench.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
