"""Measure the dense/sparse Newton crossover on DFF chains.

The reference Newton-solves through KLU at every size
(/root/reference/Project.toml:31); our dispatch is size-based
(``CompiledCircuit.SPARSE_AUTO_THRESHOLD``).  This script times the full DC
continuation solve dense vs sparse over growing chains and reports
per-solve wall time + the measured crossover.

Backends (the round-2 verdict called out that a CPU-only crossover does
not validate the TPU dispatch threshold — the leveled sparse sweeps could
serialize very differently on the chip):

    python benchmarks/sparse_crossover.py --backend cpu   # f64, writes sparse_crossover.json
    python benchmarks/sparse_crossover.py --backend tpu   # mixed precision (f32 evals,
        # f64 solves — the TPU design point), writes sparse_crossover_tpu.json

Every row carries a ``backend`` field.
"""

import argparse
import json
import os
import sys
import time

D = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(D))
sys.path.insert(0, os.path.join(D, "gf180_dff"))


def time_dc(n_cells, sparse, backend):
    from chain import build
    from cedarsim_tpu import solve_dc, SimSpec
    import jax
    kw = {}
    if backend == "tpu":
        import jax.numpy as jnp
        kw["eval_dtype"] = jnp.float32
    c = build(n_cells, sparse=sparse, **kw)
    ctx = SimSpec.make(gmin=1e-15)
    t0 = time.perf_counter()
    r = solve_dc(c, ctx=ctx, mode="tranop", artifact_cache=False)
    jax.block_until_ready(r.x)
    compile_s = time.perf_counter() - t0
    assert bool(r.converged), (n_cells, sparse)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = solve_dc(c, ctx=ctx, mode="tranop", artifact_cache=False)
        jax.block_until_ready(r.x)
    warm = (time.perf_counter() - t0) / reps
    return dict(n_x=c.n_x, compile_s=round(compile_s, 2),
                solve_s=round(warm, 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2,6,12,24,48,90")
    ap.add_argument("--backend", choices=["cpu", "tpu"], default="cpu")
    args = ap.parse_args()
    import jax
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        assert jax.default_backend() == "tpu", \
            f"asked for tpu, got {jax.default_backend()}"
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    for n in sizes:
        row = {"cells": n, "backend": args.backend}
        for sp in (False, True):
            try:
                r = time_dc(n, sp, args.backend)
                row["n_x"] = r["n_x"]
                tag = "sparse" if sp else "dense"
                row[f"{tag}_solve_s"] = r["solve_s"]
                row[f"{tag}_compile_s"] = r["compile_s"]
            except Exception as e:  # dense may OOM/blow up at large n
                row["sparse" if sp else "dense"] = f"{type(e).__name__}: {e}"[:160]
        if "dense_solve_s" in row and "sparse_solve_s" in row:
            row["speedup"] = round(row["dense_solve_s"]
                                   / row["sparse_solve_s"], 2)
        rows.append(row)
        print(row, flush=True)
    cross = next((r["n_x"] for r in rows if r.get("speedup", 0) > 1.0), None)
    mode = ("DC continuation solve, TPU mixed precision (f32 evals/f64 "
            "solves), warm (3-run mean)" if args.backend == "tpu"
            else "DC continuation solve, CPU f64, warm (3-run mean)")
    out = {"rows": rows, "crossover_n_x": cross, "backend": args.backend,
           "note": mode}
    name = ("sparse_crossover.json" if args.backend == "cpu"
            else "sparse_crossover_tpu.json")
    with open(os.path.join(D, name), "w") as f:
        json.dump(out, f, indent=1)
    print("crossover at n_x ≈", cross)


if __name__ == "__main__":
    main()
