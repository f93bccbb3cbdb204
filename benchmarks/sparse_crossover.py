"""Measure the dense/sparse Newton crossover on DFF chains.

The reference Newton-solves through KLU at every size
(/root/reference/Project.toml:31); our dispatch is size-based
(``CompiledCircuit.SPARSE_AUTO_THRESHOLD``).  This script times the full DC
continuation solve dense vs sparse over growing chains and reports
per-solve wall time + the measured crossover, writing
``benchmarks/sparse_crossover.json``.

Run on CPU (the structural result transfers; TPU adds a constant dispatch
cost per op that favors sparse even earlier):

    python benchmarks/sparse_crossover.py [--sizes 2,6,12,24,48,90]
"""

import argparse
import json
import os
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")

D = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(D))
sys.path.insert(0, os.path.join(D, "gf180_dff"))


def time_dc(n_cells, sparse):
    from chain import build
    from cedarsim_tpu import solve_dc, SimSpec
    c = build(n_cells, sparse=sparse)
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
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    for n in sizes:
        row = {"cells": n}
        for sp in (False, True):
            try:
                r = time_dc(n, sp)
                row["n_x"] = r["n_x"]
                tag = "sparse" if sp else "dense"
                row[f"{tag}_solve_s"] = r["solve_s"]
                row[f"{tag}_compile_s"] = r["compile_s"]
            except Exception as e:  # dense may OOM/blow up at large n
                row["sparse" if sp else "dense"] = f"{type(e).__name__}"
        if "dense_solve_s" in row and "sparse_solve_s" in row:
            row["speedup"] = round(row["dense_solve_s"]
                                   / row["sparse_solve_s"], 2)
        rows.append(row)
        print(row, flush=True)
    cross = next((r["n_x"] for r in rows if r.get("speedup", 0) > 1.0), None)
    out = {"rows": rows, "crossover_n_x": cross,
           "note": "DC continuation solve, CPU f64, warm (3-run mean)"}
    with open(os.path.join(D, "sparse_crossover.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("crossover at n_x ≈", cross)


if __name__ == "__main__":
    main()
