"""PVT sweep harness — the BASELINE.md north-star workload: a batched
process/voltage sweep of the gf180-topology BSIM4 DFF transient, vmapped
into ONE XLA program and sharded over the device mesh
(``tran_sweep_sharded``), replacing the reference's serial CircuitSweep
broadcast loop (/root/reference/src/sweeps.jl:471-502).

Axes: transistor width W scaled ±3% (process) × supply ±5% (voltage) —
temperature rides SimSpec and has its own sweep axis (analysis/sweeps.py).
Per-lane correctness gate: after the final clock edge the flop must drive
Q to ITS OWN rail (q ≈ vdd_lane), so a lane permutation, a clobbered
shard, or a physics break cannot pass.

    python benchmarks/pvt_sweep.py                    # 8-dev CPU mesh
    python benchmarks/pvt_sweep.py --points 64
    python benchmarks/pvt_sweep.py --backend tpu      # real chip(s)

Appends a record to ``benchmarks/pvt_sweep.json``.
"""

import argparse
import json
import os
import sys
import time

D = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(D))
DFF = os.path.join(D, "gf180_dff")


def run(points, backend):
    import jax
    if backend == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from cedarsim_tpu import parse_spice, elaborate, compile_circuit, SimSpec
    from cedarsim_tpu.core.compile import ensure_dynamic
    from cedarsim_tpu.analysis.tran import TranOptions
    from cedarsim_tpu.parallel.mesh import make_mesh, tran_sweep_sharded

    on_tpu = jax.default_backend() == "tpu"
    if backend == "tpu" and not on_tpu:
        sys.exit("--backend tpu requested but the TPU backend did not "
                 "initialize (tunnel down / plugin absent) — refusing to "
                 "record a mislabeled row; note a hung tunnel blocks "
                 "forever: run under `timeout`")
    t0 = time.perf_counter()
    with open(os.path.join(DFF, "dff_tb_bsim4.cir")) as f:
        nl = parse_spice(f.read(), file="dff_tb_bsim4.cir")
    comp = compile_circuit(elaborate(nl, include_paths=[DFF]),
                           eval_dtype=jnp.float32 if on_tpu else None)
    comp = ensure_dynamic(comp, ["vvdd.dc", "w"])
    ctx = SimSpec.make(gmin=1e-15)

    # W (process) x VDD (voltage) grid, sized to `points`
    nv = max(2, int(round(points ** 0.5)))
    nw = max(2, -(-points // nv))
    vdds = np.linspace(4.75, 5.25, nv)
    wsc = np.linspace(0.97, 1.03, nw)
    key = [k for k in comp.group_order if "bsim4" in k.lower()][0]
    trees, lanes = [], []
    for vdd in vdds:
        p0 = comp.set_param(comp.params0, "vvdd.dc", float(vdd))
        for wm in wsc:
            p = dict(p0)
            grp = dict(p[key])
            grp["W"] = grp["W"] * float(wm)
            p[key] = grp
            trees.append(p)
            lanes.append(float(vdd))
    bp = jax.tree.map(lambda *ls: jnp.stack(ls), *trees)
    n_pts = len(lanes)

    mesh = make_mesh()
    # warm-start every lane from the NOMINAL operating point — the cold
    # continuation ladder is fragile at scattered PVT points on a
    # metastable-bias flop (see tran_sweep_sharded docstring)
    from cedarsim_tpu import solve_dc
    op = solve_dc(comp, ctx=ctx, mode="tranop")
    assert bool(np.asarray(op.converged)), "nominal op failed"
    opts = TranOptions(max_steps=8192, jac_reuse=1,
                       **({"newton_reltol": 1e-4, "newton_abstol": 5e-7,
                           "res_tol": 1e-3, "jac_shunt": 1e-7,
                           "res_rel": 3e-5, "rtol": 1e-2, "atol": 1e-4}
                          if on_tpu else {}))
    res = tran_sweep_sharded(comp, None, (0.0, 7e-7), mesh, params=bp,
                             ctx=ctx, opts=opts, x0=op.x)
    jax.block_until_ready(res.xs)
    # parse + elaborate + compile + nominal op + ONE full execution — the
    # honest label is setup, not compile
    setup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = tran_sweep_sharded(comp, None, (0.0, 7e-7), mesh, params=bp,
                             ctx=ctx, opts=opts, x0=op.x)
    jax.block_until_ready(res.xs)
    wall = time.perf_counter() - t0

    iq = comp.node_names.index("q")
    ts = np.asarray(res.ts)
    qs = np.asarray(res.xs)[:, :, iq]
    ok = bool(np.asarray(res.finished).all())
    worst = 0.0
    for lane, vdd in enumerate(lanes):
        q = float(np.interp(6.99e-7, ts[lane], qs[lane]))
        worst = max(worst, abs(q - vdd))
        if abs(q - vdd) > 0.1:
            ok = False
    return dict(points=n_pts, backend="tpu" if on_tpu else "cpu",
                mesh_devices=int(mesh.size),
                mode="f32-eval" if on_tpu else "f64",
                ok=ok, worst_rail_err=round(worst, 4),
                setup_s=round(setup_s, 1), wall_s=round(wall, 2),
                points_per_sec=round(n_pts / wall, 2),
                newton=int(np.asarray(res.n_newton).sum()),
                date=time.strftime("%Y-%m-%d"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=32)
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    a = ap.parse_args()
    rec = run(a.points, a.backend)
    print(json.dumps(rec))
    path = os.path.join(D, "pvt_sweep.json")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f).get("rows", [])
    rows.append(rec)
    with open(path, "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
