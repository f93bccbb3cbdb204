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


def run_chunked(points, backend, chunk=None, segments=2, start_at=0,
                stream=False, impl="xla"):
    """High-throughput mode for the 10k-point north star (BASELINE.md):
    the W x VDD grid streams through ONE compiled vmapped windowed program
    in chunk-sized dispatches.  Three levers make 10k points tractable on
    a single chip: (1) ``TranOptions.store_vars`` keeps only the probed Q
    column (full waveforms at 10k lanes would be TBs of HBM), (2) windows
    are checkpoint-chained so no device execution outlives the tunnel's
    ~60 s deadline, (3) chunks keep the lockstep step-union loss bounded
    (throughput peaks near nb=512 on the chip, bench.py 2026-08-19).

    ``start_at``/``stream`` are the worker half of the fault-isolation
    protocol (``run_robust``): start at lane index ``start_at`` and print
    one JSON line per completed chunk, so a mid-run TPU client death
    (UNAVAILABLE device faults poison the whole in-process client —
    observed killing a 1024-point run after its warm chunk, 2026-08-20)
    only costs the in-flight chunk, not the row."""
    import jax
    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from cedarsim_tpu import parse_spice, elaborate, compile_circuit, SimSpec
    from cedarsim_tpu.core.compile import ensure_dynamic
    from cedarsim_tpu.analysis.dc import (solve_dc, dc_core,
                                          default_newton_options)
    from cedarsim_tpu.analysis.tran import (TranOptions, tran_core,
                                            _consistent_xdot,
                                            _differential_mask,
                                            blank_checkpoint,
                                            window_schedules)
    import dataclasses as _dc

    on_tpu = jax.default_backend() == "tpu"
    if backend == "tpu" and not on_tpu:
        sys.exit("--backend tpu requested but TPU did not initialize")
    if chunk is None:
        chunk = 512 if on_tpu else 16
    t0 = time.perf_counter()
    with open(os.path.join(DFF, "dff_tb_bsim4.cir")) as f:
        nl = parse_spice(f.read(), file="dff_tb_bsim4.cir")
    ckt = elaborate(nl, include_paths=[DFF])
    comp = compile_circuit(ckt,
                           eval_dtype=jnp.float32 if on_tpu else None)
    comp = ensure_dynamic(comp, ["vvdd.dc", "w"])
    ctx = SimSpec.make(gmin=1e-15)
    ctx_op = ctx.with_mode("tranop")
    key = [k for k in comp.group_order if "bsim4" in k.lower()][0]
    iq = comp.node_names.index("q")

    nv = max(2, int(round(points ** 0.5)))
    nw = max(2, -(-points // nv))
    vdds = np.repeat(np.linspace(4.75, 5.25, nv), nw)[:points]
    wscs = np.tile(np.linspace(0.97, 1.03, nw), nv)[:points]
    # pad to a whole number of chunks with nominal lanes (gated but not
    # counted)
    n_pad = (-points) % chunk
    vdds = np.concatenate([vdds, np.full(n_pad, 5.0)])
    wscs = np.concatenate([wscs, np.ones(n_pad)])

    op = solve_dc(comp, ctx=ctx, mode="tranop")
    assert bool(np.asarray(op.converged)), "nominal op failed"
    nopts = default_newton_options(comp)
    light = _dc.replace(nopts, gmin_steps=2, src_steps=2, restarts=0,
                        gmin_start=1e-6)
    opc = min(64, chunk)
    fop = jax.jit(jax.vmap(lambda p, x: dc_core(comp, p, ctx_op, x, light),
                           in_axes=(0, 0)))
    tstop = 7e-7
    bps = comp.breakpoints(tstop)
    edges = np.linspace(0.0, tstop, segments + 1)
    win = window_schedules(bps, edges)
    topts = dict(max_steps=8192 // segments, jac_reuse=1,
                 store_vars=(iq,))
    if on_tpu:
        topts.update(newton_reltol=1e-4, newton_abstol=5e-7, res_tol=1e-3,
                     jac_shunt=1e-7, res_rel=3e-5, rtol=1e-2, atol=1e-4)
    opts = TranOptions(**topts)
    if impl == "auto" and on_tpu:
        # opt-in: resolve to the measured-best batched Pallas paths (the
        # bench headline's default); both sweep axes are proven live
        # in-kernel by dyn_leaf_safe (W = nl-group input, vvdd.dc = pure
        # source offset).  Default stays the conservative XLA chord —
        # capture-first discipline for the north-star row.
        from cedarsim_tpu.analysis.tran import auto_tpu_impl
        opts = auto_tpu_impl(comp, ctx, opts, params=None, batched=True,
                             dyn_leaves=["vvdd.dc", (key, "W")],
                             batch_size=chunk)
    mask = _differential_mask(comp, op.x, ctx_op, comp.params0)
    d = comp.dtype
    ftr = jax.jit(jax.vmap(
        lambda p, x, xd, ist, a, b, w: tran_core(
            comp, p, ctx, x, xd, a, b, w, jnp.asarray(7e-13, d), opts,
            mask, init_state=ist),
        in_axes=(0, 0, 0, 0, None, None, None)))
    fxd = jax.jit(jax.vmap(
        lambda x, p: _consistent_xdot(comp, x, ctx_op, p)))

    # vectorized per-chunk param trees: ONE broadcast base + two leaf
    # updates per chunk.  The original built `chunk` python trees through
    # set_param and stacked every leaf — measured as a visible slice of
    # the 4.08 points/s TPU wall (62.7 s per 256-chunk vs the bench's
    # ~15 s for the same batched transient work).
    kv, jv, pv = comp.param_loc("vvdd.dc")
    base = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None],
                                   (chunk,) + jnp.asarray(a).shape),
        comp.params0)

    def chunk_params(k0):
        pb = dict(base)
        gv = dict(pb[kv])
        vs = jnp.asarray(vdds[k0:k0 + chunk])
        gv[pv] = gv[pv].at[:, jv].set(vs)
        if f"{pv}$given" in gv:
            gv[f"{pv}$given"] = gv[f"{pv}$given"].at[:, jv].set(1.0)
        pb[kv] = gv
        gk = dict(pb[key])
        gk["W"] = gk["W"] * jnp.asarray(wscs[k0:k0 + chunk])[:, None]
        pb[key] = gk
        return pb

    def run_chunk(pb):
        # the whole chunk — op blocks, xdot, every window — is enqueued
        # without host syncs (each np.asarray readback is a full tunnel
        # round-trip; the original per-block conv readbacks serialized 4
        # round-trips into every chunk) and gated once at the end
        xs, conv = [], []
        x0rep = jnp.repeat(op.x[None], opc, 0)
        for k0 in range(0, chunk, opc):
            r = fop(jax.tree.map(lambda a: a[k0:k0 + opc], pb), x0rep)
            xs.append(r.x)
            conv.append(r.converged)
        x0b = jnp.concatenate(xs, 0)
        convb = jnp.concatenate(conv)
        # an op-failed lane does NOT zero the chunk (2026-08-20 run: one
        # corner lane's light-ladder op failure cost all 256 points of its
        # chunk): seed it from the nominal op so the lockstep transient
        # stays tame, and hand it to the per-lane solo relaunch below
        x0b = jnp.where(convb[:, None], x0b, op.x[None])
        xdb = fxd(x0b, pb)
        st = blank_checkpoint(x0b, xdb, 7e-13)
        rbs = []
        for k in range(segments):
            rb = ftr(pb, st["x"], st["xdot"], st, jnp.asarray(edges[k], d),
                     jnp.asarray(edges[k + 1], d), jnp.asarray(win[k], d))
            rbs.append(rb)
            st = rb[7]
        jax.block_until_ready(st["x"])
        return rbs, st, np.asarray(convb)

    pb0 = chunk_params(start_at)
    rbs, _, _ = run_chunk(pb0)       # compile everything once
    # solo robust program for failed-lane relaunch (the bench discipline:
    # a marginal lane under f32-eval can flip to the wrong rail at a race
    # edge inside the lockstep batch — observed 1 lane in 1024 at the
    # first TPU run of this harness, worst_rail_err 5.09 with zero device
    # faults).  jac_reuse=4 full-refresh Newton, un-vmapped; the lane's op
    # is solved with the FULL ladder warm-started from the nominal op —
    # tran()'s internal cold continuation is exactly the fragility the
    # batched path avoids by warm-starting (2026-08-20 run: a solo
    # relaunch at a vdd=5.1 corner failed its cold DC and turned the row
    # Infinity); pre-compiled OUTSIDE the timed region.
    from cedarsim_tpu import tran
    ropts = TranOptions(max_steps=16384, jac_reuse=4,
                        **({k: topts[k] for k in
                            ("newton_reltol", "newton_abstol", "res_tol",
                             "jac_shunt", "res_rel", "rtol", "atol")}
                           if on_tpu else {}))
    fop_solo = jax.jit(lambda p, x: dc_core(comp, p, ctx_op, x, nopts))

    def solo_tran(lane_params):
        """Two-tier solo relaunch: warm-started full-ladder DC + robust
        tran; one cold retry through tran's own continuation ladder
        (different basin of attraction).  The warm tier starts the
        transient from the DC iterate EVEN IF Newton did not certify it —
        a flop's bias point is metastable (the reference's
        initialization-fragility probe documents this) and DC Newton can
        orbit between basins without certifying while its iterate is a
        perfectly good transient start; the honest gate is the
        END-of-transient rail check (lane 948 root-cause, 2026-08-21: DC
        uncertified at vdd=5.218/W+0.87%, yet the transient from that
        iterate lands q within 8e-8 of the rail).  The caller must gate
        on ``sol.converged`` AND the rail error, recording an explicit
        failure — never a silent non-finite (VERDICT r4 weak #3)."""
        rop = fop_solo(lane_params, op.x)
        sol = tran(comp, (0.0, tstop), params=lane_params, ctx=ctx,
                   opts=ropts, x0=rop.x)
        if bool(sol.converged):
            return sol
        # cold tier: tran's own continuation ladder from scratch
        return tran(comp, (0.0, tstop), params=lane_params, ctx=ctx,
                    opts=ropts)

    # fast tier-0 solo: the CHUNK program's own auto-resolved options
    # (fused Pallas chord when the envelope held) un-vmapped over the full
    # span — one compiled program shared by every relaunched lane.  The
    # public-tran jac_reuse=4 tier measured ~42 s/lane (single-stream
    # dispatch-bound, benchmarks/single_stream.md); 13 relaunches at that
    # rate dominated the 2026-08-21 fused row's wall (330 s for 1024
    # points, of which compute chunks were ~100 s).
    ropts_solo = _dc.replace(opts, max_steps=16384)
    bps_solo = np.concatenate([bps[bps > 0.0], [tstop], [np.inf]])
    fsolo = jax.jit(lambda p, x, xd: tran_core(
        comp, p, ctx, x, xd, jnp.asarray(0.0, d), jnp.asarray(tstop, d),
        jnp.asarray(bps_solo, d), jnp.asarray(7e-13, d), ropts_solo, mask))
    fxd1 = jax.jit(lambda x, p: _consistent_xdot(comp, x, ctx_op, p))

    # tier-0 DC: the LIGHT ladder (the same quality the batched lanes warm
    # from) — the un-vmapped FULL ladder alone measured ~30 s/lane
    # (dispatch-bound continuation scan), dominating tier-0's cost
    fop_solo_light = jax.jit(
        lambda p, x: dc_core(comp, p, ctx_op, x, light))

    def solo_fast(lane_params):
        """(ts, q, finished, n_newton) from the tier-0 robust solo."""
        rop = fop_solo_light(lane_params, op.x)
        xd = fxd1(rop.x, lane_params)
        out = fsolo(lane_params, rop.x, xd)
        return (np.asarray(out[0]), np.asarray(out[1])[:, 0],
                bool(np.asarray(out[4])), int(np.asarray(out[6])))

    # batched re-verify pool (tier -1): all of a chunk's suspect lanes in
    # ONE vmapped pass through the DIFFERENTLY-SHAPED full-span robust
    # program (a same-program rerun is a deterministic repeat — useless;
    # fsolo's window/step structure differs, so marginal f32 race flips
    # resolve like the solo tiers do).  ~3% of lanes relaunch at scale
    # and per-lane solos at ~2.5 s dominated the 10k rows' wall; one
    # opc-shaped batched pass costs ~3-6 s regardless of suspect count.
    # Compiled lazily on first use (the 1024-row common case pays nothing).
    _batch = {}

    def batch_rescue(pb_c, lanes):
        """{lane: (ts, q, finished)} for suspect lanes (in-chunk indices),
        plus the pass's total newton count."""
        if "fn" not in _batch:
            _batch["fn"] = jax.jit(jax.vmap(
                lambda p, x, xd: tran_core(
                    comp, p, ctx, x, xd, jnp.asarray(0.0, d),
                    jnp.asarray(tstop, d), jnp.asarray(bps_solo, d),
                    jnp.asarray(7e-13, d), ropts_solo, mask)))
            _batch["fxd"] = jax.jit(jax.vmap(
                lambda x, p: _consistent_xdot(comp, x, ctx_op, p)))
        idx = list(lanes) + [lanes[0]] * ((-len(lanes)) % opc)
        ii = jnp.asarray(np.asarray(idx, np.int32))
        res = {}
        n_new = 0
        x0rep = jnp.repeat(op.x[None], opc, 0)
        for k0 in range(0, len(idx), opc):
            sel = ii[k0:k0 + opc]
            ps = jax.tree.map(lambda a: a[sel], pb_c)
            rop = fop(ps, x0rep)
            xd = _batch["fxd"](rop.x, ps)
            out = _batch["fn"](ps, rop.x, xd)
            ts_b = np.asarray(out[0])
            qs_b = np.asarray(out[1])[:, :, 0]
            fin_b = np.asarray(out[4])
            n_new += int(np.asarray(out[6]).sum())
            for m, lane in enumerate(idx[k0:k0 + opc]):
                if lane not in res:       # padding duplicates ignored
                    res[lane] = (ts_b[m], qs_b[m], bool(fin_b[m]))
        return res, n_new

    _f64 = {}

    def solo_f64(j):
        """Definitive final tier: the lane in FULL f64 physics on the host
        CPU — the same mode that generates the goldens.  A marginal lane
        under f32-eval can defeat every TPU tier in a given compile
        (per-compile autotune noise shifts which lane flips — lane 948
        survived three tiers on one compile and none on another,
        2026-08-21); the f64 reference mode ends that nondeterminism.
        Lazy one-time build+compile (~2 min, counted into the chunk wall
        like all rescue work); the per-lane result is still gated by the
        caller's rail check and labeled in ``chunk_f64`` for honesty."""
        with jax.default_device(jax.devices("cpu")[0]):
            if "comp" not in _f64:
                _f64["comp"] = ensure_dynamic(compile_circuit(ckt),
                                              ["vvdd.dc", "w"])
                k64 = [k for k in _f64["comp"].group_order
                       if "bsim4" in k.lower()][0]
                _f64["key"] = k64
            c64 = _f64["comp"]
            p = c64.set_param(c64.params0, "vvdd.dc", float(vdds[j]))
            p = dict(p)
            g64 = dict(p[_f64["key"]])
            g64["W"] = g64["W"] * float(wscs[j])
            p[_f64["key"]] = g64
            return tran(c64, (0.0, tstop), params=p, ctx=ctx,
                        opts=TranOptions(max_steps=16384, jac_reuse=1,
                                         accept_slack=1.5))

    # warm up EVERY solo tier outside any timed chunk (the cold tier
    # compiles its own DC-continuation program; without this, the first
    # lane whose warm op fails would pay a full trace+compile inside the
    # timed chunk wall)
    _ = solo_fast(comp.params0)
    solo_warm = tran(comp, (0.0, tstop), params=comp.params0, ctx=ctx,
                     opts=ropts, x0=fop_solo(comp.params0, op.x).x)
    assert bool(solo_warm.converged), "solo relaunch program failed warm-up"
    _ = tran(comp, (0.0, tstop), params=comp.params0, ctx=ctx, opts=ropts)
    setup_s = time.perf_counter() - t0
    if stream:
        print(json.dumps({"worker_setup_s": round(setup_s, 1)}), flush=True)

    ok = True
    worst = 0.0
    n_newton = 0
    n_done = 0
    n_relaunched = 0
    failed_lanes = []
    f64_lanes = []
    wall = 0.0
    for k0 in range(start_at, len(vdds), chunk):
        tc = time.perf_counter()
        pb = pb0 if k0 == start_at else chunk_params(k0)
        rbs, _, convb = run_chunk(pb)
        c_ok = True
        c_worst = 0.0
        c_newton = 0
        c_points = max(0, min(points - k0, chunk))
        c_relaunched = 0
        c_failed = []
        c_f64 = []
        # gate: q at the end of the window must sit on the lane's rail
        ts = np.concatenate([np.asarray(rb[0]) for rb in rbs], axis=1)
        qs = np.concatenate([np.asarray(rb[1])[:, :, 0] for rb in rbs],
                            axis=1)
        fin = np.asarray(rbs[-1][4])
        c_newton = int(sum(np.asarray(rb[6]).sum() for rb in rbs))
        errs = {}
        suspects = []
        for lane in range(chunk):
            j = k0 + lane
            if j >= points:
                continue
            q = float(np.interp(6.99e-7, ts[lane], qs[lane]))
            errs[lane] = abs(q - vdds[j])
            if (errs[lane] > 0.1 or not bool(fin[lane])
                    or not bool(convb[lane])):
                suspects.append(lane)
        # marginal-lane rail flips / stalls / failed batched ops: first
        # the batched re-verify pool (one vmapped pass covers the whole
        # chunk's suspects), then per-lane tiers — fast solo, full-refresh
        # jac_reuse=4, cold ladder, f64 CPU reference.  All rescue time +
        # Newton work counts into the chunk wall — honest throughput.
        bres = {}
        if len(suspects) >= 3:
            bres, nwb = batch_rescue(pb, suspects)
            c_newton += nwb
        for lane in suspects:
            j = k0 + lane
            c_relaunched += 1
            lp = jax.tree.map(lambda a: a[lane], pb)
            if lane in bres:
                tsr, qsr, finr = bres[lane]
                qr = float(np.interp(6.99e-7, tsr, qsr))
                if finr and abs(qr - vdds[j]) <= 0.1:
                    errs[lane] = abs(qr - vdds[j])
                    continue
                # the pool ran THE SAME program as solo_fast — re-running
                # it per-lane would be a deterministic repeat; go straight
                # to the full-refresh tier
            else:
                tsr, qsr, finr, nw0 = solo_fast(lp)
                c_newton += nw0
                qr = float(np.interp(6.99e-7, tsr, qsr))
                if finr and abs(qr - vdds[j]) <= 0.1:
                    errs[lane] = abs(qr - vdds[j])
                    continue
            sol = solo_tran(lp)
            c_newton += int(sol.n_newton)
            if bool(sol.converged):
                qr = float(sol.interp("q", 6.99e-7))
                errs[lane] = abs(qr - vdds[j])
                continue
            # definitive tier: f64 physics on the host CPU (labeled)
            sol = solo_f64(j)
            c_newton += int(sol.n_newton)
            if bool(sol.converged):
                qr = float(sol.interp("q", 6.99e-7))
                errs[lane] = abs(qr - vdds[j])
                c_f64.append(int(j))
            else:
                # explicit failure record — NEVER a silent non-finite
                # in the aggregate (VERDICT r4 #2): the lane is
                # excluded from worst_rail_err, the row cannot be ok,
                # and the corner is identifiable for a rerun
                del errs[lane]
                c_failed.append(dict(
                    lane=int(j), vdd=round(float(vdds[j]), 4),
                    w_scale=round(float(wscs[j]), 4),
                    reason="relaunch (batched pool + fast/warm/cold f32 "
                           "tiers + f64 CPU reference) did not converge"))
        for lane, err in errs.items():
            c_worst = max(c_worst, err)
            if err > 0.1:
                c_ok = False
        if c_failed:
            c_ok = False
        cw = time.perf_counter() - tc
        wall += cw
        n_done += c_points
        n_newton += c_newton
        n_relaunched += c_relaunched
        failed_lanes += c_failed
        f64_lanes += c_f64
        ok = ok and c_ok
        worst = max(worst, c_worst)
        if stream:
            print(json.dumps(dict(
                chunk=k0, chunk_points=c_points, chunk_ok=bool(c_ok),
                chunk_worst=round(c_worst, 4), chunk_newton=c_newton,
                chunk_relaunched=c_relaunched, chunk_failed=c_failed,
                chunk_f64=c_f64,
                chunk_wall_s=round(cw, 2))), flush=True)
    return dict(points=n_done, backend="tpu" if on_tpu else "cpu",
                mode="f32-eval" if on_tpu else "f64", chunk=chunk,
                segments=segments, store="q-only",
                ok=bool(ok), worst_rail_err=round(worst, 4),
                setup_s=round(setup_s, 1), wall_s=round(wall, 2),
                points_per_sec=round(n_done / wall, 2),
                newton=n_newton, relaunched_lanes=n_relaunched,
                failed_lanes=failed_lanes, f64_lanes=f64_lanes,
                kind="chunked", date=time.strftime("%Y-%m-%d"))


def run_robust(points, backend, chunk=None, segments=2, max_restarts=8,
               impl="xla", resume=None):
    """Fault-isolated chunked sweep: chunks execute in worker subprocesses
    (``run_chunked(stream=True)``); a mid-run UNAVAILABLE device fault —
    which poisons the whole in-process TPU client — costs only the
    in-flight chunk.  The orchestrator restarts a fresh worker at the next
    unfinished chunk (the persistent XLA cache makes the re-setup cheap);
    a chunk that kills two workers in a row is skipped and reported.
    Accounting is honest: ``wall_s``/``points_per_sec`` are the sum of
    per-chunk walls (steady-state throughput, the north-star metric);
    per-worker setup (parse+trace+compile+warm chunk) is reported
    separately and summed across restarts.

    Every completed chunk record is checkpointed to ``resume``
    (default ``pvt_robust_ckpt.json`` next to this file) the moment it
    arrives, and a fresh invocation with the same (points, chunk,
    segments, backend, impl) signature resumes from it — an outer kill
    (driver timeout, session end) costs only the in-flight chunk, and
    worker setup is not re-paid for chunks already banked."""
    import select
    import signal
    import subprocess
    chunk = chunk or (256 if backend == "tpu" else 16)
    agg = {}                      # k0 -> chunk record
    fault_counts = {}
    skipped = []
    restarts = -1                 # first worker isn't a restart
    setup_total = 0.0
    next_k0 = 0
    sig = dict(points=points, chunk=chunk, segments=segments,
               backend=backend, impl=impl)
    ckpt_path = resume or os.path.join(D, "pvt_robust_ckpt.json")
    if os.path.exists(ckpt_path):
        try:
            with open(ckpt_path) as f:
                ck = json.load(f)
            if ck.get("sig") == sig:
                agg = {int(k): v for k, v in ck["agg"].items()}
                setup_total = ck.get("setup_total", 0.0)
                restarts = ck.get("restarts", -1)
                while next_k0 in agg:
                    next_k0 += chunk
                print(f"  [resume] {len(agg)} chunk(s) banked, "
                      f"continuing at {next_k0}", file=sys.stderr,
                      flush=True)
        except (ValueError, KeyError, OSError):
            pass

    def bank():
        with open(ckpt_path + ".tmp", "w") as f:
            json.dump(dict(sig=sig, agg=agg, setup_total=setup_total,
                           restarts=restarts), f)
        os.replace(ckpt_path + ".tmp", ckpt_path)
    while next_k0 < points and restarts < max_restarts:
        restarts += 1
        cmd = [sys.executable, os.path.abspath(__file__), "--chunked",
               "--worker", "--points", str(points), "--chunk", str(chunk),
               "--segments", str(segments), "--backend", backend,
               "--impl", impl, "--start-at", str(next_k0)]
        p = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True,
                             start_new_session=True)
        # cold setup (parse+trace+compile+warm chunk) can take many
        # minutes; once chunks are flowing, 300 s of silence means a hung
        # tunnel execution
        idle_limit = 2400.0
        deadline = time.monotonic() + idle_limit
        timed_out = False
        while True:
            r, _, _ = select.select([p.stdout], [], [], 20.0)
            if r:
                line = p.stdout.readline()
                if not line:
                    break
                line = line.strip()
                if not line.startswith("{"):
                    continue
                rec = json.loads(line)
                print(f"  [worker] {line}", file=sys.stderr, flush=True)
                if "worker_setup_s" in rec:
                    setup_total += rec["worker_setup_s"]
                    bank()
                elif "chunk_wall_s" in rec:   # per-chunk record (NOT the
                    agg[rec["chunk"]] = rec   # worker's final summary)
                    next_k0 = rec["chunk"] + chunk
                    bank()
                idle_limit = 300.0
                deadline = time.monotonic() + idle_limit
            elif p.poll() is not None:
                break
            if time.monotonic() > deadline:
                timed_out = True
                try:
                    os.killpg(p.pid, signal.SIGKILL)
                except OSError:
                    pass
                break
        rc = p.wait()
        if rc == 0 and not timed_out and next_k0 >= points:
            break
        # the worker died (device fault / hang) at chunk `next_k0`
        fault_counts[next_k0] = fault_counts.get(next_k0, 0) + 1
        if fault_counts[next_k0] >= 2:
            skipped.append(next_k0)
            next_k0 += chunk
    chunks = [agg[k] for k in sorted(agg)]
    if chunks and next_k0 >= points:
        # complete row: retire the checkpoint so a later fresh run with
        # the same signature starts clean instead of resuming stale data
        try:
            os.remove(ckpt_path)
        except OSError:
            pass
    n_done = sum(c["chunk_points"] for c in chunks)
    wall = sum(c["chunk_wall_s"] for c in chunks)
    failed = [f for c in chunks for f in c.get("chunk_failed", [])]
    f64_lanes = [j for c in chunks for j in c.get("chunk_f64", [])]
    ok = (bool(chunks) and all(c["chunk_ok"] for c in chunks)
          and not skipped and not failed and n_done >= points)
    worst = max((c["chunk_worst"] for c in chunks), default=None)
    return dict(points=n_done, points_requested=points, backend=backend,
                mode="f32-eval" if backend == "tpu" else "f64", chunk=chunk,
                segments=segments, store="q-only", ok=bool(ok),
                worst_rail_err=(round(worst, 4) if worst is not None
                                else None),
                setup_s=round(setup_total, 1), wall_s=round(wall, 2),
                points_per_sec=round(n_done / wall, 2) if wall else 0.0,
                newton=sum(c["chunk_newton"] for c in chunks),
                relaunched_lanes=sum(c.get("chunk_relaunched", 0)
                                     for c in chunks),
                failed_lanes=failed, f64_lanes=f64_lanes,
                restarts=restarts, skipped_chunks=skipped,
                kind="chunked-robust", date=time.strftime("%Y-%m-%d"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=32)
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--chunked", action="store_true",
                    help="high-throughput chunked mode (10k-point north "
                         "star): q-only storage, windowed, chunk dispatches")
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--segments", type=int, default=2)
    ap.add_argument("--impl", default="xla", choices=["xla", "auto"],
                    help="auto: resolve to the fused/mixed Pallas paths "
                         "on TPU (the bench default); xla: conservative")
    ap.add_argument("--robust", action="store_true",
                    help="fault-isolated orchestrator: worker subprocesses, "
                         "restart on device faults, per-chunk accounting")
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--start-at", type=int, default=0,
                    help=argparse.SUPPRESS)
    a = ap.parse_args()
    if a.worker:
        rec = run_chunked(a.points, a.backend, a.chunk, a.segments,
                          start_at=a.start_at, stream=True, impl=a.impl)
        print(json.dumps(dict(rec, kind="chunked-worker")))
        return 0 if rec["ok"] else 1
    if a.robust:
        rec = run_robust(a.points, a.backend, a.chunk, a.segments,
                         impl=a.impl)
    elif a.chunked:
        rec = run_chunked(a.points, a.backend, a.chunk, a.segments,
                          impl=a.impl)
    else:
        rec = run(a.points, a.backend)
    rec = _finite_json(rec)
    print(json.dumps(rec))
    path = os.path.join(D, "pvt_sweep.json")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            # parse_constant: legacy rows serialized bare Infinity (not
            # valid JSON per spec — jq/JS reject the whole file); map any
            # such literal to the "inf" sentinel on read
            rows = json.load(
                f, parse_constant=lambda s: "inf").get("rows", [])
    rows.append(rec)
    with open(path, "w") as f:
        # allow_nan=False: a non-finite anywhere is a bug in _finite_json,
        # not something to smuggle into the artifact
        json.dump({"rows": [_finite_json(r) for r in rows]}, f, indent=1,
                  allow_nan=False)
    return 0 if rec["ok"] else 1


def _finite_json(obj):
    """Replace non-finite floats with the string sentinel "inf"/"nan" so
    the committed artifact is spec-valid JSON (r4 advisor: Python round-
    trips bare Infinity but jq/JS/strict parsers reject the whole file)."""
    import math
    if isinstance(obj, float) and not math.isfinite(obj):
        return "inf" if obj > 0 else ("-inf" if obj < 0 else "nan")
    if isinstance(obj, dict):
        return {k: _finite_json(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_finite_json(v) for v in obj]
    return obj


if __name__ == "__main__":
    sys.exit(main())
