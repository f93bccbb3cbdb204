"""Benchmark harness — prints ONE JSON line for the driver.

Current headline: CMOS inverter transient timesteps/sec on one chip (becomes
the gf180 DFF + BSIM4 configuration of BASELINE.md as soon as the Verilog-A
pipeline lands).  Protocol mirrors the reference harness
(/root/reference/benchmarks/gf180_dff_solver_bench.jl): correctness-gated
(waveform checks before timing), compile time reported separately.

The reference publishes no absolute numbers (BASELINE.md) — vs_baseline is
reported against a recorded CPU run of this same harness (the stand-in for
CPU-CedarSim until a direct measurement exists): 6890 Newton-solves/sec
single-stream on the container CPU.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    from cedarsim_tpu import load_spice, compile_circuit, tran, TranOptions

    code = """* cmos inverter bench
.model n1 nmos (level=1 vto=0.7 kp=100u lambda=0.02 cgso=1n cgdo=1n)
.model p1 pmos (level=1 vto=-0.7 kp=40u lambda=0.02 cgso=1n cgdo=1n)
vdd vdd 0 3.3
vin in 0 PULSE(0 3.3 2n 0.2n 0.2n 4n 10n)
mp out in vdd vdd p1 w=2u l=0.35u
mn out in 0 0 n1 w=1u l=0.35u
cl out 0 10f
.tran 0.1n 20n
"""
    t0 = time.perf_counter()
    compiled = compile_circuit(load_spice(code))
    opts = TranOptions(max_steps=2048)
    sol = tran(compiled, (0.0, 20e-9), opts=opts)   # compile + first run
    t_compile = time.perf_counter() - t0

    # correctness gate (reference pattern: Q-waveform checks before timing)
    hi = sol.interp("out", 1.0e-9)
    lo = sol.interp("out", 5.0e-9)
    hi2 = sol.interp("out", 8.5e-9)
    gate = (abs(hi - 3.3) < 0.05 and abs(lo) < 0.05 and abs(hi2 - 3.3) < 0.05
            and sol.converged)
    if not gate:
        print(json.dumps({"metric": "inverter_tran_steps_per_sec",
                          "value": 0.0, "unit": "steps/s",
                          "vs_baseline": 0.0,
                          "error": "correctness gate failed",
                          "waveform": [float(hi), float(lo), float(hi2)]}))
        return 1

    # timed runs (steady state)
    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        sol = tran(compiled, (0.0, 20e-9), opts=opts)
    dt = (time.perf_counter() - t0) / n_rep
    steps_per_sec = (sol.n_accepted + sol.n_rejected) / dt
    newton_per_sec = sol.n_newton / dt

    baseline_cpu_newton_per_sec = 6890.0
    print(json.dumps({
        "metric": "inverter_tran_newton_solves_per_sec",
        "value": round(newton_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(newton_per_sec / baseline_cpu_newton_per_sec, 3),
        "extra": {
            "steps_per_sec": round(steps_per_sec, 1),
            "accepted": int(sol.n_accepted),
            "rejected": int(sol.n_rejected),
            "newton_iters": int(sol.n_newton),
            "wall_s": round(dt, 4),
            "compile_s": round(t_compile, 1),
            "backend": jax.default_backend(),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
