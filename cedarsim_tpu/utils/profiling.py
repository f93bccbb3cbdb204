"""Compile/runtime profiling: phase splits, op counts, cost analysis.

The reference's benchmark harness records per-phase compile telemetry and
op-count regression metrics (/root/reference/benchmarks/benchmark_common.jl:
22-54,124-152 — `@timed` phase splits, IR statement counts).  The JAX-native
equivalent splits trace / lower / compile explicitly via the AOT API and
reads XLA's own cost analysis, giving:

* ``trace_s`` / ``lower_s`` / ``compile_s`` — where compile latency lives
  (the reference's known weak point: compile "often exceeding simulation
  time", README-CedarSim.md:28)
* ``jaxpr_eqns`` + ``jaxpr_primitives`` — traced-program size; the op-count
  regression metric (a solver change that doubles the loop body shows up
  here before it shows up on the wall clock)
* ``flops`` / ``bytes_accessed`` / ``peak_memory_bytes`` — XLA cost
  analysis of the compiled executable
"""

from __future__ import annotations

import collections
import time

import jax
from jax.extend.core import ClosedJaxpr


def _count_eqns(jaxpr, counts):
    n = 0
    for eqn in jaxpr.eqns:
        counts[eqn.primitive.name] += 1
        n += 1
        for v in eqn.params.values():
            if isinstance(v, ClosedJaxpr):
                n += _count_eqns(v.jaxpr, counts)
            elif isinstance(v, (tuple, list)):
                for w in v:
                    if isinstance(w, ClosedJaxpr):
                        n += _count_eqns(w.jaxpr, counts)
    return n


def profile_compile(fn, *args, static_argnums=(), **kwargs) -> dict:
    """Trace, lower, and compile ``fn(*args)``; return the phase/size report.

    ``fn`` must be jit-compatible (pure, traceable).  The compiled
    executable is returned under ``"compiled"`` so callers can go on to run
    it without paying compilation twice."""
    out = {}

    t0 = time.perf_counter()
    closed = jax.make_jaxpr(fn, static_argnums=static_argnums)(*args, **kwargs)
    out["trace_s"] = round(time.perf_counter() - t0, 3)
    counts = collections.Counter()
    out["jaxpr_eqns"] = _count_eqns(closed.jaxpr, counts)
    out["jaxpr_primitives"] = dict(counts.most_common())

    jfn = jax.jit(fn, static_argnums=static_argnums)
    t0 = time.perf_counter()
    lowered = jfn.lower(*args, **kwargs)
    out["lower_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    out["compile_s"] = round(time.perf_counter() - t0, 3)

    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        out["flops"] = cost.get("flops")
        out["bytes_accessed"] = cost.get("bytes accessed")
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        out["peak_memory_bytes"] = getattr(mem, "temp_size_in_bytes", None)
        out["argument_bytes"] = getattr(mem, "argument_size_in_bytes", None)
    except Exception:
        pass
    out["compiled"] = compiled
    return out


def profile_run(compiled_or_fn, *args, iters=3) -> dict:
    """Steady-state wall time of a compiled executable (or jitted fn):
    one warmup call, then the mean of ``iters`` timed calls."""
    r = compiled_or_fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = compiled_or_fn(*args)
        jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "per_sec": (1.0 / dt) if dt > 0 else float("inf")}
