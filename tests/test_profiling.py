"""Compile telemetry + op-count regression gate (SURVEY.md §5 tracing/
profiling; reference benchmark_common.jl:22-54,124-152)."""

import jax.numpy as jnp

from cedarsim_tpu import (Circuit, Resistor, Capacitor, VSource,
                          compile_circuit, SimSpec)
from cedarsim_tpu.utils.profiling import profile_compile, profile_run


def _rc_newton():
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=1.0))
    ckt.add(Resistor, "R1", (vin, vout), dict(r=1000.0))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=1e-9))
    c = compile_circuit(ckt)
    ctx = SimSpec.make(mode="dcop")

    def step(x):
        from cedarsim_tpu.ops import linalg
        S, _, G, _ = c.res_jacs_fwd(x, ctx, c.params0)
        return x + linalg.solve(
            G + 1e-12 * jnp.eye(c.n_x, dtype=c.dtype), -S)

    return step, jnp.zeros(c.n_x, c.dtype)


def test_phase_split_and_counts():
    step, x0 = _rc_newton()
    rep = profile_compile(step, x0)
    for k in ("trace_s", "lower_s", "compile_s", "jaxpr_eqns",
              "jaxpr_primitives"):
        assert k in rep, k
    assert rep["jaxpr_eqns"] > 0
    assert sum(rep["jaxpr_primitives"].values()) == rep["jaxpr_eqns"]
    run = profile_run(rep["compiled"], x0)
    assert run["mean_s"] > 0


def test_op_count_regression_budget():
    """The RC Newton step's traced size is a regression canary: the budget
    is ~3x the measured value (160 eqns, 2026-08), so real regressions
    (e.g. an accidental O(n) unrolled loop) trip it while refactors don't."""
    step, x0 = _rc_newton()
    rep = profile_compile(step, x0)
    assert rep["jaxpr_eqns"] < 500, rep["jaxpr_eqns"]
