"""Trace-time jaxpr cache (core/compile.cached_model_eval): replaying a
cached model jaxpr must agree with direct tracing to float-roundoff, emit
the same equation count, and actually hit the cache across trace sites."""

import jax
import jax.numpy as jnp
import numpy as np

from cedarsim_tpu import SimSpec, compile_circuit, elaborate, parse_spice
from cedarsim_tpu import config
from cedarsim_tpu.core.compile import _EVAL_TRACE_CACHE

NETLIST = """* diode clamp
V1 in 0 dc 1.5
R1 in out 1k
D1 out 0 dd
C1 out 0 1n
.model dd d is=1e-14 n=1.4 cjo=1p
.end
"""


def _matrices(flag):
    old = config.trace_cache
    config.trace_cache = flag
    _EVAL_TRACE_CACHE.clear()
    try:
        comp = compile_circuit(elaborate(parse_spice(NETLIST)))
        ctx = SimSpec.make(mode="tran", gmin=1e-15).at_time(1e-9)
        x = jnp.linspace(0.1, 1.4, comp.n_x)
        S, Q = comp.residuals(x, ctx, comp.params0)
        G, C = comp.jacobians(x, ctx, comp.params0)
        S2, Q2, G2, C2 = comp.res_jacs_fwd(x, ctx, comp.params0)
        eqns = len(jax.make_jaxpr(
            lambda xx: comp.res_jacs_fwd(xx, ctx, comp.params0))(x).eqns)
        hits = len(_EVAL_TRACE_CACHE)
        return [np.asarray(a) for a in (S, Q, G, C, S2, Q2, G2, C2)], \
            eqns, hits
    finally:
        config.trace_cache = old
        _EVAL_TRACE_CACHE.clear()


def test_trace_cache_matches_direct():
    mats1, eqns1, hits1 = _matrices(False)
    mats0, eqns0, hits0 = _matrices(True)
    assert hits1 == 0 and hits0 > 0
    assert eqns0 == eqns1
    for a0, a1 in zip(mats0, mats1):
        scale = np.abs(a1).max() + 1.0
        assert np.abs(a0 - a1).max() / scale < 1e-12


def test_trace_cache_distinguishes_static_params():
    """Two groups differing only in a *static* parameter value must get
    separate cache entries (the value is folded into the traced branches)."""
    config.trace_cache = True
    _EVAL_TRACE_CACHE.clear()
    try:
        base = """* two diode models
V1 in 0 dc 1.5
D1 in a d1
D2 a 0 d2
R1 a 0 1k
.model d1 d is=1e-14 n=1.0
.model d2 d is=1e-14 n=2.0
.end
"""
        comp = compile_circuit(elaborate(parse_spice(base)))
        ctx = SimSpec.make(gmin=1e-15)
        x = jnp.linspace(0.1, 1.0, comp.n_x)
        S, Q = comp.residuals(x, ctx, comp.params0)
        # the two diodes land in different groups (different static n) or
        # one group with per-instance n; either way results must reflect
        # the differing emission coefficients
        from cedarsim_tpu.analysis.dc import solve_dc
        r = solve_dc(comp, ctx=ctx)
        assert bool(r.converged)
        va = float(np.asarray(r.x)[comp.node_names.index("a")])
        # n=1 top diode drops less than the n=2 bottom one at equal current
        assert 0.6 < va < 1.2
    finally:
        _EVAL_TRACE_CACHE.clear()
