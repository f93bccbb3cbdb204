"""Parameter sensitivities via implicit differentiation.

The reference gets forward sensitivities by running SciMLSensitivity's
``ODEForwardSensitivityProblem`` over the compiled system with ``ParamSim``
fields as parameters (/root/reference/test/sensitivity.jl:30-43).  Here the
DC case is exact implicit differentiation — at the solved operating point
F(x*, p) = 0, so dx*/dp = −(∂F/∂x)⁻¹·∂F/∂p — evaluated with one linear solve
per output (adjoint) or per parameter (forward), both fully on-device.

Transient sensitivities: forward-mode JVP through the integrator's
``lax.while_loop`` (JAX supports jvp of while_loop) — see ``tran_jvp``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cedarsim_tpu.core.compile import CompiledCircuit
from cedarsim_tpu.core.context import SimSpec, Modes
from cedarsim_tpu.ops import linalg
from cedarsim_tpu.analysis.dc import solve_dc, NewtonOptions


def dc_sensitivity(compiled: CompiledCircuit, observable: str, wrt: list,
                   params=None, ctx: SimSpec = None,
                   opts: NewtonOptions = None, mode=Modes.DCOP):
    """d(observable)/d(param) for each dotted param name in ``wrt``.

    Returns (value, dict name->gradient).  Uses the adjoint form: one linear
    solve total, then one VJP per parameter."""
    from cedarsim_tpu.core.compile import ensure_dynamic
    compiled = ensure_dynamic(compiled, wrt)
    params = compiled.params0 if params is None else params
    if ctx is None:
        from cedarsim_tpu.core.compile import default_ctx
        ctx = default_ctx(compiled).with_mode(mode)
    else:
        ctx = ctx.with_mode(mode)
    res = solve_dc(compiled, params, ctx, opts=opts, mode=mode)
    x = res.x
    obs = compiled.observe(observable)

    @jax.jit
    def grads(x, params):
        G, _ = compiled.jacobians(x, ctx, params)
        xd0 = jnp.zeros_like(x)
        # ∂obs/∂x (observables are linear in x at fixed params)
        e = jax.grad(lambda xx: obs(xx, xd0, ctx, params))(x)
        # adjoint: λᵀ = eᵀ G⁻¹
        lam = linalg.solve(G.T, e)
        # dobs/dp = ∂obs/∂p − λᵀ ∂F/∂p   (∂F/∂p via VJP on the residual)
        _, vjp_res = jax.vjp(
            lambda pp: compiled.residuals(x, ctx, pp)[0], params)
        dFdp_lam = vjp_res(lam)[0]
        _, vjp_obs = jax.vjp(
            lambda pp: obs(x, xd0, ctx, pp), params)
        dodp = vjp_obs(jnp.ones((), x.dtype))[0]
        return jax.tree.map(lambda a, b: a - b, dodp, dFdp_lam)

    gtree = grads(x, params)
    value = obs(x, jnp.zeros_like(x), ctx, params)
    out = {}
    for name in wrt:
        key, j, pname = compiled.param_loc(name)
        out[name] = gtree[key][pname][j]
    return value, out


def tran_sensitivity(compiled, observable: str, wrt: str, tspan, t_eval,
                     params=None, ctx=None, opts=None):
    """d(observable at t_eval)/d(param) by forward-mode AD through the whole
    adaptive transient integrator (lax.while_loop supports jvp) — the
    reference's full-differentiability story done natively in JAX
    (/root/reference/test/sensitivity.jl, README "full differentiability").

    Returns (value, derivative)."""
    import numpy as np
    from cedarsim_tpu.core.compile import ensure_dynamic
    from cedarsim_tpu.analysis.tran import (tran_core, TranOptions,
                                            _consistent_xdot,
                                            _differential_mask)
    compiled = ensure_dynamic(compiled, [wrt])
    params = compiled.params0 if params is None else params
    if ctx is None:
        from cedarsim_tpu.core.compile import default_ctx
        ctx = default_ctx(compiled)
    opts = opts or TranOptions(max_steps=4096)
    t0, tstop = float(tspan[0]), float(tspan[1])
    op = solve_dc(compiled, params, ctx, mode=Modes.TRANOP)
    ctx_op = ctx.with_mode(Modes.TRANOP).at_time(t0)
    xd0 = _consistent_xdot(compiled, op.x, ctx_op, params)
    mask = _differential_mask(compiled, op.x, ctx_op, params)
    bps = compiled.breakpoints(tstop)
    bps = np.concatenate([bps[bps > t0], [tstop], [np.inf]])
    d = compiled.dtype
    obs = compiled.observe(observable)
    p0 = compiled.get_param(params, wrt)

    def value_at(pv):
        p = compiled.set_param(params, wrt, pv)
        ts, xs, xds, k, fin, nrej, nnwt, _ = tran_core(
            compiled, p, ctx, op.x, xd0, jnp.asarray(t0, d),
            jnp.asarray(tstop, d), jnp.asarray(bps, d),
            jnp.asarray((tstop - t0) * 1e-6, d), opts, mask)
        i = jnp.clip(jnp.searchsorted(ts, t_eval), 1, ts.shape[0] - 1)
        w = (t_eval - ts[i - 1]) / jnp.maximum(ts[i] - ts[i - 1], 1e-300)
        w = jnp.clip(w, 0.0, 1.0)
        x_at = xs[i - 1] * (1 - w) + xs[i] * w
        xd_at = xds[i - 1] * (1 - w) + xds[i] * w
        return obs(x_at, xd_at, ctx.with_mode(Modes.TRAN).at_time(t_eval), p)

    cache = compiled.__dict__.setdefault("_transens_cache", {})
    key = (observable, wrt, t0, tstop, float(t_eval), opts)
    if key not in cache:
        cache[key] = jax.jit(
            lambda pv: jax.jvp(value_at, (pv,), (jnp.ones((), d),)))
    v, dv = cache[key](jnp.asarray(p0, d))
    return v, dv


def tf(compiled, out: str, src: str, params=None, ctx=None, opts=None):
    """DC transfer function (SPICE .TF): small-signal gain d(out)/d(src),
    plus output resistance at the observed node.  ``src`` is a V/I source
    instance name.  Returns dict(gain=..., rout=...)."""
    from cedarsim_tpu.core.compile import ensure_dynamic
    compiled = ensure_dynamic(compiled, [f"{src}.dc"])
    value, g = dc_sensitivity(compiled, out, [f"{src}.dc"], params=params,
                              ctx=ctx, opts=opts)
    # output resistance: dV(out)/dI for a unit test-current at the output
    # node — adjoint column of G^{-1}
    params_ = compiled.params0 if params is None else params
    c = (SimSpec.make(mode=Modes.DCOP, dtype=compiled.dtype)
         if ctx is None else ctx.with_mode(Modes.DCOP))
    res = solve_dc(compiled, params_, c, opts=opts, mode=Modes.DCOP)
    obs = compiled.observe(out)

    @jax.jit
    def rout(x, params):
        G, _ = compiled.jacobians(x, c, params)
        xd0 = jnp.zeros_like(x)
        e = jax.grad(lambda xx: obs(xx, xd0, c, params))(x)
        # inject +1 A at the observed node(s): dx = G^{-1} e, rout = eᵀ dx
        dx = linalg.solve(G, e)
        return e @ dx

    return dict(gain=g[f"{src}.dc"], rout=rout(res.x, params_),
                value=value)
