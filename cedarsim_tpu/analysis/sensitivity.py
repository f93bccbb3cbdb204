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
        ctx = SimSpec.make(mode=mode, dtype=compiled.dtype)
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
