"""DC operating point: damped Newton with gmin-stepping and source-stepping
continuation, plus randomized-restart bootstrap.

Reference behavior: CedarDCOp/CedarTranOp initialization
(/root/reference/src/dcop.jl:24-155) — a NonlinearSolve RobustMultiNewton with
up to 10 restarts from 1e-7·randn perturbations (``bootstrapped_nlsolve``,
dcop.jl:53-94).  The TPU build adds the classic SPICE continuation ladders
(gmin / source stepping) and keeps everything inside ``lax`` control flow so a
whole PVT/Monte-Carlo sweep of operating points runs as one ``vmap``-batched
XLA program — the parallel initialization the reference's TODO asks for
(dcop.jl:57).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from cedarsim_tpu.core.compile import CompiledCircuit
from cedarsim_tpu.core.context import SimSpec, Modes
from cedarsim_tpu.ops import linalg


@dataclasses.dataclass(frozen=True)
class NewtonOptions:
    max_iter: int = 60
    #: per-unknown update tolerance: |dx| <= reltol·|x| + abstol
    reltol: float = 1e-4
    abstol: float = 1e-9
    #: residual tolerance (KCL in amps / branch eq in volts)
    res_tol: float = 1e-9
    #: max Newton update per unknown per iteration (voltage limiting)
    max_step: float = 5.0
    #: gmin continuation ladder length (decades from gmin_start)
    gmin_steps: int = 10
    gmin_start: float = 1e-2
    #: source stepping points
    src_steps: int = 8
    #: randomized restarts (reference bootstrapped_nlsolve: 10)
    restarts: int = 4


def _newton(res_jac, x0, opts: NewtonOptions):
    """Damped Newton on res_jac: x -> (f, J).  Returns (x, converged, iters)."""

    def cond(carry):
        x, done, it, _ = carry
        return jnp.logical_and(jnp.logical_not(done), it < opts.max_iter)

    def body(carry):
        x, _, it, _ = carry
        f, J = res_jac(x)
        dx = linalg.solve(J, -f)
        bad = jnp.logical_not(jnp.all(jnp.isfinite(dx)))
        dx = jnp.where(bad, jnp.zeros_like(dx), dx)
        # step limiting
        mx = jnp.max(jnp.abs(dx))
        scale = jnp.where(mx > opts.max_step, opts.max_step / mx, 1.0)
        xn = x + dx * scale
        dx_ok = jnp.all(jnp.abs(dx) <= opts.reltol * jnp.abs(xn) + opts.abstol)
        fn, _ = res_jac(xn)
        f_ok = jnp.all(jnp.abs(fn) <= opts.res_tol)
        done = jnp.logical_and(jnp.logical_and(dx_ok, f_ok),
                               jnp.logical_not(bad))
        fnorm = jnp.max(jnp.abs(fn))
        return xn, done, it + 1, fnorm

    f0, _ = res_jac(x0)
    x, done, it, fn = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(False), jnp.asarray(0),
                     jnp.max(jnp.abs(f0))))
    return x, done, it, fn


def _dc_res_jac(compiled: CompiledCircuit, params, ctx, gshunt,
                ic_mask=None, ic_vals=None):
    """DC residual/Jacobian: static part only, with a gshunt·V shunt to ground
    on every voltage unknown (gmin continuation).  Rows where ``ic_mask`` is 1
    are replaced by the pin constraint x = ic_vals — SPICE ``.ic`` semantics
    (and the reference's explicit ``u0`` overrides, test/basic.jl:109-141)."""
    nv = compiled.n_nodes + compiled.n_internal
    vmask = (jnp.arange(compiled.n_x) < nv).astype(compiled.dtype)

    def rj(x):
        S, _ = compiled.residuals(x, ctx, params)
        G, _ = compiled.jacobians(x, ctx, params)
        f = S + gshunt * vmask * x
        J = G + jnp.diag(gshunt * vmask)
        if ic_mask is not None:
            f = f * (1.0 - ic_mask) + ic_mask * (x - ic_vals)
            J = J * (1.0 - ic_mask)[:, None] + jnp.diag(ic_mask)
        return f, J

    return rj


@partial(jax.tree_util.register_dataclass,
         data_fields=["x", "converged", "iters", "resnorm"], meta_fields=[])
@dataclasses.dataclass
class DCResult:
    x: jax.Array
    converged: jax.Array
    iters: jax.Array
    resnorm: jax.Array


def dc_core(compiled: CompiledCircuit, params, ctx: SimSpec, x0,
            opts: NewtonOptions, ic_mask=None, ic_vals=None):
    """Jit-traceable DC solve with continuation. vmap-safe."""
    dtype = compiled.dtype
    # permanent gmin shunt on every voltage node (SPICE gmin semantics,
    # reference SimSpec.gmin /root/reference/src/simulate_ir.jl:12-20) —
    # keeps floating-node DC matrices nonsingular
    base_g = ctx.gmin

    def plain(x_init, c):
        return _newton(_dc_res_jac(compiled, params, c, base_g,
                                   ic_mask, ic_vals), x_init, opts)

    x1, ok1, it1, fn1 = plain(x0, ctx)

    def hard(xs):
        # One scan covers both continuation ladders (keeps the traced program
        # small): first the gmin decades at full sources, then — restarting
        # from zero — source stepping at zero shunt.
        decades = jnp.logspace(jnp.log10(opts.gmin_start),
                               -14.0, opts.gmin_steps)
        g_sched = jnp.concatenate([decades,
                                   jnp.zeros(opts.src_steps, dtype)])
        lam_sched = jnp.concatenate([jnp.ones(opts.gmin_steps, dtype),
                                     jnp.linspace(0.1, 1.0, opts.src_steps)])
        # position of the gmin→source transition (reset x to zero there)
        reset = jnp.zeros(opts.gmin_steps + opts.src_steps, bool)
        reset = reset.at[opts.gmin_steps].set(True)

        def rung(carry, sched):
            x, xg_final, got_g = carry
            g, lam, rs = sched
            # snapshot the gmin-ladder result before switching ladders
            xg_final = jnp.where(rs, x, xg_final)
            got = jnp.logical_or(got_g, rs)
            x = jnp.where(rs, jnp.zeros_like(x), x)
            c = ctx.replace(sourcefac=lam)
            xn, ok, _, _ = _newton(
                _dc_res_jac(compiled, params, c, g + base_g, ic_mask, ic_vals),
                x, opts)
            return (xn, xg_final, got), None

        (x_src, x_gmin, _), _ = jax.lax.scan(
            rung, (xs, xs, jnp.asarray(False)),
            (g_sched, lam_sched, reset))
        xg, okg, itg, fng = plain(x_gmin, ctx)
        xsrc, oks, its, fns = plain(x_src, ctx)

        x = jnp.where(okg, xg, xsrc)
        return (x, jnp.logical_or(okg, oks), itg + its,
                jnp.where(okg, fng, fns))

    def easy(xs):
        return x1, ok1, it1, fn1

    x2, ok2, it2, fn2 = jax.lax.cond(ok1, easy, hard, x1)

    # --- randomized restarts (reference bootstrapped_nlsolve semantics)
    def restart(carry, key):
        x, ok, it, fn = carry
        xr0 = 1e-7 * jax.random.normal(key, x.shape, dtype)
        xr, okr, itr, fnr = plain(xr0, ctx)
        better = jnp.logical_and(jnp.logical_not(ok), okr)
        return ((jnp.where(better, xr, x), jnp.logical_or(ok, okr),
                 it + itr, jnp.where(better, fnr, fn)), None)

    keys = jax.random.split(jax.random.PRNGKey(1234), opts.restarts)

    def with_restarts(carry):
        out, _ = jax.lax.scan(restart, carry, keys)
        return out

    x3, ok3, it3, fn3 = jax.lax.cond(
        ok2, lambda c: c, with_restarts, (x2, ok2, it2, fn2))
    return DCResult(x3, ok3, it3, fn3)


def ic_arrays(compiled: CompiledCircuit):
    """(mask, vals) arrays for the circuit's ``.ic`` pins (zeros if none)."""
    import numpy as np
    mask = np.zeros(compiled.n_x)
    vals = np.zeros(compiled.n_x)
    for name, v in compiled.circuit.ics.items():
        net = compiled.circuit._nets[name]
        if not net.is_ground:
            mask[net.index] = 1.0
            vals[net.index] = v
    return (jnp.asarray(mask, compiled.dtype),
            jnp.asarray(vals, compiled.dtype))


def solve_dc(compiled: CompiledCircuit, params=None, ctx: SimSpec = None,
             x0=None, opts: NewtonOptions = None, mode=Modes.DCOP,
             use_ics=None) -> DCResult:
    """Solve the DC operating point.  ``params`` is the (possibly overridden /
    vmapped) parameter pytree; defaults to the compiled nominal values.

    ``use_ics``: pin ``.ic``'d nodes during the solve (default: only for the
    transient operating point, SPICE ``.ic`` semantics)."""
    opts = opts or NewtonOptions()
    params = compiled.params0 if params is None else params
    if ctx is None:
        ctx = SimSpec.make(mode=mode, dtype=compiled.dtype)
    else:
        ctx = ctx.with_mode(mode)
    if use_ics is None:
        use_ics = mode == Modes.TRANOP
    use_ics = use_ics and bool(compiled.circuit.ics)
    mask, vals = ic_arrays(compiled)
    if not use_ics:
        mask = jnp.zeros_like(mask)
    if x0 is None:
        x0 = jnp.zeros(compiled.n_x, compiled.dtype)
        x0 = jnp.where(mask > 0, vals, x0)
    fn = _get_dc_jit(compiled, opts)
    return fn(params, ctx, x0, mask, vals)


def _get_dc_jit(compiled: CompiledCircuit, opts: NewtonOptions):
    cache = compiled.__dict__.setdefault("_dc_jit_cache", {})
    if opts not in cache:
        cache[opts] = jax.jit(
            lambda params, ctx, x0, m, v: dc_core(
                compiled, params, ctx, x0, opts, m, v))
    return cache[opts]
