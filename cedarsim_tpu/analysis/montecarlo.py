"""Monte-Carlo sweeps: on-device parameter scatter + batched solves.

The reference's MC story is ``agauss`` sampling at elaboration from
``spec.rng`` (/root/reference/src/spectre_env.jl:178-187), one circuit build
per sample, solved serially.  Here the scatter happens on-device: a
``jax.random`` key fans out into a batched parameter pytree (one leading
axis), and the entire sample set solves as ONE vmapped XLA program —
the BASELINE.md 10k-point-sweep configuration.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cedarsim_tpu.core.compile import CompiledCircuit, ensure_dynamic
from cedarsim_tpu.core.context import SimSpec, Modes
from cedarsim_tpu.analysis.dc import dc_core, NewtonOptions, DCResult


def scatter_params(compiled: CompiledCircuit, n: int, dist: dict, key):
    """(compiled', batched_params): every param named in ``dist`` gets n
    Gaussian samples.  ``dist`` maps a dotted ("x1.m1.vto") or bare ("vto")
    name to either sigma (absolute) or ("rel", fraction) for relative sigma.
    """
    compiled = ensure_dynamic(compiled, list(dist))
    keys = jax.random.split(key, len(dist))
    params = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), compiled.params0)
    for k, (name, spec) in zip(keys, sorted(dist.items())):
        rel = isinstance(spec, tuple) and spec[0] == "rel"
        sigma = spec[1] if rel else spec
        if "." in name:
            gkey, j, pname = compiled.param_loc(name)
            base = compiled.params0[gkey][pname][j]
            s = sigma * base if rel else sigma
            samples = base + s * jax.random.normal(k, (n,), compiled.dtype)
            col = params[gkey][pname].at[:, j].set(samples)
            params = {**params, gkey: {**params[gkey], pname: col}}
        else:
            pname = name.lower()
            hit = False
            for gkey in compiled.group_order:
                if pname in compiled.params0[gkey]:
                    base = compiled.params0[gkey][pname]      # [n_inst]
                    ni = base.shape[0]
                    s = sigma * base if rel else sigma
                    samples = base[None] + s * jax.random.normal(
                        k, (n, ni), compiled.dtype)
                    params = {**params,
                              gkey: {**params[gkey], pname: samples}}
                    hit = True
            if not hit:
                raise KeyError(f"no instance has parameter {pname!r}")
    return compiled, params


def mc_dc(compiled: CompiledCircuit, n: int, dist: dict, seed=0,
          ctx: SimSpec = None, opts: NewtonOptions = None,
          mode=Modes.DCOP, warm_start=True) -> DCResult:
    """n Monte-Carlo DC operating points in one vmapped program.

    ``warm_start`` (default): solve the nominal point once with the full
    continuation ladder, then run every sample as a *light* Newton from the
    nominal solution — under vmap, lax.cond lowers to select so the ladder
    would otherwise execute for every lane whether needed or not.  Lanes
    that fail the light solve are re-run with the robust program."""
    from cedarsim_tpu.analysis.dc import default_newton_options
    opts = opts or default_newton_options(compiled)
    if ctx is None:
        from cedarsim_tpu.core.compile import default_ctx
        ctx = default_ctx(compiled).with_mode(mode)
    else:
        ctx = ctx.with_mode(mode)
    compiled, bp = scatter_params(compiled, n, dist,
                                  jax.random.PRNGKey(seed))
    return _mc_solve(compiled, bp, n, ctx, opts, mode, warm_start)


def _mc_solve(compiled, bp, n, ctx, opts, mode, warm_start):
    """Solve a batched parameter pytree ``bp`` (leading axis n) as ONE
    vmapped program, with the nominal-warm-start + robust-relaunch ladder."""
    cache = compiled.__dict__.setdefault("_mc_jit_cache", {})

    def batched(o):
        if o not in cache:
            cache[o] = jax.jit(jax.vmap(
                lambda p, c, x: dc_core(compiled, p, c, x, o),
                in_axes=(0, None, 0)))
        return cache[o]

    def attach(r):
        from cedarsim_tpu.analysis.sweeps import _ctx_axes
        r._obs = (compiled, ctx, bp, _ctx_axes(False, ctx.mode))
        return r

    if not warm_start:
        x0 = jnp.zeros((n, compiled.n_x), compiled.dtype)
        return attach(batched(opts)(bp, ctx, x0))

    from cedarsim_tpu.analysis.dc import solve_dc
    nominal = solve_dc(compiled, compiled.params0, ctx, opts=opts, mode=mode)
    light = dataclasses.replace(opts, gmin_steps=2, src_steps=2, restarts=0,
                                gmin_start=1e-6)
    x0 = jnp.broadcast_to(nominal.x[None], (n, compiled.n_x))
    res = batched(light)(bp, ctx, x0)
    ok = np.asarray(res.converged)
    if ok.all():
        return attach(res)
    # robust second pass for the failed lanes only
    bad = np.nonzero(~ok)[0]
    bp_bad = jax.tree.map(lambda a: a[bad], bp)
    res2 = batched(opts)(bp_bad, ctx,
                         jnp.zeros((len(bad), compiled.n_x), compiled.dtype))
    x = np.array(res.x)
    conv = ok.copy()
    iters = np.array(res.iters)
    resnorm = np.array(res.resnorm)
    x[bad] = np.asarray(res2.x)
    conv[bad] = np.asarray(res2.converged)
    iters[bad] = np.asarray(res2.iters)
    resnorm[bad] = np.asarray(res2.resnorm)
    return attach(DCResult(jnp.asarray(x), jnp.asarray(conv),
                           jnp.asarray(iters), jnp.asarray(resnorm)))


def statistics_params(netlist, n, include_paths=(), seed=0, temp=27.0):
    """Elaborate ``netlist`` (AST) under n Monte-Carlo seeds driven by its
    ``statistics``/``agauss`` variations, and assemble ONE batched parameter
    pytree over a single compiled circuit.

    Per-seed elaboration is host-side and cheap (milliseconds); the expensive
    parts — compile and solve — happen once and batched.  The varied device
    parameters are discovered automatically by diffing the elaborations
    (which follows the variation through arbitrary parameter expressions),
    declared dynamic, and stacked per lane.  Returns (compiled,
    batched_params).  Raises if a seed changes the circuit *structure*
    (e.g. a statistics draw flipping an .if branch)."""
    from cedarsim_tpu.core.compile import compile_circuit
    from cedarsim_tpu.frontend.elaborate import elaborate
    ckts = [elaborate(netlist, include_paths=include_paths,
                      mc_seed=seed + i, temp=temp) for i in range(n)]
    base = ckts[0]
    sig = [(i.name, type(i.model).__name__, getattr(i.model, "name", ""))
           for i in base.instances]
    insts_by_lane = []
    varying = set()
    for lane, c in enumerate(ckts):
        s = [(i.name, type(i.model).__name__, getattr(i.model, "name", ""))
             for i in c.instances]
        if s != sig:
            raise ValueError(
                f"statistics seed {seed + lane} changed the circuit "
                "structure — per-seed topology variation cannot batch")
        insts_by_lane.append({i.name: i for i in c.instances})
        if lane:
            for i0, ic in zip(base.instances, c.instances):
                for pn, v0 in i0.params.items():
                    if not np.array_equal(np.asarray(v0),
                                          np.asarray(ic.params[pn])):
                        varying.add(f"{i0.name}.{pn}".lower())
    compiled = compile_circuit(
        base, dynamic_params=sorted(
            v[:-6] if v.endswith("$given") else v for v in varying))
    bp = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n,) + a.shape),
        compiled.params0)
    for key in compiled.group_order:
        grp = compiled.groups[key]
        for pn, v in compiled.params0[key].items():
            if pn == "$mult":
                continue
            stacked = np.stack([
                np.stack([np.asarray(insts_by_lane[lane][inst.name]
                                     .params[pn], np.float64)
                          for inst in grp.instances])
                for lane in range(n)])
            bp = {**bp, key: {**bp[key],
                              pn: jnp.asarray(stacked, compiled.dtype)}}
    return compiled, bp


def mc_statistics(netlist, n, include_paths=(), seed=0, ctx: SimSpec = None,
                  opts: NewtonOptions = None, mode=Modes.DCOP,
                  warm_start=True, temp=27.0) -> DCResult:
    """n Monte-Carlo DC points over the netlist's ``statistics`` blocks
    (and any ``agauss`` expressions) as ONE vmapped program — the Spectre
    MC workflow with the serial re-elaborate-and-solve loop replaced by
    host-side param assembly + a single batched solve."""
    from cedarsim_tpu.analysis.dc import default_newton_options
    compiled, bp = statistics_params(netlist, n, include_paths, seed, temp)
    opts = opts or default_newton_options(compiled)
    if ctx is None:
        from cedarsim_tpu.core.compile import default_ctx
        ctx = default_ctx(compiled).with_mode(mode)
    else:
        ctx = ctx.with_mode(mode)
    return _mc_solve(compiled, bp, n, ctx, opts, mode, warm_start)
