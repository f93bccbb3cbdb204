"""Device-mesh execution of batched sweeps.

The reference's sweep execution is a serial host loop over ``remake``d
problems (/root/reference/src/sweeps.jl:471-502).  Here a sweep is a stacked
parameter pytree (leading batch axis); this module shards that axis over a
``jax.sharding.Mesh`` so each chip Newton-solves its slice of the sweep
concurrently — per-point solves are embarrassingly parallel, so the only
collective is the result gather (SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cedarsim_tpu.core.compile import CompiledCircuit
from cedarsim_tpu.core.context import SimSpec, Modes
from cedarsim_tpu.analysis.dc import dc_core, NewtonOptions, DCResult
from cedarsim_tpu.analysis.sweeps import batch_params, sweepify


def make_mesh(n_devices=None, axis="batch") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def pad_batch(tree, multiple: int):
    """Pad every leaf's leading axis up to a multiple (sharding needs equal
    shards); returns (padded_tree, original_n)."""
    n = jax.tree.leaves(tree)[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return tree, n
    def _pad(x):
        return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    return jax.tree.map(_pad, tree), n


def dc_sweep_sharded(compiled: CompiledCircuit, sweep, mesh: Mesh = None,
                     params=None, ctx: SimSpec = None,
                     opts: NewtonOptions = None, mode=Modes.DCOP) -> DCResult:
    """Batched DC sweep sharded across the mesh's batch axis."""
    from cedarsim_tpu.analysis.dc import default_newton_options
    opts = opts or default_newton_options(compiled)
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    if ctx is None:
        ctx = SimSpec.make(mode=mode, dtype=compiled.dtype)
    else:
        ctx = ctx.with_mode(mode)
    compiled, bp, _ = batch_params(compiled, sweep, params)
    bp, n = pad_batch(bp, mesh.size)
    npad = jax.tree.leaves(bp)[0].shape[0]
    x0 = jnp.zeros((npad, compiled.n_x), compiled.dtype)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    bp = jax.tree.map(lambda a: jax.device_put(a, shard), bp)
    x0 = jax.device_put(x0, shard)

    fn = _get_sharded_jit(compiled, opts, mesh)
    res = fn(bp, jax.tree.map(lambda a: jax.device_put(a, repl), ctx), x0)
    return DCResult(res.x[:n], res.converged[:n], res.iters[:n],
                    res.resnorm[:n])


def _get_sharded_jit(compiled, opts, mesh):
    cache = compiled.__dict__.setdefault("_dcsweep_shard_cache", {})
    key = (opts, id(mesh))
    if key not in cache:
        f = jax.vmap(lambda p, c, x: dc_core(compiled, p, c, x, opts),
                     in_axes=(0, None, 0))
        cache[key] = jax.jit(f)
    return cache[key]
