"""DC-initialization quality probes.

The reference ships two tools for studying operating-point robustness:
``reinitialize``/``initialization_norm``
(/root/reference/src/dcop.jl:205-248) re-solve from randomized starting
points and score the result by residual norm, and the
initialization-fragility harness
(/root/reference/scratch/initialization_fragility.jl:57-76) runs N
randomized inits serially and tabulates losses/retcodes — the metastability
probe for circuits with more than one stable operating point (a DFF latch,
a bistable core).  There each init is one host-side solve; here all N
starting points run as ONE vmapped Newton program and the distinct
operating points found are clustered on the host afterwards.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cedarsim_tpu.core.compile import CompiledCircuit
from cedarsim_tpu.core.context import SimSpec, Modes
from cedarsim_tpu.analysis.dc import (dc_core, default_newton_options,
                                      NewtonOptions)


def initialization_norm(compiled: CompiledCircuit, x, params=None,
                        ctx: SimSpec = None) -> float:
    """Residual 2-norm of the static equations at ``x`` — the reference's
    init-quality score (/root/reference/src/dcop.jl:205-231 role).  Zero at
    an exact operating point; large values flag a bad or drifting init."""
    params = compiled.params0 if params is None else params
    if ctx is None:
        ctx = SimSpec.make(mode=Modes.DCOP, dtype=compiled.dtype)
    S, _ = compiled.residuals(jnp.asarray(x, compiled.dtype), ctx, params)
    return float(jnp.linalg.norm(S))


@dataclasses.dataclass
class FragilityReport:
    """Result of :func:`init_fragility`.

    ``solutions``/``counts`` list the distinct converged operating points
    (clustered to ``cluster_tol``) and how many random inits landed in each
    basin; >1 row means the circuit is metastable at DC.
    """
    converged: np.ndarray        # [n] bool per sample
    resnorm: np.ndarray          # [n] final residual norm per sample
    iters: np.ndarray            # [n] Newton iterations per sample
    x: np.ndarray                # [n, n_x] per-sample solutions
    solutions: np.ndarray        # [k, n_x] distinct operating points
    counts: np.ndarray           # [k] samples per basin

    @property
    def converged_frac(self) -> float:
        return float(np.mean(self.converged))

    @property
    def n_solutions(self) -> int:
        return int(len(self.solutions))

    def summary(self) -> str:
        lines = [f"init_fragility: {self.converged_frac * 100:.0f}% of "
                 f"{len(self.converged)} random inits converged; "
                 f"{self.n_solutions} distinct operating point(s)"]
        for k, (sol, c) in enumerate(zip(self.solutions, self.counts)):
            head = np.array2string(sol[:6], precision=4, suppress_small=True)
            lines.append(f"  #{k}: {c} inits -> x[:6]={head}")
        return "\n".join(lines)


def _cluster(x: np.ndarray, tol: float):
    """Greedy tolerance clustering of solution vectors (rows of x)."""
    reps, counts = [], []
    for row in x:
        for k, rep in enumerate(reps):
            if np.max(np.abs(row - rep)) <= tol * (1.0 + np.max(np.abs(rep))):
                counts[k] += 1
                break
        else:
            reps.append(row)
            counts.append(1)
    if not reps:
        return (np.zeros((0, x.shape[1] if x.ndim == 2 else 0)),
                np.zeros((0,), np.int64))
    order = np.argsort(counts)[::-1]
    return (np.stack([reps[i] for i in order]),
            np.asarray([counts[i] for i in order]))


def init_fragility(compiled: CompiledCircuit, n: int = 64, sigma: float = 0.5,
                   seed: int = 0, params=None, ctx: SimSpec = None,
                   opts: NewtonOptions = None, around=None,
                   mode=Modes.DCOP, cluster_tol: float = 1e-4
                   ) -> FragilityReport:
    """Probe DC-initialization robustness: solve the operating point from
    ``n`` Gaussian-perturbed starting points (``around + sigma*randn``) as
    one vmapped program and cluster the distinct solutions found.

    The reference's harness
    (/root/reference/scratch/initialization_fragility.jl:57-76) does the
    same serially with ``1e-7*randn``-style perturbations to expose
    metastable inits; ``sigma`` here defaults much larger because the
    interesting question is usually *basin structure* (how many operating
    points exist, and how big their basins are), not solver noise.

    ``around``: center of the perturbation ball — defaults to zeros (the
    solver's own cold-start).  Randomized-restart bootstraps are disabled
    inside the solve (``opts.restarts=0``) so each sample reports the basin
    its *own* starting point leads to, not a restart's.
    """
    params = compiled.params0 if params is None else params
    if ctx is None:
        from cedarsim_tpu.core.compile import default_ctx
        ctx = default_ctx(compiled).with_mode(mode)
    else:
        ctx = ctx.with_mode(mode)
    opts = opts or default_newton_options(compiled)
    opts = dataclasses.replace(opts, restarts=0)

    center = (jnp.zeros(compiled.n_x, compiled.dtype) if around is None
              else jnp.asarray(around, compiled.dtype))
    key = jax.random.PRNGKey(seed)
    x0 = center[None] + sigma * jax.random.normal(
        key, (n, compiled.n_x), compiled.dtype)

    fb = jax.jit(jax.vmap(lambda x: dc_core(compiled, params, ctx, x, opts),
                          in_axes=0))
    res = fb(x0)
    conv = np.asarray(res.converged)
    xs = np.asarray(res.x)
    sols, counts = _cluster(xs[conv], cluster_tol)
    return FragilityReport(converged=conv, resnorm=np.asarray(res.resnorm),
                           iters=np.asarray(res.iters), x=xs,
                           solutions=sols, counts=counts)
