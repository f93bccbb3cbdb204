"""Circuit compiler: graph IR → pure JAX residual / Jacobian functions.

This is the TPU-native replacement for the reference's DAECompiler backend
(SURVEY.md §2.9): instead of abstract interpretation of compiler IR, the MNA
structure is derived directly from the circuit graph and baked into static
gather/scatter index arrays.

Formulation: charge-oriented MNA DAE

    F(x, t) = S(x, t) + d/dt Q(x) = 0

with unknowns x = [node voltages (ground excluded), internal node voltages,
branch currents].  ``S`` collects resistive currents and algebraic branch
constraints; ``Q`` collects charges/fluxes.  Newton matrices: G = ∂S/∂x,
C = ∂Q/∂x; a transient integrator solves (α·C + G)·δ = -res.

Per device class (a "group"), all instances evaluate in one ``jax.vmap`` of
the model's scalar ``eval`` — instance parameters are stacked arrays, local
unknowns are gathered by a static ``[n_inst, n_lvar]`` index matrix, and the
returned row contributions scatter-add into the global residual (ground rows
land in a trash slot that is sliced off).  Everything is static-shaped; XLA
fuses each group into a handful of kernels and the whole Newton step jits
into one program.  This replaces the reference's per-instance inlined scalar
RHS (/root/reference/src/vasim.jl:853-867) with the vectorized evaluation its
own TODOs ask for.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from cedarsim_tpu import config
from cedarsim_tpu.core.circuit import Circuit, Instance
from cedarsim_tpu.core.context import SimSpec


# --------------------------------------------------------- trace-time cache
#
# Tracing a compact model is expensive for VA devices: each call re-runs the
# AST interpreter over e.g. BSIM-CMG's 178 KB body, and one transient
# program traces the model subgraph several times (predictor residual,
# corrector, fused Jacobian walk, per formulation).  The jaxpr of one eval
# is identical whenever (model, static params, ctx structure, input avals)
# are identical, so we trace once per signature and REPLAY the cached jaxpr
# at every later trace site (jax.core.eval_jaxpr re-binds the primitives
# under the current trace, so vmap/jvp/jacfwd transforms still apply).
# This cuts trace time only — the emitted jaxpr has the same equation count
# and the results agree to 1 ULP with direct tracing (tiny constant-folding
# ordering differences; regression-gated).  Disable via config.trace_cache.

_EVAL_TRACE_CACHE: dict = {}


def _sig_of(v):
    if isinstance(v, (jax.core.Tracer, jax.Array)):
        a = jax.api_util.shaped_abstractify(v)
        return ("aval", a.shape, str(a.dtype), bool(a.weak_type))
    arr = np.asarray(v)
    return ("const", arr.shape, str(arr.dtype), arr.tobytes())


def _is_traced(v):
    return isinstance(v, (jax.core.Tracer, jax.Array))


def _build_eval(model, merged, ctx, lv, eps):
    return model.eval(lv, merged, ctx, eps)


def _build_jac(model, merged, ctx, l, e0):
    return jax.jacfwd(lambda ll: model.eval(ll, merged, ctx, e0))(l)


def _build_jacaux(model, merged, ctx, l, e):
    def f(ll):
        s, q = model.eval(ll, merged, ctx, e)
        return (s, q), (s, q)
    (Js, Jq), (sv, qv) = jax.jacfwd(f, has_aux=True)(l)
    return sv, qv, Js, Jq


def _cached_trace(tag, model, merged, ctx_e, arrays, build):
    """Run ``build(model, merged, ctx_e, *arrays)`` through the trace cache.

    Concrete entries of ``merged`` (the group's static params) stay closure
    constants so model conditionals fold exactly as in a direct call — their
    VALUES are part of the cache key.  Traced entries, the array arguments
    and the SimSpec leaves become jaxpr inputs.  Caching the *differentiated*
    builders (jacfwd) means even the JVP re-linearization work is done once
    per signature, not once per trace site."""
    if not getattr(config, "trace_cache", True):
        return build(model, merged, ctx_e, *arrays)
    dyn_keys = tuple(sorted(k for k, v in merged.items() if _is_traced(v)))
    stat = {k: v for k, v in merged.items() if k not in set(dyn_keys)}
    ctx_leaves, ctx_def = jax.tree.flatten(ctx_e)
    n_arr = len(arrays)
    args = list(arrays) + list(ctx_leaves) + [merged[k] for k in dyn_keys]
    traced = [_is_traced(a) for a in args]
    try:
        key = (tag, model, ctx_def, dyn_keys,
               tuple(sorted((k, _sig_of(v)) for k, v in stat.items())),
               tuple(_sig_of(a) for a in args))
    except Exception:                      # unhashable oddity: trace direct
        return build(model, merged, ctx_e, *arrays)
    entry = _EVAL_TRACE_CACHE.get(key)
    if entry is None:
        n_ctx = len(ctx_leaves)
        consts = [None if t else a for t, a in zip(traced, args)]

        def fn(*targs):
            it = iter(targs)
            full = [next(it) if t else c for t, c in zip(traced, consts)]
            c2 = jax.tree.unflatten(ctx_def, full[n_arr:n_arr + n_ctx])
            d2 = dict(zip(dyn_keys, full[n_arr + n_ctx:]))
            return build(model, {**stat, **d2}, c2, *full[:n_arr])

        if getattr(config, "call_wrap", False):
            # the jit object is shared by every later call site with this
            # signature, so XLA sees ONE named computation called
            # repeatedly (a pjit call per site) instead of an inlined copy
            # per site — jit's own aval cache does the once-per-signature
            # tracing
            entry = ("jit", jax.jit(fn))
        else:
            closed, shape = jax.make_jaxpr(fn, return_shape=True)(
                *[jax.api_util.shaped_abstractify(a)
                  for a, t in zip(args, traced) if t])
            entry = ("jaxpr", (closed, jax.tree.structure(shape)))
        _EVAL_TRACE_CACHE[key] = entry
    kind, payload = entry
    live = [a for a, t in zip(args, traced) if t]
    if kind == "jit":
        return payload(*live)
    closed, out_def = payload
    flat = jax.core.eval_jaxpr(closed.jaxpr, closed.consts, *live)
    return jax.tree.unflatten(out_def, flat)


def cached_model_eval(model, merged, ctx_e, lv, eps):
    """``model.eval(lv, merged, ctx_e, eps)`` through the trace cache."""
    return _cached_trace("eval", model, merged, ctx_e, (lv, eps),
                         _build_eval)


@dataclasses.dataclass
class Group:
    key: str
    model: type
    instances: list          # list[Instance]
    var_idx: np.ndarray      # [n_inst, n_lvar] int32, n_x = ground/pad slot
    row_idx: np.ndarray      # [n_inst, n_lrow] int32, n_x = trash row
    kcl_mask: np.ndarray     # [n_lrow] bool: True for KCL rows (scaled by m)
    eps_idx: np.ndarray      # [n_inst, n_noise] int32 into global eps vector
    dly_idx: np.ndarray = None  # [n_inst, n_delay + n_latch] int32 into the
    #                             global aux vector (exact-history absdelay
    #                             inputs first, then latched-state slots)
    #: params uniform across the group and not requested dynamic: kept as
    #: concrete Python/numpy constants so model conditionals fold at trace
    #: time — the reference's const-prop of non-ParamSim parameters
    #: (/root/reference/src/circuitodesystem.jl:41-65, PDK params become
    #: consts spectre.jl:1365-1527)
    static_params: dict = dataclasses.field(default_factory=dict)


class CompiledCircuit:
    #: dense/sparse linear-algebra crossover (unknown count) for "auto"
    SPARSE_AUTO_THRESHOLD = 256

    def __init__(self, circuit: Circuit, dtype=None, dynamic_params=(),
                 eval_dtype=None, sparse="auto"):
        """``dynamic_params``: param names to keep as traced data (sweepable /
        differentiable): bare names ("w") apply to every instance, dotted
        names ("x1.m1.w") to one.  Everything else that is uniform across a
        device group becomes a compile-time constant.

        ``eval_dtype``: dtype for the *model evaluations* only — state,
        time, LTE control and the linear solves stay in ``dtype``.  On TPU,
        ``eval_dtype=jnp.float32`` runs the device physics on the native VPU
        instead of double-double f64 emulation: ~8x faster XLA compiles and
        several-fold faster evals, at ~1e-7 relative model accuracy (Newton
        tolerances should be loosened accordingly)."""
        self.circuit = circuit
        self.dtype = dtype or config.real_dtype
        self.eval_dtype = eval_dtype or self.dtype
        self.sparse_mode = sparse
        self.dynamic_params = frozenset(
            d.lower() for d in (dynamic_params or ()))
        self._build()

    def _cast_eval(self, v):
        """Cast a value into the model-eval dtype (no-op when not mixed)."""
        return v.astype(self.eval_dtype) if v.dtype != self.eval_dtype else v

    def _ctx_eval(self, ctx):
        if self.eval_dtype == self.dtype:
            return ctx
        ed = self.eval_dtype

        def cast(a):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
                return a.astype(ed)
            return a
        return jax.tree.map(cast, ctx)

    # ------------------------------------------------------------- structure

    def _build(self):
        ckt = self.circuit
        if not ckt.instances:
            raise ValueError(
                "circuit is empty — no device instances (check that the "
                "netlist's first line is a title line, not a component)")
        n_nodes = ckt.n_nodes
        self.node_names = list(ckt.net_names)

        # allocate internal nodes and branch vars
        internal_base = n_nodes
        n_internal = sum(i.model.n_internal for i in ckt.instances)
        branch_base = internal_base + n_internal
        self._inst_internal: dict[str, int] = {}
        self._inst_branch: dict[str, int] = {}
        off = 0
        for inst in ckt.instances:
            if inst.model.n_internal:
                self._inst_internal[inst.name] = internal_base + off
                off += inst.model.n_internal
        off = 0
        for inst in ckt.instances:
            if inst.model.n_branch:
                self._inst_branch[inst.name] = branch_base + off
                off += inst.model.n_branch
        self.n_nodes = n_nodes
        self.n_internal = n_internal
        self.n_branch = off
        self.n_x = branch_base + off

        # x-index names, for diagnostics
        self.x_names = (
            self.node_names
            + [f"{i.name}#int{k}" for i in ckt.instances
               for k in range(i.model.n_internal)]
            + [f"{i.name}#br{k}" for i in ckt.instances
               for k in range(i.model.n_branch)]
        )

        # group instances
        order: list[str] = []
        buckets: dict[str, list[Instance]] = {}
        for inst in ckt.instances:
            key = inst.model.group_key(inst.params)
            if key not in buckets:
                buckets[key] = []
                order.append(key)
            buckets[key].append(inst)

        pad = self.n_x  # ground / trash slot
        self.groups: dict[str, Group] = {}
        self._inst_loc: dict[str, tuple[str, int]] = {}
        params0 = {}
        eps_off = 0
        dly_off = 0
        ring_slots: list[int] = []   # aux indices filled from the history ring
        latch_slots: list[int] = []  # aux indices persisted as latched state
        for key in order:
            insts = buckets[key]
            model = insts[0].model
            nt, ni, nb, nc = (model.n_terms(), model.n_internal,
                              model.n_branch, model.n_control)
            n_delay = getattr(model, "n_delay", 0)
            n_latch = getattr(model, "n_latch", 0)
            var_idx = np.full((len(insts), model.n_lvar()), pad, np.int32)
            row_idx = np.full((len(insts), model.n_lrow()), pad, np.int32)
            eps_idx = np.zeros((len(insts), model.n_noise), np.int32)
            dly_idx = np.zeros((len(insts), n_delay + n_latch), np.int32)
            for j, inst in enumerate(insts):
                self._inst_loc[inst.name] = (key, j)
                for k, net in enumerate(inst.nets):
                    if not net.is_ground:
                        var_idx[j, k] = net.index
                        row_idx[j, k] = net.index
                if ni:
                    b = self._inst_internal[inst.name]
                    for k in range(ni):
                        var_idx[j, nt + k] = b + k
                        row_idx[j, nt + k] = b + k
                if nb:
                    b = self._inst_branch[inst.name]
                    for k in range(nb):
                        var_idx[j, nt + ni + k] = b + k
                        row_idx[j, nt + ni + k] = b + k
                if nc:
                    for k, (kind2, ref) in enumerate(inst.extras):
                        if kind2 == "branch":
                            if ref not in self._inst_branch:
                                raise ValueError(
                                    f"{inst.name}: control source {ref!r} "
                                    "not found or has no branch current")
                            var_idx[j, nt + ni + nb + k] = \
                                self._inst_branch[ref]
                        else:  # net voltage
                            if not ref.is_ground:
                                var_idx[j, nt + ni + nb + k] = ref.index
                if model.n_noise:
                    eps_idx[j] = eps_off + np.arange(model.n_noise)
                    eps_off += model.n_noise
                if n_delay or n_latch:
                    dly_idx[j] = dly_off + np.arange(n_delay + n_latch)
                    ring_slots.extend(range(dly_off, dly_off + n_delay))
                    latch_slots.extend(range(dly_off + n_delay,
                                             dly_off + n_delay + n_latch))
                    dly_off += n_delay + n_latch
            kcl_mask = np.zeros(model.n_lrow(), bool)
            kcl_mask[: nt + ni] = True
            grp = Group(key, model, insts, var_idx, row_idx,
                        kcl_mask, eps_idx, dly_idx)
            self.groups[key] = grp
            # stack params; uniform non-dynamic ones become constants
            gp = {}
            pnames = list(insts[0].params.keys())
            for pn in pnames:
                vals = np.stack(
                    [np.asarray(i.params[pn], np.float64) for i in insts])
                # a $given mask rides with its parameter: if "dc" is
                # dynamic, "dc$given" must be data too, or set_param's
                # given-flip can't reach devices that switch on it
                base = pn[:-6] if pn.endswith("$given") else pn
                dyn = (base.lower() in self.dynamic_params or any(
                    f"{i.name}.{base}".lower() in self.dynamic_params
                    for i in insts))
                uniform = bool(np.all(vals == vals[0]))
                if uniform and not dyn:
                    v0 = vals[0]
                    grp.static_params[pn] = (
                        float(v0) if v0.ndim == 0 else np.asarray(v0))
                else:
                    gp[pn] = jnp.asarray(vals, self.dtype)
            gp["$mult"] = jnp.asarray([i.mult for i in insts], self.dtype)
            params0[key] = gp
        self.n_eps = eps_off
        #: total aux-input width: ring-filled (exact-history delays) +
        #: latch-filled (event-latched state: LRM-exact transition, zi_*)
        self.n_dly = dly_off
        self.n_ring = len(ring_slots)
        self.n_lat = len(latch_slots)
        self.ring_slots = np.asarray(ring_slots, np.int32)
        self.latch_slots = np.asarray(latch_slots, np.int32)
        self.params0 = params0
        self.group_order = order

    # ----------------------------------------------------------- evaluation

    def _zeros_pad(self):
        return jnp.zeros(self.n_x + 1, self.dtype)

    def _aux(self, g: Group, eps, dly):
        """Per-instance aux-input rows: [n_noise noise draws, n_delay
        exact-history delayed values] (the eval contract's eps argument)."""
        le = eps[g.eps_idx]
        if g.dly_idx is not None and g.dly_idx.shape[1]:
            le = jnp.concatenate([le, dly[g.dly_idx]], axis=1)
        return self._cast_eval(le)

    def _dly0(self, x):
        return jnp.zeros(max(self.n_dly, 1), x.dtype)

    def residuals(self, x, ctx: SimSpec, params=None, eps=None, dly=None):
        """Returns (S, Q): static residual and charge vector, each length n_x."""
        params = self.params0 if params is None else params
        x_pad = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        if eps is None:
            eps = jnp.zeros(max(self.n_eps, 1), x.dtype)
        if dly is None:
            dly = self._dly0(x)
        S = self._zeros_pad()
        Q = self._zeros_pad()
        ctx_e = self._ctx_eval(ctx)
        for key in self.group_order:
            g = self.groups[key]
            gp = params[key]
            lv = self._cast_eval(x_pad[g.var_idx])       # [n_inst, n_lvar]
            le = self._aux(g, eps, dly)                  # [n_inst, n_aux]
            pv = {k: self._cast_eval(v) for k, v in gp.items()
                  if k != "$mult"}
            sp = g.static_params
            s, q = jax.vmap(
                lambda l, p, e: cached_model_eval(g.model, {**sp, **p}, ctx_e, l, e))(
                    lv, pv, le)
            scale = jnp.where(jnp.asarray(g.kcl_mask)[None, :],
                              gp["$mult"][:, None], 1.0)
            S = S.at[g.row_idx].add(s.astype(self.dtype) * scale)
            Q = Q.at[g.row_idx].add(q.astype(self.dtype) * scale)
        return S[:-1], Q[:-1]

    def jacobians(self, x, ctx: SimSpec, params=None):
        """Dense (G, C) = (∂S/∂x, ∂Q/∂x), each [n_x, n_x].  Assembled from
        per-instance local jacobians (jacfwd of the scalar eval) scattered
        with the precomputed index matrices — no global autodiff through the
        scatter."""
        params = self.params0 if params is None else params
        x_pad = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        n1 = self.n_x + 1
        G = jnp.zeros((n1, n1), self.dtype)
        C = jnp.zeros((n1, n1), self.dtype)
        ctx_e = self._ctx_eval(ctx)
        for key in self.group_order:
            g = self.groups[key]
            gp = params[key]
            lv = self._cast_eval(x_pad[g.var_idx])
            pv = {k: self._cast_eval(v) for k, v in gp.items()
                  if k != "$mult"}
            sp = g.static_params
            ne = (g.model.n_noise + getattr(g.model, "n_delay", 0)
                  + getattr(g.model, "n_latch", 0))
            e0 = jnp.zeros(ne, self.eval_dtype)

            def local_jac(l, p):
                return _cached_trace("jac", g.model, {**sp, **p}, ctx_e,
                                     (l, e0), _build_jac)

            Js, Jq = jax.vmap(local_jac)(lv, pv)     # [n_inst, n_lrow, n_lvar]
            scale = jnp.where(jnp.asarray(g.kcl_mask)[None, :, None],
                              gp["$mult"][:, None, None], 1.0)
            rows = g.row_idx[:, :, None]
            cols = g.var_idx[:, None, :]
            G = G.at[rows, cols].add(Js.astype(self.dtype) * scale)
            C = C.at[rows, cols].add(Jq.astype(self.dtype) * scale)
        return G[:-1, :-1], C[:-1, :-1]

    def res_jacs(self, x, ctx: SimSpec, params=None, eps=None, dly=None):
        """Fused (S, Q, G, C) in ONE walk per group: ``jax.linearize`` shares
        the primal evaluation with the tangent map, so a Newton iteration
        costs one model evaluation + n_lvar linear-tangent evaluations
        (instead of separate residual and jacfwd walks).

        NOTE: measured SLOWER than the separate residuals()+jacobians()
        walks inside the Newton loops on both CPU (−17% batched) and TPU
        (−4%) — XLA optimizes the jacfwd form better — so the solvers keep
        the separate walks; this stays available for future sparse-path
        work where sharing the primal matters more."""
        params = self.params0 if params is None else params
        x_pad = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        if eps is None:
            eps = jnp.zeros(max(self.n_eps, 1), x.dtype)
        n1 = self.n_x + 1
        S = self._zeros_pad()
        Q = self._zeros_pad()
        G = jnp.zeros((n1, n1), self.dtype)
        C = jnp.zeros((n1, n1), self.dtype)
        for key in self.group_order:
            g = self.groups[key]
            gp = params[key]
            lv = x_pad[g.var_idx]
            le = eps[g.eps_idx]
            if g.dly_idx is not None and g.dly_idx.shape[1]:
                dv = self._dly0(x) if dly is None else dly
                le = jnp.concatenate([le, dv[g.dly_idx]], axis=1)
            pv = {k: v for k, v in gp.items() if k != "$mult"}
            sp = g.static_params
            n_lvar = g.model.n_lvar()
            basis = jnp.eye(n_lvar, dtype=self.dtype)

            def one(l, p, e):
                (sv, qv), lin = jax.linearize(
                    lambda ll: cached_model_eval(g.model, {**sp, **p}, ctx, ll, e), l)
                Js, Jq = jax.vmap(lin)(basis)     # [n_lvar, n_lrow]
                return sv, qv, Js.T, Jq.T

            sv, qv, Js, Jq = jax.vmap(one)(lv, pv, le)
            scale_r = jnp.where(jnp.asarray(g.kcl_mask)[None, :],
                                gp["$mult"][:, None], 1.0)
            S = S.at[g.row_idx].add(sv * scale_r)
            Q = Q.at[g.row_idx].add(qv * scale_r)
            rows = g.row_idx[:, :, None]
            cols = g.var_idx[:, None, :]
            G = G.at[rows, cols].add(Js * scale_r[:, :, None])
            C = C.at[rows, cols].add(Jq * scale_r[:, :, None])
        return S[:-1], Q[:-1], G[:-1, :-1], C[:-1, :-1]

    def res_jacs_fwd(self, x, ctx: SimSpec, params=None, eps=None, dly=None):
        """(S, Q, G, C) in one walk per group via ``jacfwd(..., has_aux=True)``
        — the primal evaluation rides along as the aux output, so each Newton
        iteration instantiates the model subgraph ONCE instead of twice
        (residuals + jacobians).  Matters most for big VA models where XLA
        compile time scales with duplicated subgraphs (BSIM-CMG: ~10k eqns
        per instantiation).  Unlike ``res_jacs`` (jax.linearize form, measured
        slower at runtime), this keeps the jacfwd structure XLA optimizes
        well."""
        params = self.params0 if params is None else params
        x_pad = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        if eps is None:
            eps = jnp.zeros(max(self.n_eps, 1), x.dtype)
        if dly is None:
            dly = self._dly0(x)
        n1 = self.n_x + 1
        S = self._zeros_pad()
        Q = self._zeros_pad()
        G = jnp.zeros((n1, n1), self.dtype)
        C = jnp.zeros((n1, n1), self.dtype)
        ctx_e = self._ctx_eval(ctx)
        for key in self.group_order:
            g = self.groups[key]
            gp = params[key]
            lv = self._cast_eval(x_pad[g.var_idx])
            le = self._aux(g, eps, dly)
            pv = {k: self._cast_eval(v) for k, v in gp.items()
                  if k != "$mult"}
            sp = g.static_params

            def one(l, p, e):
                return _cached_trace("jacaux", g.model, {**sp, **p}, ctx_e,
                                     (l, e), _build_jacaux)

            sv, qv, Js, Jq = jax.vmap(one)(lv, pv, le)
            scale_r = jnp.where(jnp.asarray(g.kcl_mask)[None, :],
                                gp["$mult"][:, None], 1.0)
            S = S.at[g.row_idx].add(sv.astype(self.dtype) * scale_r)
            Q = Q.at[g.row_idx].add(qv.astype(self.dtype) * scale_r)
            rows = g.row_idx[:, :, None]
            cols = g.var_idx[:, None, :]
            G = G.at[rows, cols].add(Js.astype(self.dtype)
                                     * scale_r[:, :, None])
            C = C.at[rows, cols].add(Jq.astype(self.dtype)
                                     * scale_r[:, :, None])
        return S[:-1], Q[:-1], G[:-1, :-1], C[:-1, :-1]

    def ac_rhs(self, params=None):
        """Complex AC drive vector b for (G + jωC)x = b."""
        params = self.params0 if params is None else params
        b = jnp.zeros(self.n_x + 1, config.complex_dtype)
        for key in self.group_order:
            g = self.groups[key]
            gp = {k: v for k, v in params[key].items() if k != "$mult"}
            sp = g.static_params
            probe = {**sp, **{k: v[0] for k, v in gp.items()}}
            if g.model.ac_rhs(probe) is None:
                continue
            if gp:
                vals = jax.vmap(lambda p: g.model.ac_rhs({**sp, **p}))(gp)
            else:
                one = g.model.ac_rhs(sp)
                vals = jnp.broadcast_to(one,
                                        (len(g.instances),) + one.shape)
            b = b.at[g.row_idx].add(vals)
        return b[:-1]

    def noise_sources(self, x, ctx: SimSpec, params=None):
        """(pwr, exp) arrays over all n_eps noise sources, evaluated at the
        operating point x — the reference's ``<eps>pwr``/``<eps>exp``
        observables (/root/reference/src/ac.jl:267-284)."""
        params = self.params0 if params is None else params
        x_pad = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        pwr = jnp.zeros(max(self.n_eps, 1), self.dtype)
        ex = jnp.zeros(max(self.n_eps, 1), self.dtype)
        for key in self.group_order:
            g = self.groups[key]
            if g.model.n_noise == 0:
                continue
            gp = {k: v for k, v in params[key].items() if k != "$mult"}
            sp = g.static_params
            lv = x_pad[g.var_idx]
            pw, e = jax.vmap(
                lambda l, p: g.model.noise(l, {**sp, **p}, ctx))(lv, gp)
            pwr = pwr.at[g.eps_idx].set(pw)
            ex = ex.at[g.eps_idx].set(e)
        return pwr, ex

    def delay_sources(self, x, ctx: SimSpec, params=None):
        """(u_now, td) arrays over all n_ring exact-history absdelay sites,
        evaluated at x — u_now feeds the integrator's history ring, td the
        t−td lookups (analysis/tran.py).  Both are indexed by the ring-slot
        order (``ring_slots`` maps them into the full aux vector).  Nested
        delayed expressions (an absdelay inside another's argument) read 0
        here — not supported."""
        params = self.params0 if params is None else params
        x_pad = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        u = jnp.zeros(max(self.n_dly, 1), self.dtype)
        td = jnp.zeros(max(self.n_dly, 1), self.dtype)
        for key in self.group_order:
            g = self.groups[key]
            nd = getattr(g.model, "n_delay", 0)
            if nd == 0:
                continue
            gp = {k: v for k, v in params[key].items() if k != "$mult"}
            sp = g.static_params
            lv = x_pad[g.var_idx]
            uu, tt = jax.vmap(
                lambda l, p: g.model.delays(l, {**sp, **p}, ctx))(lv, gp)
            u = u.at[g.dly_idx[:, :nd]].set(uu.astype(self.dtype))
            td = td.at[g.dly_idx[:, :nd]].set(tt.astype(self.dtype))
        rs = self.ring_slots if self.n_ring else np.zeros(1, np.int32)
        return u[rs], td[rs]

    def latch_init(self, x, ctx: SimSpec, params=None):
        """Initial full aux vector with every latch site settled at the
        operating point (model.latch0); ring slots zero (the integrator
        overwrites them from the history ring each step)."""
        params = self.params0 if params is None else params
        latw = jnp.zeros(max(self.n_dly, 1), self.dtype)
        if self.n_lat == 0:
            return latw
        x_pad = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        for key in self.group_order:
            g = self.groups[key]
            nd = getattr(g.model, "n_delay", 0)
            nl = getattr(g.model, "n_latch", 0)
            if nl == 0:
                continue
            gp = {k: v for k, v in params[key].items() if k != "$mult"}
            sp = g.static_params
            lv = x_pad[g.var_idx]
            l0 = jax.vmap(
                lambda l, p: g.model.latch0(l, {**sp, **p}, ctx))(lv, gp)
            latw = latw.at[g.dly_idx[:, nd:]].set(l0.astype(self.dtype))
        return latw

    def latch_update(self, x, ctx: SimSpec, latw, params=None):
        """Updated aux vector after an ACCEPTED step at ctx.time: each latch
        site sees its previous state and the accepted solution and returns
        its new state (model.latch) — the event-queue replacement that makes
        LRM-exact transition()/zi_* possible inside lax.while_loop."""
        params = self.params0 if params is None else params
        if self.n_lat == 0:
            return latw
        x_pad = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        for key in self.group_order:
            g = self.groups[key]
            nd = getattr(g.model, "n_delay", 0)
            nl = getattr(g.model, "n_latch", 0)
            if nl == 0:
                continue
            gp = {k: v for k, v in params[key].items() if k != "$mult"}
            sp = g.static_params
            lv = x_pad[g.var_idx]
            lat_rows = latw[g.dly_idx[:, nd:]]
            ln = jax.vmap(
                lambda l, p, lr: g.model.latch(l, {**sp, **p}, ctx, lr))(
                    lv, gp, lat_rows)
            latw = latw.at[g.dly_idx[:, nd:]].set(ln.astype(self.dtype))
        return latw

    # ---------------------------------------------------------- observables

    def observe(self, name: str) -> Callable:
        """Return fn(x, xdot, ctx, params) -> scalar for an observable name:
        a net name ("vout", "x1.mid"), "<inst>.V" (terminal-0/1 voltage
        difference), or "<inst>.I" (current into the first terminal) — the
        reference's ``sys.x1.r1.I`` access (/root/reference/src/circsummary.jl)."""
        ckt = self.circuit
        if name in ckt._nets:
            net = ckt._nets[name]
            if net.is_ground:
                return lambda x, xd, ctx, params=None: jnp.zeros((), x.dtype)
            i = net.index
            return lambda x, xd, ctx, params=None: x[i]
        if "." in name:
            inst_name, field = name.rsplit(".", 1)
            if inst_name in self._inst_loc and field not in ("V", "I"):
                key, j = self._inst_loc[inst_name]
                g = self.groups[key]
                mod = getattr(g.model, "va_module", None)
                if mod is not None and field in mod.variables:
                    def vavar(x, xd, ctx, params=None):
                        params = self.params0 if params is None else params
                        gp = {k: v[j] for k, v in params[key].items()
                              if k != "$mult"}
                        gp = {**g.static_params, **gp}
                        xp = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
                        lv = xp[g.var_idx[j]]
                        return g.model.eval_var(lv, gp, ctx, field)
                    return vavar
            if inst_name in self._inst_loc and field in ("V", "I"):
                key, j = self._inst_loc[inst_name]
                g = self.groups[key]
                if field == "V":
                    ia, ib = g.var_idx[j, 0], g.var_idx[j, 1]

                    def volt(x, xd, ctx, params=None):
                        xp = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
                        return xp[ia] - xp[ib]
                    return volt

                def curr(x, xd, ctx, params=None):
                    # NOTE: exact-history delayed aux inputs read 0 here
                    # (solution arrays don't carry the rings) — terminal
                    # currents of delay_mode="history" devices are only
                    # exact through the pade path (see VADevice.eval_var)
                    params = self.params0 if params is None else params
                    gp = {k: v[j] for k, v in params[key].items()
                          if k != "$mult"}
                    gp = {**g.static_params, **gp}
                    xp = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
                    xdp = jnp.concatenate([xd, jnp.zeros(1, x.dtype)])
                    lv = xp[g.var_idx[j]]
                    lvd = xdp[g.var_idx[j]]
                    e0 = jnp.zeros(
                        g.model.n_noise + getattr(g.model, "n_delay", 0)
                        + getattr(g.model, "n_latch", 0),
                        x.dtype)
                    (s, _), (_, qdot) = jax.jvp(
                        lambda l: g.model.eval(l, gp, ctx, e0), (lv,), (lvd,))
                    return s[0] + qdot[0]
                return curr
        raise KeyError(f"unknown observable {name!r}; nets: "
                       f"{self.node_names[:20]}...")

    # ------------------------------------------------------------ utilities

    def param_loc(self, dotted: str):
        """Resolve 'inst.name.param' → (group_key, instance_idx, param)."""
        inst_name, pname = dotted.rsplit(".", 1)
        if inst_name not in self._inst_loc:
            raise KeyError(f"no instance {inst_name!r}")
        key, j = self._inst_loc[inst_name]
        if pname == "m":
            pname = "$mult"
        elif pname not in self.params0[key]:
            if pname in self.groups[key].static_params:
                raise KeyError(
                    f"{inst_name}.{pname} was compiled as a static constant; "
                    f"pass dynamic_params=[{pname!r}] (or "
                    f"'{inst_name}.{pname}') to compile_circuit to sweep or "
                    "differentiate it")
            raise KeyError(f"{inst_name} has no parameter {pname!r}")
        return key, j, pname

    def set_param(self, params, dotted: str, value):
        """Functional override of one instance parameter — the pytree
        equivalent of the reference's ParamLens
        (/root/reference/src/spectre.jl:159-187).  A bare name (no dot)
        broadcasts to every instance that has the parameter."""
        if "." not in dotted:
            pname = dotted.lower()
            new = dict(params)
            hit = False
            for key in self.group_order:
                if pname in new[key]:
                    grp = dict(new[key])
                    grp[pname] = jnp.full_like(grp[pname], value)
                    # an explicit override IS "given" — devices that switch
                    # behavior on $param_given (e.g. a PULSE source's dc in
                    # DC mode) must see the new value
                    if f"{pname}$given" in grp:
                        grp[f"{pname}$given"] = jnp.ones_like(
                            grp[f"{pname}$given"])
                    new[key] = grp
                    hit = True
                elif pname in self.groups[key].static_params:
                    raise KeyError(
                        f"{pname!r} was compiled as a static constant; pass "
                        f"dynamic_params=[{pname!r}] to compile_circuit")
            if not hit:
                raise KeyError(f"no instance has parameter {pname!r}")
            return new
        key, j, pname = self.param_loc(dotted)
        new = dict(params)
        grp = dict(new[key])
        grp[pname] = grp[pname].at[j].set(value)
        if f"{pname}$given" in grp:
            grp[f"{pname}$given"] = grp[f"{pname}$given"].at[j].set(1.0)
        new[key] = grp
        return new

    def get_param(self, params, dotted: str):
        key, j, pname = self.param_loc(dotted)
        return params[key][pname][j]

    def describe(self):
        """Human-readable structure summary."""
        lines = [f"CompiledCircuit: n_x={self.n_x} (nodes={self.n_nodes} "
                 f"internal={self.n_internal} branch={self.n_branch}) "
                 f"eps={self.n_eps}"]
        for key in self.group_order:
            g = self.groups[key]
            lines.append(
                f"  {key}: {len(g.instances)} instances, "
                f"{len(g.static_params)} static / "
                f"{len(self.params0[key]) - 1} dynamic params")
        return "\n".join(lines)

    def breakpoints(self, tstop: float) -> np.ndarray:
        """All source-waveform discontinuity times in (0, tstop) — the static
        break list replacing ``time_periodic_singularities!``
        (/root/reference/src/spectre_env.jl:71-77)."""
        pts = [np.asarray([], np.float64)]
        for key in self.group_order:
            g = self.groups[key]
            bp = getattr(g.model, "breakpoints", None)
            if bp is None:
                continue
            for inst in g.instances:
                pts.append(np.asarray(bp(inst.params, tstop), np.float64))
        out = np.unique(np.concatenate(pts))
        out = out[(out > 0) & (out < tstop)]
        # delay elements (transmission lines) echo every waveform corner —
        # and each echo's reflections — one line delay later; schedule the
        # closure so the step controller expects the re-emerging edges
        # (SPICE schedules exactly these T-element breakpoints)
        tds = []
        for key in self.group_order:
            g = self.groups[key]
            ed = getattr(g.model, "echo_delays", None)
            if ed is None:
                continue
            for inst in g.instances:
                tds.extend(float(v) for v in ed(inst.params) if v > 0)
        tds = sorted(set(tds))
        if tds and len(out):
            frontier = out
            acc = [out]
            for _ in range(min(int(np.ceil(tstop / tds[0])) + 1, 200)):
                new = np.concatenate([frontier + td for td in tds])
                new = np.unique(new[new < tstop])
                if not len(new) or sum(map(len, acc)) > 20000:
                    break
                acc.append(new)
                frontier = new
            out = np.unique(np.concatenate(acc))
        # merge near-duplicates: the same edge time computed through
        # different float paths (45n+50n vs 20n+25n+50n) lands 1 ULP apart,
        # and the step controller then attempts the 1e-23 s step between
        # them — h collapses and the run aborts.  Distinct real breakpoints
        # are never sub-femtosecond apart.
        if len(out) > 1:
            tol = max(tstop * 1e-9, 1e-18)
            keep = np.concatenate([[True], np.diff(out) > tol])
            out = out[keep]
        return out


def default_ctx(compiled: CompiledCircuit, temp_c=None) -> SimSpec:
    """SimSpec honoring the netlist's ``.option``/``.temp`` (gmin, temp) —
    the ONE place the options→SimSpec policy lives; ``simulate()`` and the
    analysis entry points (ctx=None) both use it, so ``.option gmin=``
    reaches direct API callers too (the reference merges option_* params
    into SimSpec the same way, /root/reference/src/spectre.jl:1529-1544).
    ``temp_c`` overrides the netlist temperature when given."""
    o = getattr(compiled.circuit, "options", {}) or {}
    if temp_c is None:
        temp_c = o.get("temp", 27.0)
    return SimSpec.make(temp_c=temp_c, gmin=o.get("gmin", 1e-12),
                        dtype=compiled.dtype)


def compile_circuit(circuit: Circuit, dtype=None, dynamic_params=(),
                    eval_dtype=None, sparse="auto") -> CompiledCircuit:
    """``sparse``: "auto" (sparse Newton linear algebra for circuits with
    n_x >= SPARSE_AUTO_THRESHOLD unknowns), True, or False."""
    return CompiledCircuit(circuit, dtype=dtype,
                           dynamic_params=dynamic_params,
                           eval_dtype=eval_dtype, sparse=sparse)


def use_sparse_solver(compiled: CompiledCircuit) -> bool:
    mode = getattr(compiled, "sparse_mode", "auto")
    if mode == "auto":
        return compiled.n_x >= CompiledCircuit.SPARSE_AUTO_THRESHOLD
    return bool(mode)


def ensure_dynamic(compiled: CompiledCircuit, names) -> CompiledCircuit:
    """Return a CompiledCircuit where every param in ``names`` (dotted or
    bare) is dynamic — recompiling the structure (cheap, host-side) if some
    are currently static constants.  Variants are cached on the original."""
    names = frozenset(n.lower() for n in names)
    if names <= compiled.dynamic_params:
        return compiled
    want = compiled.dynamic_params | names
    cache = compiled.__dict__.setdefault("_dyn_variants", {})
    if want not in cache:
        cache[want] = CompiledCircuit(compiled.circuit, dtype=compiled.dtype,
                                      dynamic_params=want,
                                      eval_dtype=compiled.eval_dtype,
                                      sparse=compiled.sparse_mode)
    return cache[want]
