"""Fused chord-Newton Pallas kernel — the single-stream latency lever.

The per-step chord iteration (analysis/tran.py::newton_mod) lowers, per
iteration, to the whole residual model walk: O(100) XLA kernels at ~2-5 µs
dispatch each on TPU, ~10^5x the arithmetic cost of a 25-unknown circuit
(benchmarks/single_stream.md).  This module compiles the ENTIRE chord loop
— model evaluation, residual assembly, back-substitution, damping, and the
convergence test — into ONE Pallas kernel whose Newton ``while_loop`` runs
in VMEM, so a step attempt costs one dispatch instead of
O(iterations x walk).

This is the "fused Newton mega-kernel" lever 2 of single_stream.md, and the
TPU-native analogue of the reference's compiled-RHS-inside-IDA hot loop
(/root/reference/benchmarks/benchmark_common.jl:160-177) with the kernel
boundary hoisted OUT of the iteration.

Design
======
* **Linear/nonlinear group split (numeric, generic).**  Device groups whose
  residual is affine in x at fixed t (sources, R, C, L, controlled sources)
  are folded into constant matrices ``G_lin``/``C_lin`` plus a
  time-dependent offset ``s_off(t)`` evaluated OUTSIDE the kernel once per
  step attempt (a handful of scalar source evaluations).  Only genuinely
  nonlinear groups (MOS, diodes, BJTs) evaluate inside the kernel.
  Linearity is detected numerically: a group is linear iff its Jacobian
  matches at two random points (and its value is affine-consistent) — no
  per-class annotations to maintain.
* **Gather/scatter as one-hot matmuls.**  Mosaic has no general
  gather/scatter; per-terminal one-hot matrices turn ``x[var_idx]`` and
  ``at[row_idx].add`` into small MXU matmuls (26x30-class shapes).  The
  instance axis rides the LANES, every intermediate is a (1, n) or (n, n)
  2D tile, and there are no reshapes/transposes in the loop body
  (ops/pallas_lu.py Mosaic lessons baked in).
* **Frozen inverse instead of in-kernel LU.**  The chord direction uses a
  Jacobian factored ONCE per step attempt.  We precompute the row-
  equilibrated inverse transpose ``MT = inv(J/r).T`` outside (f64, exact)
  and the in-kernel solve is a single (1,n)@(n,n) matmul:
  ``dx = -((f*rinv) @ MT)``.  Chord convergence is certified by the exact
  residual, so an f32 direction only perturbs the iteration path, never
  the answer (same argument as ops/linalg.py's mixed path).
* **f32 in-kernel, cap form only.**  Mosaic has no f64; the kernel targets
  the mixed-precision TPU design point (f32 evals) where the cap-form
  corrector keeps eval noise relative (tran.py ``formulation`` notes).
  The residual convention matches newton_mod's cap form exactly:
  ``f = S(x) + C(x)·v``, ``v = (c0·x + xdh)/h``, with the displacement
  current via jvp of the charge vector.

Precision contract: states enter/leave in the caller's dtype; in-kernel
iterate/residual math is f32.  Tolerances must sit above the f32 noise
floor — exactly the TPU tolerance set bench.py's legs already use
(newton_abstol >= 5e-7, res_tol >= 1e-3).  The integrator's LTE control
(f64, outside) remains the accuracy gate above this.

Used by analysis/tran.py when ``TranOptions.newton_impl == "fused"``
(dense path, cap form, no noise/delay channels, concrete params).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    """f32-exact matmul for the kernel: WITHOUT an explicit precision the
    TPU MXU evaluates f32 dots in one bf16 pass (~2^-10 relative), which
    put a 5 mV error on a 5 V rail's branch residual and stalled every
    post-breakpoint chord (round-4 root cause, measured: interpret
    converged in 2 iterations, Mosaic failed all 12 with S off by exactly
    5·2^-10).  HIGHEST selects the multi-pass f32-accurate MXU algorithm;
    these are tiny (n≈26·n_inst) matmuls, so the extra passes are free."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _concrete(tree) -> bool:
    """True iff every leaf is a concrete (non-tracer) value."""
    return all(not isinstance(leaf, jax.core.Tracer)
               for leaf in jax.tree.leaves(tree))


@dataclasses.dataclass
class _NLGroup:
    key: str
    model: type
    n_inst: int
    n_lvar: int
    n_lrow: int
    #: merged params for the in-kernel eval: python-float statics +
    #: (1, n_inst) f32 arrays for per-instance values
    params: dict
    #: per-terminal one-hot gather matrices, each (n_xp, n_inst) f32:
    #: lv_k(1,n_inst) = x_row(1,n_xp) @ GT[k]
    GT: list
    #: per-row scatter matrices, each (n_inst, n_xp) f32 with the m=
    #: multiplier scaling folded in (KCL rows only) and the ground/trash
    #: column zeroed: S_row += s_k(1,n_inst) @ SmT[k]
    SmT: list
    #: aux-input rows for eval (noise eps slots, zeros), list of (1, n_inst)
    eps0: list


class FusedChordPlan:
    """Precomputed constants for the fused chord kernel of one circuit.

    Build once per (compiled, ctx, params) signature; raises ValueError when
    the circuit is outside the kernel's envelope (sparse-path sizes, delay/
    latch channels, noise injection, traced params) — callers fall back to
    the XLA chord path.
    """

    #: above this unknown count the dense in-VMEM formulation stops being
    #: the right shape (and the sparse path owns the problem anyway)
    MAX_N = 192
    #: per-group resolved-param ceiling for the in-kernel model walk (see
    #: the plan-build guard below: BSIM-CMG's ~1.5k-param walk OOMs the
    #: Mosaic kernel stack; bsim4-class ~400 compiles and wins)
    MAX_NL_PARAMS = 768
    #: batched-kernel lane ceiling for AUTO selection: the (B, 128) model
    #: tiles and the walk's live (B, ·) temporaries scale the kernel's
    #: scoped-VMEM stack with B.  With the 100 MB vmem_limit_bytes on the
    #: batched call (the 16 MB compiler default, not hardware, was the
    #: first wall — B=128 needs 18.05 MB), measured on chip 2026-08-21 at
    #: the bsim4 DFF shape: B=64 → 27.5 tr/s, **B=128 → 33.2 tr/s**
    #: (golden-exact, 0 relaunches), B=256 → 7.5 tr/s (VMEM-pressure
    #: regression).  Explicit newton_impl="fused" bypasses this (the hard
    #: envelope stays MAX_N_BATCHED on n_x, not B).
    AUTO_MAX_B = 128

    def __init__(self, compiled, ctx, params=None):
        params = compiled.params0 if params is None else params
        if compiled.n_x > self.MAX_N:
            raise ValueError("fused chord: circuit too large for the dense "
                             f"in-VMEM kernel (n_x={compiled.n_x})")
        if getattr(compiled, "n_dly", 0):
            raise ValueError("fused chord: delay/latch aux channels are not "
                             "supported in-kernel")
        if not _concrete(params):
            raise ValueError("fused chord: params must be concrete (the "
                             "kernel bakes them as constants); traced "
                             "dynamic params need the XLA chord path")
        self.compiled = compiled
        self.n_x = compiled.n_x
        self.n_xp = compiled.n_x + 1
        # kernel-side context: host-float fields fold as f32 constants; time
        # is re-bound per call (sources live outside, but a nonlinear model
        # may read ctx.time)
        self.ctx = ctx

        # plan construction is eager host math (linearity probes, jacfwd of
        # small subsets); under the axon tunnel every eager op would
        # round-trip to the chip, so pin it to the CPU backend (the
        # tunnel-immune-probe discipline of core/sparse_ops.py).
        # ensure_compile_time_eval: direct tran_core callers build the plan
        # INSIDE an active trace, where omnistaging turns every concrete
        # jnp op into a constant-tracer and np.asarray(Ga) raises
        # TracerArrayConversionError (the sparse_ops lazy-plan lesson,
        # round-3 weak #3; re-hit by the vmapped fused test, round-4)
        with jax.default_device(jax.devices("cpu")[0]), \
                jax.ensure_compile_time_eval():
            self._build_split(params, ctx)

    def _build_split(self, params, ctx):
        compiled = self.compiled
        d = compiled.dtype
        # the numeric core (linearity probes + linear-subsystem jacobians)
        # is ~32 s of eager host math per process (measured on chip
        # 2026-08-21) and depends only on (structure, params, ctx) — cache
        # it on disk next to the DC artifacts; everything below the core
        # rebuilds in milliseconds
        from cedarsim_tpu.utils import artifacts
        ck = artifacts.plan_key(compiled, params, ctx)
        core = artifacts.load_plan_core(ck)
        if core is not None:
            lin_keys, nl_keys, G_lin, C_lin, q_off = core
            if set(lin_keys) | set(nl_keys) != set(compiled.group_order):
                core = None          # stale layout — rebuild
            else:
                self.lin_keys = list(lin_keys)
                self.nl_keys = [k for k in compiled.group_order
                                if k in set(nl_keys)]
                self.G_lin = np.asarray(G_lin, np.float64)
                self.C_lin = np.asarray(C_lin, np.float64)
                self.q_off = np.asarray(q_off, np.float64)
        if core is None:
            rng = np.random.default_rng(0)
            xa = rng.normal(size=self.n_x) * 0.5
            xb = rng.normal(size=self.n_x) * 2.0 + 0.25
            lin_keys, nl_keys = [], []
            for key in compiled.group_order:
                if self._group_is_linear(key, params, ctx, xa, xb):
                    lin_keys.append(key)
                else:
                    nl_keys.append(key)
            self.lin_keys = lin_keys
            self.nl_keys = nl_keys

            # --- linear part: G_lin/C_lin at xa (constant by the test
            # above); offsets come from s_off(t) per call and the constant
            # q_off
            Ga, Ca = self._sub_jac(lin_keys, params, ctx, xa)
            z = np.zeros(self.n_x)
            S0, Q0 = [np.asarray(v, np.float64)
                      for v in self._sub_res(lin_keys, params, ctx, z, 0.0,
                                             exact=True)]
            self.G_lin = np.asarray(Ga, np.float64)
            self.C_lin = np.asarray(Ca, np.float64)
            self.q_off = Q0 - self.C_lin @ z
            artifacts.store_plan_core(ck, self.lin_keys, self.nl_keys,
                                      self.G_lin, self.C_lin, self.q_off)
        # f32 kernel constants, padded to n_xp with a zero row/col
        self.GlinT = self._padT(self.G_lin)
        self.ClinT = self._padT(self.C_lin)
        self.q_off_row = np.zeros((1, self.n_xp), np.float32)
        self.q_off_row[0, : self.n_x] = self.q_off

        # --- nonlinear groups: one-hot gather/scatter + baked params
        self.nl: list[_NLGroup] = []
        for key in self.nl_keys:
            g = compiled.groups[key]
            gp = params[key]
            ni = len(g.instances)
            mult = np.asarray(gp["$mult"], np.float64)
            merged = {}
            for pn, pv in g.static_params.items():
                merged[pn] = pv  # python/np scalars: trace-time constants
            for pn, pv in gp.items():
                if pn == "$mult":
                    continue
                merged[pn] = jnp.asarray(
                    np.asarray(pv, np.float32).reshape(1, ni))
            GT = []
            for k in range(g.model.n_lvar()):
                m = np.zeros((self.n_xp, ni), np.float32)
                m[g.var_idx[:, k], np.arange(ni)] = 1.0
                m[self.n_x, :] = 0.0          # pad slot reads 0
                GT.append(m)
            SmT = []
            for k in range(g.model.n_lrow()):
                m = np.zeros((ni, self.n_xp), np.float32)
                scale = mult if g.kcl_mask[k] else np.ones(ni)
                m[np.arange(ni), g.row_idx[:, k]] = scale
                m[:, self.n_x] = 0.0          # trash row discarded
                SmT.append(m)
            eps0 = [jnp.zeros((1, ni), jnp.float32)
                    for _ in range(g.model.n_noise)]
            self.nl.append(_NLGroup(
                key=key, model=g.model, n_inst=ni,
                n_lvar=g.model.n_lvar(), n_lrow=g.model.n_lrow(),
                params=merged, GT=GT, SmT=SmT, eps0=eps0))
            if len(merged) > self.MAX_NL_PARAMS:
                # empirical Mosaic envelope: the in-kernel model walk of a
                # parameter-heavy compact model blows the scoped-VMEM
                # kernel stack ("kernel-vmem-stack-oom": BSIM-CMG 107 with
                # ~1.5k resolved card params OOMs at nb=32, measured
                # 2026-08-21 in the bench CMG escalation rung; the
                # ~400-param bsim4-class walk compiles and wins).  Raise at
                # plan build so auto-impl resolution falls back to the XLA
                # chord path instead of dying minutes into Mosaic.
                raise ValueError(
                    f"fused chord: nl group {key!r} carries {len(merged)} "
                    f"params (> {self.MAX_NL_PARAMS}) — model walk too "
                    "large for the in-VMEM kernel; use newton_impl='xla'")
        self._dtype = d

    def dyn_leaf_safe(self, key, pname):
        """True iff PER-LANE (vmapped) variation of params[key][pname] is
        live in the kernel: nonlinear-group tree leaves are runtime inputs
        (``dyn_layout``), and a linear-group leaf qualifies only when a
        numeric probe shows it does not enter the baked G_lin/C_lin
        matrices (pure ``s_off`` offsets — source dc/amplitudes; an R/C/L
        value or controlled-source gain fails the probe).  Auto-impl
        resolution (analysis/tran.auto_tpu_impl) consults this before
        fusing a batched sweep — a baked matrix param varied per lane
        would be silently wrong in-kernel."""
        if key in self.nl_keys:
            return True
        if key not in self.lin_keys:
            return False
        p0 = self.compiled.params0
        if pname not in p0.get(key, {}):
            return False
        with jax.default_device(jax.devices("cpu")[0]), \
                jax.ensure_compile_time_eval():
            xa = np.random.default_rng(0).normal(size=self.n_x) * 0.5
            Ga0, Ca0 = self._sub_jac([key], p0, self.ctx, xa)
            pp = dict(p0)
            grp = dict(pp[key])
            v = np.asarray(grp[pname], np.float64)
            grp[pname] = v * 1.07 + 0.013 * (np.abs(v) + 1.0)
            pp[key] = grp
            Ga1, Ca1 = self._sub_jac([key], pp, self.ctx, xa)
        tol = dict(rtol=1e-9, atol=1e-12)
        return bool(np.allclose(np.asarray(Ga0), np.asarray(Ga1), **tol)
                    and np.allclose(np.asarray(Ca0), np.asarray(Ca1), **tol))

    # ------------------------------------------------------------ build utils

    def _padT(self, M):
        """(n_x, n_x) f64 -> padded transpose (n_xp, n_xp) f32 for the
        row-vector form ``out_row = x_row @ MT``."""
        P = np.zeros((self.n_xp, self.n_xp), np.float32)
        P[: self.n_x, : self.n_x] = M.T
        return P

    def _sub_res(self, keys, params, ctx, x, t, exact=False):
        """(S, Q) assembled over a subset of groups (mirrors
        CompiledCircuit.residuals, core/compile.py, restricted to ``keys``).

        ``exact=True`` skips the mixed-precision eval cast: the linearity
        probe and the baked G_lin/C_lin constants must be f64-clean — under
        eval_dtype=float32 the probe's 1e-9 affine test would otherwise
        drown in f32 eval noise and misclassify every linear group as
        nonlinear (pulling scan-lowered source evals into the kernel)."""
        comp = self.compiled
        cast = (lambda v: v) if exact else comp._cast_eval
        x = jnp.asarray(x, comp.dtype)
        x_pad = jnp.concatenate([x, jnp.zeros(1, comp.dtype)])
        ctx_t = ctx.at_time(t)
        ctx_e = ctx_t if exact else comp._ctx_eval(ctx_t)
        S = comp._zeros_pad()
        Q = comp._zeros_pad()
        eps = jnp.zeros(max(comp.n_eps, 1), comp.dtype)
        for key in keys:
            g = comp.groups[key]
            gp = params[key]
            lv = cast(x_pad[g.var_idx])
            le = cast(eps[g.eps_idx])
            pv = {k: cast(jnp.asarray(v)) for k, v in gp.items()
                  if k != "$mult"}
            sp = g.static_params
            s, q = jax.vmap(
                lambda l, p, e: g.model.eval(
                    [l[i] for i in range(g.model.n_lvar())],
                    {**sp, **p}, ctx_e, e))(lv, pv, le)
            scale = jnp.where(jnp.asarray(g.kcl_mask)[None, :],
                              jnp.asarray(gp["$mult"])[:, None], 1.0)
            S = S.at[g.row_idx].add(s.astype(comp.dtype) * scale)
            Q = Q.at[g.row_idx].add(q.astype(comp.dtype) * scale)
        return S[:-1], Q[:-1]

    def _sub_jac(self, keys, params, ctx, x):
        # jitted: eager jacfwd-of-vmapped-eval re-enters the batching
        # interpreter per op — minutes of pure dispatch overhead on a busy
        # host (measured round-4), vs one bounded small-program compile
        js = jax.jit(jax.jacfwd(
            lambda xx: self._sub_res(keys, params, ctx, xx, 0.0,
                                     exact=True)))
        return js(jnp.asarray(x, self.compiled.dtype))

    def _group_is_linear(self, key, params, ctx, xa, xb) -> bool:
        """Affine-in-x at fixed t: equal Jacobians at THREE probe points
        (two random-scale + one near the origin) AND the affine
        extrapolation from xa reproduces the value at the others (catches
        x-independent but non-affine curiosities), for both S and Q, at two
        times (t-dependence must stay in the offset).

        The probe-point set is load-bearing: one-sided devices hide from
        same-sign probes (a VA diode whose node drew negative at BOTH
        random points sits reverse-biased at ~1e-14 A — affine below atol —
        while the transient will forward-bias it; round-4 bug, caught by
        `test_fused_plan_va_group`), and exponential devices probed only at
        volt scale can land every probe in ``limexp``'s linear overflow
        tail.  So: both sign mirrors AND a near-origin point."""
        d = self.compiled.dtype
        others = (xb, -xb, -xa, 0.03 * xa)
        fres = jax.jit(lambda xx, tt: self._sub_res([key], params, ctx, xx,
                                                    tt, exact=True))
        fjac = jax.jit(jax.jacfwd(
            lambda xx, tt: self._sub_res([key], params, ctx, xx, tt,
                                         exact=True)))
        jacs = []
        for t in (0.0, 1.7e-9):
            tj = jnp.asarray(t, d)
            Sa, Qa = fres(jnp.asarray(xa, d), tj)
            Ga, Ca = fjac(jnp.asarray(xa, d), tj)
            jacs.append((np.asarray(Ga), np.asarray(Ca)))
            for xo in others:
                So, Qo = fres(jnp.asarray(xo, d), tj)
                Go, Co = fjac(jnp.asarray(xo, d), tj)
                dx = jnp.asarray(xo - xa, d)
                if not (np.allclose(Sa + Ga @ dx, So, rtol=1e-9, atol=1e-12)
                        and np.allclose(Qa + Ca @ dx, Qo, rtol=1e-9,
                                        atol=1e-15)
                        and np.allclose(Go, Ga, rtol=1e-9, atol=1e-12)
                        and np.allclose(Co, Ca, rtol=1e-9, atol=1e-15)):
                    return False
        # Jacobian t-independence: linear split hoists G/C out of s_off(t)
        (Ga0, Ca0), (Ga1, Ca1) = jacs
        return bool(np.allclose(Ga0, Ga1) and np.allclose(Ca0, Ca1))

    # ------------------------------------------------------------ outside ops

    def s_off(self, t, ctx, params=None):
        """Time-dependent linear offset ``S_lin(0, t)`` — evaluated in XLA
        per step attempt (a few scalar source evals)."""
        params = self.compiled.params0 if params is None else params
        S, _ = self._sub_res(self.lin_keys, params, ctx,
                             jnp.zeros(self.n_x, self.compiled.dtype), t)
        return S

    # ------------------------------------------------------------ the kernel

    def _const_inputs(self):
        """Pallas kernels may not capture array constants — every baked
        matrix array is threaded through as an explicit VMEM input, and
        per-instance nl-group params are RUNTIME inputs (``dyn_layout``)
        so vmapped sweeps can scatter them per lane (the bench/PVT W
        axis).  Returns (arrays, dyn_layout, unpack) where
        ``unpack(const_refs, dyn_refs)`` rebuilds (GlT, ClT, qoff,
        per-group GT/SmT lists, per-group param dicts, per-group eps
        lists) from the kernel's leading refs."""
        arrays = [np.asarray(self.GlinT), np.asarray(self.ClinT),
                  np.asarray(self.q_off_row)]
        layout = []          # (group index, kind, key/index)
        dyn_layout = []      # (group index, param name) — runtime inputs
        for gi, g in enumerate(self.nl):
            for k in range(g.n_lvar):
                layout.append((gi, "GT", k))
                arrays.append(np.asarray(g.GT[k]))
            for k in range(g.n_lrow):
                layout.append((gi, "SmT", k))
                arrays.append(np.asarray(g.SmT[k]))
            for pn, pv in g.params.items():
                if getattr(pv, "ndim", 0) > 0:
                    dyn_layout.append((gi, pn))
            for k in range(len(g.eps0)):
                layout.append((gi, "eps", k))
                arrays.append(np.zeros((1, g.n_inst), np.float32))

        def unpack(const_refs, dyn_refs):
            GlT, ClT, qoff = (const_refs[0][:], const_refs[1][:],
                              const_refs[2][:])
            gts = [[None] * g.n_lvar for g in self.nl]
            smts = [[None] * g.n_lrow for g in self.nl]
            pars = []
            epss = [[] for _ in self.nl]
            for g in self.nl:
                # statics stay python/np scalars (trace-time constants)
                pars.append({pn: pv for pn, pv in g.params.items()
                             if not (hasattr(pv, "ndim")
                                     and getattr(pv, "ndim", 0) > 0)})
            for (gi, kind, key), ref in zip(layout, const_refs[3:]):
                if kind == "GT":
                    gts[gi][key] = ref[:]
                elif kind == "SmT":
                    smts[gi][key] = ref[:]
                else:
                    epss[gi].append(ref[:])
            for (gi, pn), ref in zip(dyn_layout, dyn_refs):
                pars[gi][pn] = ref[:]
            return GlT, ClT, qoff, gts, smts, pars, epss

        return arrays, dyn_layout, unpack

    def _dyn_pack_plan(self):
        """Lane-packing plan for the batched kernel's dynamic param tiles:
        4 params per (B, 128) tile at lane offsets 0/32/64/96.  A (B, 30)
        row occupies a full (B, 128) physical tile — bsim4's 70 per-
        instance params alone cost 9 MB of the 16 MB VMEM at B=256
        (measured OOM: 35.25 MB scoped).  Packing cuts that 4×.  Returns
        (n_tiles, slices) with slices[m] = (tile, lane_off, n_inst), or
        None when any group has n_inst > 32 (fall back to unpacked)."""
        if not hasattr(self, "_dyn_layout"):
            _, self._dyn_layout, _ = self._const_inputs()
        nis = [self.nl[gi].n_inst for gi, _ in self._dyn_layout]
        if any(ni > 32 for ni in nis):
            return None
        slices = [(m // 4, (m % 4) * 32, ni) for m, ni in enumerate(nis)]
        return (len(nis) + 3) // 4, slices

    def nl_param_rows(self, params):
        """Per-instance nl-group param arrays from a (possibly traced)
        params pytree, in ``dyn_layout`` order, each (1, n_inst) f32 —
        the kernel's runtime param inputs.  Per-lane dynamic variation of
        NONLINEAR-group params is in the fused envelope; linear groups
        enter the kernel only through the baked G_lin/C_lin matrices plus
        the live s_off(t, params) offset and the live per-lane J, so their
        *offset* params (source dc/amplitudes) are live too — but a
        per-lane LINEAR MATRIX param (an R/C/L value, a controlled-source
        gain) is outside the envelope and must use newton_impl='xla'."""
        if not hasattr(self, "_dyn_layout"):
            _, self._dyn_layout, _ = self._const_inputs()
        rows = []
        for gi, pn in self._dyn_layout:
            g = self.nl[gi]
            v = jnp.asarray(params[g.key][pn], jnp.float32).reshape(1, -1)
            rows.append(jnp.broadcast_to(v, (1, g.n_inst)))
        return rows

    def _nl_parts(self, x_row, v_row, ctx_t, gts, smts, pars, epss):
        """In-kernel nonlinear contributions: returns (S_nl, Q_nl, ic_nl)
        rows, each (1, n_xp) f32.  Everything stays 2D; gathers/scatters are
        one-hot matmuls; the displacement current C_nl(x)·v is the jvp of
        the charge rows in direction v."""
        S = jnp.zeros((1, self.n_xp), jnp.float32)
        Q = jnp.zeros((1, self.n_xp), jnp.float32)
        ic = jnp.zeros((1, self.n_xp), jnp.float32)
        f32 = jnp.float32
        for gi, g in enumerate(self.nl):
            lv = [_dot(x_row, gts[gi][k])
                  for k in range(g.n_lvar)]
            lvd = [_dot(v_row, gts[gi][k])
                   for k in range(g.n_lvar)]

            def f(lvs, _g=g, _p=pars[gi], _e=epss[gi]):
                s, q = _g.model.eval(lvs, _p, ctx_t, _e)
                # rows come back stacked (n_lrow, 1, n_inst); hand them on
                # as a tuple of (1, n_inst) tiles (static leading index)
                return ([s[k] for k in range(_g.n_lrow)],
                        [q[k] for k in range(_g.n_lrow)])

            (s, q), (_, qd) = jax.jvp(f, (lv,), (lvd,))
            for k in range(g.n_lrow):
                sm = smts[gi][k]
                S = S + _dot(s[k], sm)
                Q = Q + _dot(q[k], sm)
                ic = ic + _dot(qd[k], sm)
        return S, Q, ic

    def build_kernel(self, opts, unpack, n_const, n_dyn):
        """Kernel body closure for one TranOptions tolerance set."""
        reltol = np.float32(opts.newton_reltol)
        abstol = np.float32(opts.newton_abstol)
        res_rel = np.float32(opts.res_rel)
        res_tol = np.float32(opts.res_tol)
        max_newton = int(opts.max_newton)
        ctx0 = self.ctx
        f32 = jnp.float32

        def kernel(*refs):
            const_refs = refs[:n_const]
            dyn_refs = refs[n_const:n_const + n_dyn]
            (x0_ref, mt_ref, rinv_ref, soff_ref, coef_ref, vanch_ref,
             dout_ref, sout_ref, qout_ref, stat_ref) = \
                refs[n_const + n_dyn:]
            GlT, ClT, qoff, gts, smts, pars, epss = unpack(const_refs,
                                                           dyn_refs)
            ONE = jnp.float32(1.0)
            CAP = jnp.float32(5.0)
            x0 = x0_ref[:]                       # (1, n_xp) anchor x_pred
            MT = mt_ref[:]                       # (n_xp, n_xp)
            rinv = rinv_ref[:]                   # (1, n_xp)
            soff = soff_ref[:]                   # (1, n_xp)
            c0h = coef_ref[0, 0]                 # c0/h   (SMEM f32)
            t_now = coef_ref[0, 1]               # t_new  (SMEM f32)
            vanch = vanch_ref[:]                 # (c0·x_pred + xdh)/h, f64
            #                                      cancellation done OUTSIDE
            ctx_t = ctx0.at_time(t_now)

            # anchored-state formulation: the iterate is x_pred + d with d
            # carried separately.  ẋ = v_anchor + (c0/h)·d, so the f32
            # cancellation error is eps32·|d|·c0/h (d ~ the Newton update,
            # tiny) instead of eps32·|x|·c0/h — the latter (~1.5e-6 on a
            # 5 V rail) exceeds newton_abstol and stalled every chord at a
            # post-breakpoint small h (round-4 root cause: the run died at
            # the first 50 ns source edge).
            def parts(d):
                x = x0 + d
                v = vanch + c0h * d
                Sl = _dot(x, GlT) + soff
                Ql = _dot(x, ClT) + qoff
                icl = _dot(v, ClT)
                Sn, Qn, icn = self._nl_parts(x, v, ctx_t, gts, smts, pars,
                                             epss)
                return Sl + Sn, Ql + Qn, icl + icn

            d0 = jnp.zeros_like(x0)
            S0, Q0, ic0 = parts(d0)

            # Mosaic-safe reduction idioms (the ops/pallas_lu.py kernel
            # conventions): no bool reduce_and/squeeze chains — violation
            # COUNTS as masked f32 sums to (1, 1), flags as (1, 1) f32/i32
            Z = jnp.float32(0.0)
            BIGF = jnp.float32(3.0e38)

            def count(mask_bad):
                """# of True entries as an f32 (1, 1) tile."""
                return jnp.sum(jnp.where(mask_bad, ONE, Z), keepdims=True)

            def body(carry):
                d, S, Q, ic, done, it, nnwt = carry
                fres = S + ic
                dx = -_dot(fres * rinv, MT)
                # non-finite test without isfinite/reduce_and: NaN fails
                # dx == dx, ±inf fails |dx| < BIGF
                nbad = count(jnp.logical_or(dx != dx, jnp.abs(dx) >= BIGF))
                bad = nbad > Z                           # (1, 1) bool
                dx = jnp.where(bad, jnp.zeros_like(dx), dx)
                mx = jnp.max(jnp.abs(dx), keepdims=True)
                dx = dx * jnp.where(mx > CAP, CAP / jnp.maximum(mx, CAP),
                                    ONE)
                dn = d + dx
                Sn, Qn, icn = parts(dn)
                fn = Sn + icn
                scale = jnp.abs(icn) + jnp.abs(Sn)
                nres = count(jnp.abs(fn) > res_rel * scale + res_tol)
                ndx = count(jnp.abs(dx) > reltol * jnp.abs(x0 + dn) + abstol)
                ok = jnp.logical_and(nres + ndx == Z,
                                     jnp.logical_not(bad))
                return (dn, Sn, Qn, icn, ok.astype(jnp.int32),
                        it + 1, nnwt + 1)

            def cond(carry):
                done, it = carry[4], carry[5]
                return jnp.logical_and(done[0, 0] == 0,
                                       it[0, 0] < max_newton)

            i0 = jnp.zeros((1, 1), jnp.int32)
            dn, Sf, Qf, icf, done, _, nnwt = jax.lax.while_loop(
                cond, body, (d0, S0, Q0, ic0, i0, i0, i0))
            nfin = count(jnp.logical_or(dn != dn, jnp.abs(dn) >= BIGF))
            ok = jnp.logical_and(done > 0, nfin == Z)
            dout_ref[:] = dn
            sout_ref[:] = Sf
            qout_ref[:] = Qf
            stat_ref[0, 0] = ok.astype(jnp.int32)[0, 0]
            stat_ref[0, 1] = nnwt[0, 0]

        return kernel

    #: above this unknown count the batched kernel's unrolled per-lane
    #: backsolve (n_xp FMA slices) stops being the right shape — batched
    #: big circuits belong to the sparse/XLA path anyway
    MAX_N_BATCHED = 64

    def build_kernel_batched(self, opts, unpack, n_const, n_dyn, B):
        """Batched kernel body: the batch rides the SUBLANE axis of every
        tile — (B, n_xp) iterates, (B, n_inst) model tiles — so one kernel
        dispatch advances all ``B`` lanes of a vmapped transient through
        their chord solves in lockstep (per-lane done masks, exactly the
        semantics jax.vmap gives the XLA chord loop).  The per-lane frozen
        direction is applied as an unrolled sum over matrix slices:
        dx[b,i] = -sum_j (f*rinv)[b,j] * MT[j][b,i] with MT stored
        (n_xp, B, n_xp) — n_xp static FMAs on (B, n_xp) tiles (Mosaic has
        no batched MXU dot; at n_xp<=64 the VPU form wins anyway)."""
        reltol = np.float32(opts.newton_reltol)
        abstol = np.float32(opts.newton_abstol)
        res_rel = np.float32(opts.res_rel)
        res_tol = np.float32(opts.res_tol)
        max_newton = int(opts.max_newton)
        ctx0 = self.ctx
        n_xp = self.n_xp

        pack = self._dyn_pack_plan()
        n_dyn_in = n_dyn if pack is None else pack[0]

        def kernel(*refs):
            const_refs = refs[:n_const]
            dyn_refs = refs[n_const:n_const + n_dyn_in]
            (x0_ref, mt_ref, rinv_ref, soff_ref, coef_ref, vanch_ref,
             dout_ref, sout_ref, qout_ref, stat_ref) = \
                refs[n_const + n_dyn_in:]
            if pack is not None:
                # lane-packed dyn tiles: 4 params per (B, 128) ref
                tiles = [r[:] for r in dyn_refs]
                dyn_vals = [tiles[ti][:, off:off + ni]
                            for ti, off, ni in pack[1]]
            else:
                dyn_vals = list(dyn_refs)
            GlT, ClT, qoff, gts, smts, pars, epss = unpack(const_refs,
                                                           dyn_vals)
            ONE = jnp.float32(1.0)
            CAP = jnp.float32(5.0)
            x0 = x0_ref[:]                       # (B, n_xp) anchor x_pred
            rinv = rinv_ref[:]                   # (B, n_xp)
            soff = soff_ref[:]                   # (B, n_xp)
            c0h = coef_ref[:, 0:1]               # (B, 1) c0/h
            t_now = coef_ref[:, 1:2]             # (B, 1) t_new
            vanch = vanch_ref[:]                 # (B, n_xp) f64-anchored
            ctx_t = ctx0.at_time(t_now)

            def parts(d):
                x = x0 + d
                v = vanch + c0h * d
                Sl = _dot(x, GlT) + soff
                Ql = _dot(x, ClT) + qoff
                icl = _dot(v, ClT)
                Sn, Qn, icn = self._nl_parts(x, v, ctx_t, gts, smts, pars,
                                             epss)
                return Sl + Sn, Ql + Qn, icl + icn

            Z = jnp.float32(0.0)
            BIGF = jnp.float32(3.0e38)
            d0 = x0 * Z                  # runtime zero (see carry-init note)
            S0, Q0, ic0 = parts(d0)

            def count(mask_bad):
                """# of True entries per lane as an f32 (B, 1) tile."""
                return jnp.sum(jnp.where(mask_bad, ONE, Z), axis=1,
                               keepdims=True)

            # every per-lane flag/counter stays f32: Mosaic rejected the
            # (B, 1) i32 vectors with "Invalid relayout … vector<256x1xi32>"
            # (measured on chip 2026-08-20); the f32 0/1 forms legalize.
            # The stat output is f32 too — cast outside the kernel.
            def body(carry):
                d, S, Q, ic, done, it, nnwt = carry
                act = ONE - done                             # (B, 1) f32
                fres = S + ic
                g = fres * rinv
                dx = jnp.zeros_like(d)
                for j in range(n_xp):
                    dx = dx - g[:, j:j + 1] * mt_ref[j]
                nbad = count(jnp.logical_or(dx != dx, jnp.abs(dx) >= BIGF))
                bad = nbad > Z                               # (B, 1)
                dx = jnp.where(bad, jnp.zeros_like(dx), dx)
                mx = jnp.max(jnp.abs(dx), axis=1, keepdims=True)
                dx = dx * jnp.where(mx > CAP, CAP / jnp.maximum(mx, CAP),
                                    ONE)
                dx = dx * act                # done lanes freeze in place
                dn = d + dx
                Sn, Qn, icn = parts(dn)
                fn = Sn + icn
                scale = jnp.abs(icn) + jnp.abs(Sn)
                nres = count(jnp.abs(fn) > res_rel * scale + res_tol)
                ndx = count(jnp.abs(dx) > reltol * jnp.abs(x0 + dn)
                            + abstol)
                ok = jnp.logical_and(nres + ndx == Z,
                                     jnp.logical_not(bad))
                done_n = jnp.maximum(done, jnp.where(ok, ONE, Z))
                return (dn, Sn, Qn, icn, done_n, it + ONE, nnwt + act)

            def cond(carry):
                done, it = carry[4], carry[5]
                n_active = jnp.sum(ONE - done)
                return jnp.logical_and(n_active > Z,
                                       it[0, 0] < max_newton)

            # loop-carry inits derive from RUNTIME data, not jnp.zeros
            # splats: Mosaic lays a splat constant out fully-replicated
            # ({*,*}), the body yields per-sublane data ({0,*}), and the
            # backedge relayout "replicate a non-singleton dim" is invalid
            # (the second on-chip failure of this kernel, 2026-08-20)
            itc = jnp.zeros((1, 1), jnp.float32)
            dn0 = x0[:, 0:1] * Z               # (B, 1) runtime zero
            dn, Sf, Qf, icf, done, _, nnwt = jax.lax.while_loop(
                cond, body, (d0, S0, Q0, ic0, dn0, itc, dn0))
            nfin = count(jnp.logical_or(dn != dn, jnp.abs(dn) >= BIGF))
            ok = jnp.logical_and(done > Z, nfin == Z)
            dout_ref[:] = dn
            sout_ref[:] = Sf
            qout_ref[:] = Qf
            stat_ref[:, 0:1] = jnp.where(ok, ONE, Z)
            stat_ref[:, 1:2] = nnwt

        return kernel

    def _pallas_fn_batched(self, opts, B, interpret):
        """Jitted batched pallas_call, cached per (tolerances, B)."""
        key = (opts.newton_reltol, opts.newton_abstol, opts.res_rel,
               opts.res_tol, opts.max_newton, bool(interpret), B)
        cache = getattr(self, "_fn_cache", None)
        if cache is None:
            cache = self._fn_cache = {}
        fn = cache.get(key)
        if fn is not None:
            return fn
        n_xp = self.n_xp
        consts, dyn_layout, unpack = self._const_inputs()
        self._dyn_layout = dyn_layout
        if not hasattr(self, "_const_cache"):
            with jax.ensure_compile_time_eval():
                self._const_cache = [jnp.asarray(c) for c in consts]
        kern = self.build_kernel_batched(opts, unpack, len(consts),
                                         len(dyn_layout), B)
        pack = self._dyn_pack_plan()
        n_dyn_in = len(dyn_layout) if pack is None else pack[0]

        @jax.jit
        def run(*args):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern,
                    # raise the scoped-VMEM ceiling from the 16 MB default:
                    # the batched walk's live (B, ·) temporaries measured
                    # 18.05 MB at B=128 (v5e carries 128 MB VMEM/core) —
                    # the 16 MB default, not hardware, was the B wall
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                    in_specs=(
                        [pl.BlockSpec(memory_space=pltpu.VMEM)]
                        * (len(consts) + n_dyn_in + 6)),
                    out_specs=(
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ),
                    out_shape=(
                        jax.ShapeDtypeStruct((B, n_xp), jnp.float32),
                        jax.ShapeDtypeStruct((B, n_xp), jnp.float32),
                        jax.ShapeDtypeStruct((B, n_xp), jnp.float32),
                        # f32 on purpose — (B, 1) i32 vectors fail Mosaic
                        # relayout; cast to i32 outside the kernel
                        jax.ShapeDtypeStruct((B, 2), jnp.float32),
                    ),
                    interpret=interpret,
                )(*args)

        cache[key] = run
        return run

    def _vmap_aware_fn(self, opts, interpret):
        """The pallas invocation behind a ``custom_vmap`` boundary: solo
        calls run the (1, n_xp) kernel; a ``jax.vmap`` over the transient
        (batched sweeps, the bench headline) dispatches ONE natively
        batched kernel with the batch on the sublane axis — NOT the
        default pallas batching rule, which prepends a grid dimension and
        executes B sequential kernel instances."""
        key = ("vmapaware", opts.newton_reltol, opts.newton_abstol,
               opts.res_rel, opts.res_tol, opts.max_newton, bool(interpret))
        cache = getattr(self, "_fn_cache", None)
        if cache is None:
            cache = self._fn_cache = {}
        wrapped = cache.get(key)
        if wrapped is not None:
            return wrapped
        single = self._pallas_fn(opts, interpret)
        plan = self

        @jax.custom_batching.custom_vmap
        def call(x0r, MTp, rir, sofr, coef, vanchr, *dyn):
            return single(*plan._const_cache, *dyn, x0r, MTp, rir, sofr,
                          coef, vanchr)

        @call.def_vmap
        def _rule(axis_size, in_batched, x0r, MTp, rir, sofr, coef,
                  vanchr, *dyn):
            if plan.n_x > plan.MAX_N_BATCHED:
                raise ValueError(
                    "fused chord: batched kernel supports n_x <= "
                    f"{plan.MAX_N_BATCHED} (got {plan.n_x}); use "
                    "newton_impl='xla' for vmapped large circuits")
            B = axis_size
            args = []
            for a, b in zip((x0r, MTp, rir, sofr, coef, vanchr) + dyn,
                            in_batched):
                args.append(a if b else
                            jnp.broadcast_to(a, (B,) + a.shape))
            x0b, MTb, rib, sofb, coefb, vanb = args[:6]
            # batched layouts: rows (B,1,n)->(B,n); MT (B,n,n)->(n,B,n)
            dynb = [a[:, 0, :] for a in args[6:]]
            pk = plan._dyn_pack_plan()
            if pk is not None and dynb:
                # lane-pack 4 params per (B, 128) tile (VMEM: 9 MB -> 2.3
                # MB for bsim4's 70 rows at B=256)
                padded = [jnp.pad(r, ((0, 0), (0, 32 - r.shape[1])))
                          for r in dynb]
                zf = jnp.zeros_like(padded[0])
                dynb = [jnp.concatenate(
                    (padded[i:i + 4] + [zf] * 4)[:4], axis=1)
                    for i in range(0, len(padded), 4)]
            fnb = plan._pallas_fn_batched(opts, B, interpret)
            dn, S, Q, st = fnb(
                *plan._const_cache, *dynb, x0b[:, 0, :],
                jnp.transpose(MTb, (1, 0, 2)), rib[:, 0, :],
                sofb[:, 0, :], coefb[:, 0, :], vanb[:, 0, :])
            outs = (dn[:, None, :], S[:, None, :], Q[:, None, :],
                    st.astype(jnp.int32)[:, None, :])
            return outs, (True, True, True, True)

        cache[key] = call
        return call

    def __call__(self, x_init, J, s_off_vec, c0, h, xdh, t_new, opts,
                 params=None, interpret=False):
        """One fused chord solve.  Same contract as newton_mod's return:
        ``(xn, S, Q, ok, nnwt)`` in the caller's dtype, residual convention
        = cap form.  ``J`` is the (already shunt-damped) chord Jacobian at
        the freeze point.  ``params`` (default: the build params) feeds the
        nl groups' per-instance values as RUNTIME inputs, so traced/
        per-lane dynamic params work (envelope: see nl_param_rows)."""
        from cedarsim_tpu.ops import linalg

        d = self._dtype
        n, n_xp = self.n_x, self.n_xp
        # frozen equilibrated inverse-transpose, exact dtype then cast:
        # MT rows are inv(J/r) columns (lu_solve of unit vectors)
        r = jnp.max(jnp.abs(J), axis=-1)
        r = jnp.where(r == 0, jnp.ones_like(r), r)
        LU, perm = linalg.lu_factor(J / r[:, None])
        eye = jnp.eye(n, dtype=d)
        MT = jax.vmap(lambda e: linalg.lu_solve(LU, perm, e))(eye)
        MTp = jnp.zeros((n_xp, n_xp), jnp.float32)
        MTp = MTp.at[:n, :n].set(MT.astype(jnp.float32))

        def row(v):
            out = jnp.zeros((1, n_xp), jnp.float32)
            return out.at[0, :n].set(v.astype(jnp.float32))

        x0r = row(x_init)
        rir = row(1.0 / r)
        sofr = row(s_off_vec)
        # the corrector-derivative anchor: the state-scale cancellation
        # c0·x_pred + xdh happens HERE in the caller's dtype (f64), so the
        # kernel's f32 ẋ error scales with the small Newton correction d,
        # not with |x| (see kernel docstring)
        vanchr = row((c0 * x_init + xdh) / h)
        coef = jnp.stack([jnp.asarray(c0 / h), jnp.asarray(t_new)]
                         ).astype(jnp.float32).reshape(1, 2)

        fn = self._vmap_aware_fn(opts, interpret)
        dyn = self.nl_param_rows(self.compiled.params0 if params is None
                                 else params)
        dn, S, Q, st = fn(x0r, MTp, rir, sofr, coef, vanchr, *dyn)
        xn = x_init + dn[0, :n].astype(d)
        S = S[0, :n].astype(d)
        Q = Q[0, :n].astype(d)
        ok = st[0, 0] > 0
        nnwt = st[0, 1]
        return xn, S, Q, ok, nnwt

    def _pallas_fn(self, opts, interpret):
        """Jitted pallas_call wrapper, cached per tolerance set — its OWN
        jit boundary, traced under ``enable_x64(False)``, exactly the
        proven ops/pallas_lu.py structure (an inline pallas_call inside the
        big x64 transient trace legalizes differently and is where the
        round-4 f64-squeeze Mosaic failure lived)."""
        key = (opts.newton_reltol, opts.newton_abstol, opts.res_rel,
               opts.res_tol, opts.max_newton, bool(interpret))
        cache = getattr(self, "_fn_cache", None)
        if cache is None:
            cache = self._fn_cache = {}
        fn = cache.get(key)
        if fn is not None:
            return fn
        n_xp = self.n_xp
        consts, dyn_layout, unpack = self._const_inputs()
        self._dyn_layout = dyn_layout
        if not hasattr(self, "_const_cache"):
            # device constants are created ONCE, outside any active trace —
            # jnp.asarray inside a traced while-body leaks that trace's
            # tracer into the cache (UnexpectedTracerError on the second
            # tran() with a different breakpoint count, round-4)
            with jax.ensure_compile_time_eval():
                self._const_cache = [jnp.asarray(c) for c in consts]
        kern = self.build_kernel(opts, unpack, len(consts),
                                 len(dyn_layout))

        @jax.jit
        def run(*args):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern,
                    in_specs=(
                        [pl.BlockSpec(memory_space=pltpu.VMEM)]
                        * (len(consts) + len(dyn_layout))
                        + [
                            pl.BlockSpec(memory_space=pltpu.VMEM),   # x0
                            pl.BlockSpec(memory_space=pltpu.VMEM),   # MT
                            pl.BlockSpec(memory_space=pltpu.VMEM),   # rinv
                            pl.BlockSpec(memory_space=pltpu.VMEM),   # s_off
                            pl.BlockSpec(memory_space=pltpu.SMEM),   # coefs
                            pl.BlockSpec(memory_space=pltpu.VMEM),   # v_anchor
                        ]),
                    out_specs=(
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                    ),
                    out_shape=(
                        jax.ShapeDtypeStruct((1, n_xp), jnp.float32),
                        jax.ShapeDtypeStruct((1, n_xp), jnp.float32),
                        jax.ShapeDtypeStruct((1, n_xp), jnp.float32),
                        jax.ShapeDtypeStruct((1, 2), jnp.int32),
                    ),
                    interpret=interpret,
                )(*args)

        cache[key] = run
        return run


def get_fused_plan(compiled, ctx, params=None):
    """Build (or fetch the cached) fused-chord plan; raises ValueError when
    the circuit/params are outside the kernel envelope."""
    cache = getattr(compiled, "_fused_plans", None)
    if cache is None:
        cache = compiled._fused_plans = {}
    key = (ctx.mode, float(ctx.temp), float(ctx.gmin), float(ctx.scale),
           float(ctx.sourcefac),
           id(compiled.params0) if params is None else id(params))
    hit = cache.get(key)
    if hit is None:
        plan = FusedChordPlan(compiled, ctx, params)
        # pin the params object: the key carries id(params), and a
        # collected dict would let an unrelated later params tree reuse the
        # same id — silently hitting a plan whose baked G_lin/C_lin came
        # from the OLD values
        cache[key] = (params, plan)
    else:
        plan = hit[1]
    return plan
