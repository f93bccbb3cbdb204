"""Fused chord-Newton Pallas kernel (ops/fused_chord.py) — CPU-side gates.

The kernel itself targets Mosaic/TPU; on the CPU test platform it runs in
pallas interpret mode, which executes the identical jaxpr — so these tests
gate the plan construction (linear/nonlinear split), the residual
convention (must match newton_mod's cap form), and the end-to-end physics
of a transient driven through ``TranOptions(newton_impl="fused")``.
On-chip legalization/performance is gated by the bench harness
(benchmarks/single_stream.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cedarsim_tpu import SimSpec, TranOptions, parse_spice, elaborate, tran
from cedarsim_tpu.core.compile import compile_circuit
from cedarsim_tpu.ops.fused_chord import FusedChordPlan, get_fused_plan

INV_RC = """* mos inverter driving an RC, plus PWL supply ripple path
.model n1 nmos (level=1 vto=0.7 kp=100u cgso=1n cgdo=1n)
.model p1 pmos (level=1 vto=-0.7 kp=40u cgso=1n cgdo=1n)
vdd vdd 0 3.3
vin in 0 PULSE(0 3.3 2n 0.2n 0.2n 4n 10n)
mp out in vdd vdd p1 w=2u l=0.35u
mn out in 0 0 n1 w=1u l=0.35u
r1 out mid 1k
cl mid 0 10f
.tran 0.1n 20n
"""


@pytest.fixture(scope="module")
def comp():
    nl = parse_spice(INV_RC, file="inv_rc.cir")
    return compile_circuit(elaborate(nl))


def test_linear_split_exact(comp):
    """G_lin·x + s_off(t) + S_nl must reproduce compiled.residuals exactly
    (the kernel's out-of-kernel linear fold must not change the physics)."""
    ctx = SimSpec.make().with_mode("tran")
    plan = FusedChordPlan(comp, ctx)
    # MOS is the only nonlinear group; sources/caps/R fold to constants
    assert [g.key for g in plan.nl] == ["Mos1"]
    rng = np.random.default_rng(7)
    for t in (0.0, 2.1e-9, 7.7e-9):
        x = rng.normal(size=comp.n_x) * 1.5
        S_full, Q_full = comp.residuals(jnp.asarray(x), ctx.at_time(t))
        S_nl, Q_nl = plan._sub_res(plan.nl_keys, comp.params0, ctx, x, t)
        S_lin = plan.G_lin @ x + np.asarray(plan.s_off(t, ctx))
        Q_lin = plan.C_lin @ x + plan.q_off
        np.testing.assert_allclose(S_lin + np.asarray(S_nl),
                                   np.asarray(S_full), rtol=0, atol=1e-9)
        np.testing.assert_allclose(Q_lin + np.asarray(Q_nl),
                                   np.asarray(Q_full), rtol=0, atol=1e-18)


def test_plan_envelope_gates(comp):
    """Traced params must be rejected (the kernel bakes param values)."""
    ctx = SimSpec.make().with_mode("tran")
    with pytest.raises(Exception):
        jax.jit(lambda p: FusedChordPlan(comp, ctx, p) and 0)(comp.params0)


def test_fused_transient_matches_xla(comp):
    """Full adaptive transient through the public tran() path: the fused
    engine must reproduce the XLA chord engine's waveform (same corrector,
    different iteration engine — physics identical within mixed-precision
    tolerances)."""
    ctx = SimSpec.make()
    base = dict(max_steps=8192, jac_reuse=1, formulation="cap",
                newton_reltol=1e-4, newton_abstol=5e-7, res_tol=1e-3,
                jac_shunt=1e-7, res_rel=3e-5, rtol=1e-2, atol=1e-4)
    tspan = (0.0, 2e-8)
    ref = tran(comp, tspan, ctx=ctx, opts=TranOptions(**base))
    fused = tran(comp, tspan, ctx=ctx,
                 opts=TranOptions(**base, newton_impl="fused"))
    assert ref.converged and fused.converged
    for t in np.linspace(1e-9, 1.9e-8, 12):
        vr = float(ref.interp("out", t))
        vf = float(fused.interp("out", t))
        # mixed-precision engines on an adaptive grid: the bound is the
        # LTE tolerance, not roundoff
        assert abs(vr - vf) < 5e-3, (t, vr, vf)


def test_fused_two_spans_no_tracer_leak(comp):
    """Two tran() calls with different breakpoint counts retrace tran_core;
    the plan's device-constant cache must not capture the first trace's
    tracers (round-4 regression: UnexpectedTracerError on the second
    call when _const_cache was created inside the while-body trace)."""
    ctx = SimSpec.make()
    opts = TranOptions(max_steps=4096, jac_reuse=1, formulation="cap",
                       newton_reltol=1e-4, newton_abstol=5e-7, res_tol=1e-3,
                       jac_shunt=1e-7, res_rel=3e-5, rtol=1e-2, atol=1e-4,
                       newton_impl="fused")
    s1 = tran(comp, (0.0, 5e-9), ctx=ctx, opts=opts)
    s2 = tran(comp, (0.0, 1.2e-8), ctx=ctx, opts=opts)
    assert s1.converged and s2.converged


VA_DIODE = """
module fdiode(a, c);
  inout a, c;
  electrical a, c;
  parameter real is_ = 1e-14 from (0:1];
  parameter real n = 1.0;
  real id, vd;
  analog begin
    vd = V(a, c);
    if (vd > -5.0 * n * $vt)
      id = is_ * (limexp(vd / (n * $vt)) - 1.0);
    else
      id = -is_;
    I(a, c) <+ id;
    // noise site: the fused plan feeds eps as a per-site LIST of tiles;
    // interpreter probes like eps.shape must handle both forms (bsim4
    // has noise sources, the first VA test model did not — round-4)
    I(a, c) <+ white_noise(2.0 * 1.602176634e-19 * abs(id), "shot");
  end
endmodule
"""


def test_fused_plan_va_group():
    """VA-interpreted devices must survive the plan's jitted linearity
    probe: the traced (x, t) arguments make every VA binop non-concrete,
    which used to crash on `self.lv.dtype` when lv is the fused path's
    per-lvar tile list (round-4 regression, caught by the bsim4 bench
    leg: AttributeError 'list' object has no attribute 'dtype')."""
    from cedarsim_tpu import Circuit, Resistor, Capacitor, VSourcePULSE
    from cedarsim_tpu.va.codegen import load_va
    devs = load_va(VA_DIODE)
    ckt = Circuit()
    a, b = ckt.net("a"), ckt.net("b")
    ckt.add(VSourcePULSE, "V1", (a, ckt.gnd),
            dict(v1=0.0, v2=3.0, td=1e-9, tr=1e-10, tf=1e-10, pw=5e-9,
                 per=20e-9))
    ckt.add(Resistor, "R1", (a, b), dict(r=1000.0))
    ckt.add(devs["fdiode"], "D1", (b, ckt.gnd), dict(is_=1e-14))
    ckt.add(Capacitor, "C1", (b, ckt.gnd), dict(c=1e-12))
    comp2 = compile_circuit(ckt)
    plan = FusedChordPlan(comp2, SimSpec.make().with_mode("tran"))
    assert [g.key for g in plan.nl] == ["VA_fdiode"]
    opts = TranOptions(max_steps=4096, jac_reuse=1, formulation="cap",
                       newton_reltol=1e-4, newton_abstol=5e-7, res_tol=1e-3,
                       jac_shunt=1e-7, res_rel=3e-5, rtol=1e-2, atol=1e-4,
                       newton_impl="fused")
    sol = tran(comp2, (0.0, 1e-8), ctx=SimSpec.make(), opts=opts)
    assert sol.converged
    # diode clamps the pulse top to ~0.6-0.8 V
    vb = float(sol.interp("b", 4e-9))
    assert 0.45 < vb < 0.9, vb


def test_fused_batched_vmap(comp):
    """jax.vmap over tran_core with newton_impl='fused' must dispatch the
    natively-batched kernel (the custom_vmap rule: batch on the sublane
    axis, per-lane done masks) — NOT pallas' default rule (B sequential
    grid instances).  Gate: per-lane waveforms match the vmapped XLA chord
    engine with per-lane W scatter on the nonlinear group (the dynamic-
    params half of the envelope)."""
    from cedarsim_tpu.analysis.tran import (tran_core, _consistent_xdot,
                                            _differential_mask,
                                            blank_checkpoint)
    from cedarsim_tpu.analysis.dc import solve_dc
    nb = 4
    ctx = SimSpec.make()
    ctx_op = ctx.with_mode("tranop")
    base = dict(max_steps=8192, jac_reuse=1, formulation="cap",
                newton_reltol=1e-4, newton_abstol=5e-7, res_tol=1e-3,
                jac_shunt=1e-7, res_rel=3e-5, rtol=1e-2, atol=1e-4)
    tstop = 2e-8
    bps = jnp.asarray(comp.breakpoints(tstop), comp.dtype)
    pb = jax.tree.map(lambda a: jnp.repeat(jnp.asarray(a)[None], nb, 0),
                      comp.params0)
    sc = jnp.asarray([0.93, 1.0, 1.04, 1.09])
    pb = dict(pb)
    pb["Mos1"] = dict(pb["Mos1"])
    pb["Mos1"]["w"] = pb["Mos1"]["w"] * sc[:, None]
    op = solve_dc(comp, ctx=ctx, mode="tranop")
    assert bool(np.asarray(op.converged))
    x0b = jnp.repeat(op.x[None], nb, 0)
    xdb = jax.jit(jax.vmap(
        lambda x, p: _consistent_xdot(comp, x, ctx_op, p)))(x0b, pb)
    mask = _differential_mask(comp, op.x, ctx_op, comp.params0)
    d = comp.dtype
    ist = blank_checkpoint(x0b, xdb, 7e-13)

    def run(opts):
        fb = jax.jit(jax.vmap(
            lambda p, x, xd, st: tran_core(
                comp, p, ctx, x, xd, jnp.asarray(0.0, d),
                jnp.asarray(tstop, d), bps, jnp.asarray(7e-13, d), opts,
                mask, init_state=st),
            in_axes=(0, 0, 0, 0)))
        rb = fb(pb, x0b, xdb, ist)
        ts, xs, fin = np.asarray(rb[0]), np.asarray(rb[1]), np.asarray(rb[4])
        assert fin.all(), "unfinished lanes"
        return ts, xs

    tsf, xsf = run(TranOptions(**base, newton_impl="fused"))
    tsx, xsx = run(TranOptions(**base))
    io = comp.node_names.index("out")
    worst_rail = 0.0
    worst_edge = 0.0
    for lane in range(nb):
        for t in np.linspace(1e-9, 1.9e-8, 10):   # settled-rail samples
            vf = np.interp(t, tsf[lane], xsf[lane, :, io])
            vx = np.interp(t, tsx[lane], xsx[lane, :, io])
            worst_rail = max(worst_rail, abs(vf - vx))
        for t in (2.15e-9, 2.35e-9, 6.3e-9):      # mid-edge samples
            vf = np.interp(t, tsf[lane], xsf[lane, :, io])
            vx = np.interp(t, tsx[lane], xsx[lane, :, io])
            # adaptive grids differ between engines; mid-edge interp
            # error is slope-limited, not solver-limited
            worst_edge = max(worst_edge, abs(vf - vx))
    assert worst_rail < 5e-3, worst_rail
    assert worst_edge < 8e-2, worst_edge
    # the W scatter must reach the kernel: mid-edge, stronger lanes pull
    # the falling output lower, strictly ordered across the 4 lanes
    mids = [float(np.interp(2.15e-9, tsf[k], xsf[k, :, io]))
            for k in range(nb)]
    assert all(mids[k] > mids[k + 1] + 0.01 for k in range(nb - 1)), mids
    # the natively-BATCHED kernel must have been built (custom_vmap rule
    # fired with axis_size=nb — not pallas' sequential-grid default)
    plan = get_fused_plan(comp, ctx)
    assert any(len(k) == 7 and k[0] != "vmapaware" and k[-1] == nb
               for k in plan._fn_cache), list(plan._fn_cache)


def test_fused_plan_cache(comp):
    ctx = SimSpec.make().with_mode("tran")
    p1 = get_fused_plan(comp, ctx)
    p2 = get_fused_plan(comp, ctx)
    assert p1 is p2
    p3 = get_fused_plan(comp, ctx.replace(gmin=1e-13))
    assert p3 is not p1
