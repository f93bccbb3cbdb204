"""VA z-domain filters zi_nd/np/zd/zp (LRM 4.5.15) — sampled IIR over the
integrator's latched-state channel, with the sample clock scheduled as
breakpoints so accepted steps land exactly on t0 + n·T.  The reference
simulator has no zi_* runtime at all (VerilogAParser tokenizes them only).
Gates are hand-computed difference-equation responses."""

import numpy as np

from cedarsim_tpu import (Circuit, Resistor, VSource, VSourcePULSE,
                          compile_circuit, solve_dc, tran, TranOptions)
from cedarsim_tpu.va.codegen import load_va

T = 1e-6


def _ckt(va_text, modname, vsrc_params, pulse=True, **devp):
    devs = load_va(va_text)
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourcePULSE if pulse else VSource, "V1", (vin, ckt.gnd),
            vsrc_params)
    ckt.add(devs[modname], "F1", (vin, vout), devp)
    ckt.add(Resistor, "RL", (vout, ckt.gnd), dict(r=1e6))
    return compile_circuit(ckt)


FIR = f"""
module vafir(inp, out);
  inout inp, out;
  electrical inp, out;
  analog V(out) <+ zi_nd(V(inp), {{0.5, 0.5}}, {{1.0}}, {T});
endmodule
"""

IIR = f"""
module vaiir(inp, out);
  inout inp, out;
  electrical inp, out;
  parameter real c = 0.5;
  analog V(out) <+ zi_nd(V(inp), {{1.0 - c}}, {{1.0, -c}}, {T});
endmodule
"""

ZP = f"""
module vazp(inp, out);
  inout inp, out;
  electrical inp, out;
  analog V(out) <+ zi_zp(V(inp), {{}}, {{0.5, 0.0}}, {T});
endmodule
"""


def test_zi_fir_moving_average_on_ramp():
    """y_n = (u_n + u_{n-1})/2 sampled on nT, zero-order hold between
    samples.  Ramp input u(t) = t/T volts: y_n = n - 0.5."""
    c = _ckt(FIR, "vafir",
             dict(v1=0.0, v2=10.0, td=0.0, tr=10 * T, pw=1e-3, per=2e-3))
    sol = tran(c, (0.0, 6.2 * T),
               opts=TranOptions(rtol=1e-5, atol=1e-8, max_steps=16384))
    assert bool(sol.converged)
    # between samples the hold keeps y_n = (u(nT) + u((n-1)T))/2 = n - 0.5
    for n in (2, 3, 5):
        got = float(sol.interp("vout", (n + 0.5) * T))
        assert abs(got - (n - 0.5)) < 1e-6, (n, got)


def test_zi_iir_lowpass_step():
    """y_n = (1-c)·u_n + c·y_{n-1}: unit-step input (edge between sample 0
    and 1) gives y after m firings = A·(1 - c^m)."""
    A, cpar = 2.0, 0.5
    c = _ckt(IIR, "vaiir",
             dict(v1=0.0, v2=A, td=0.5 * T, tr=1e-9, pw=1e-3, per=2e-3),
             c=cpar)
    sol = tran(c, (0.0, 8.2 * T),
               opts=TranOptions(rtol=1e-5, atol=1e-8, max_steps=16384))
    assert bool(sol.converged)
    for m in (1, 2, 3, 6):
        # m firings have seen the step at samples T..mT; read mid-hold
        got = float(sol.interp("vout", (m + 0.5) * T))
        want = A * (1.0 - cpar ** m)
        assert abs(got - want) < 1e-6, (m, got, want)


def test_zi_dc_is_steady_gain():
    """DC operating point: y = H(z=1)·u = u·(1-c)/(1-c) = u."""
    c = _ckt(IIR, "vaiir", dict(dc=1.5), pulse=False, c=0.5)
    r = solve_dc(c)
    assert bool(r.converged)
    assert abs(float(np.asarray(r.x)[c.node_names.index("vout")])
               - 1.5) < 1e-9


def test_zi_zp_single_pole():
    """zi_zp with pole 0.5, no zeros: H(z) = 1/(z - 0.5) ->
    y_n = u_{n-1} + 0.5·y_{n-1}; steady gain H(1) = 2."""
    A = 1.0
    c = _ckt(ZP, "vazp",
             dict(v1=0.0, v2=A, td=0.5 * T, tr=1e-9, pw=1e-3, per=2e-3))
    sol = tran(c, (0.0, 14.2 * T),
               opts=TranOptions(rtol=1e-5, atol=1e-8, max_steps=32768))
    assert bool(sol.converged)
    # recurrence by hand: u seen from sample 1 on; y_1 = u_0 = 0,
    # y_2 = u_1 + y_1/2 = 1, y_3 = 1.5, ... y_m = 2(1 - 2^{-(m-1)})
    for m in (2, 3, 5):
        got = float(sol.interp("vout", (m + 0.5) * T))
        want = 2.0 * (1.0 - 2.0 ** -(m - 1))
        assert abs(got - want) < 1e-6, (m, got, want)
    assert abs(float(sol.interp("vout", 14 * T + 0.5 * T)) - 2.0) < 1e-3


def test_zi_breakpoints_scheduled():
    devs = load_va(IIR)
    dev = devs["vaiir"]
    p = dev.prepare(dict(c=0.5))
    bps = dev.breakpoints(p, 10.5 * T)
    assert len(bps) == 10
    assert abs(bps[0] - T) < 1e-18


def test_zi_ac_matches_z_transfer():
    """AC small-signal of a zi_* site is the z-domain response at
    z = e^{jωT} (analysis/ac._delay_ac: coefficients extracted
    numerically from the latch-update Jacobians).  FIR
    H = 0.5(1 + z⁻¹) and IIR H = (1−c)/(1 − c·z⁻¹) vs closed form.
    Round 4 raised on this path."""
    from cedarsim_tpu import ac

    freqs = np.array([1e3, 5e4, 2e5, 4.3e5])
    z = np.exp(2j * np.pi * freqs * T)

    c = _ckt(FIR, "vafir", dict(dc=1.0, ac=1.0), pulse=False)
    h = ac(c, freqs)["vout"]
    want = 0.5 * (1.0 + 1.0 / z)
    assert np.allclose(h, want, atol=1e-9), (h, want)

    cc = 0.5
    c2 = _ckt(IIR, "vaiir", dict(dc=1.0, ac=1.0), pulse=False, c=cc)
    h2 = ac(c2, freqs)["vout"]
    want2 = (1.0 - cc) / (1.0 - cc / z)
    assert np.allclose(h2, want2, atol=1e-9), (h2, want2)
