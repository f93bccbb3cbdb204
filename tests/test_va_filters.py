"""Analog filter / event operator tests: laplace_nd/zd/np/zp, absdelay,
transition, slew, idtmod — judged against closed-form answers.

Capability beyond the reference: VerilogAParser tokenizes these operators
(/root/reference/VerilogAParser.jl/src/parse/parse.jl) but CedarSim has no
runtime support for any of them; here each lowers to extra DAE state rows
(cedarsim_tpu/va/codegen.py) so DC/AC/transient all work unchanged.
"""

import numpy as np
import pytest

from cedarsim_tpu import (Circuit, VSource, VSourcePULSE, VSourceSIN,
                          Resistor, compile_circuit, solve_dc, tran, ac,
                          acdec)
from cedarsim_tpu.va.codegen import load_va, VACodegenError


def _filter_circuit(va_text, modname, vsrc_cls, vsrc_params, **devp):
    devs = load_va(va_text)
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(vsrc_cls, "V1", (vin, ckt.gnd), vsrc_params)
    ckt.add(devs[modname], "F1", (vin, vout), devp)
    return compile_circuit(ckt)


LP = """
module valp(inp, out);
  inout inp, out;
  electrical inp, out;
  parameter real tau = 1e-3;
  parameter real gain = 1.0;
  analog V(out) <+ laplace_nd(V(inp), {gain}, {1.0, tau});
endmodule
"""


def test_laplace_nd_lowpass_dc_ac_tran():
    tau = 1e-3
    c = _filter_circuit(LP, "valp", VSource, dict(dc=2.0, ac=1.0),
                        tau=tau, gain=0.5)
    # DC gain = num[0]/den[0]
    res = solve_dc(c)
    assert bool(res.converged)
    assert np.isclose(np.asarray(res.x)[c.node_names.index("vout")],
                      1.0, rtol=1e-9)
    # AC: H = g/(1 + jωτ)
    freqs = acdec(8, 1.0, 1e5)
    sol = ac(c, freqs)
    w = 2 * np.pi * freqs
    href = 0.5 / (1.0 + 1j * w * tau)
    assert np.allclose(sol["vout"], href, rtol=1e-8, atol=1e-12)


def test_laplace_nd_step_response():
    tau = 1e-4
    devs = load_va(LP)
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourcePULSE, "V1", (vin, ckt.gnd),
            dict(v1=0.0, v2=1.0, td=1e-5, tr=1e-9))
    ckt.add(devs["valp"], "F1", (vin, vout), dict(tau=tau, gain=1.0))
    c = compile_circuit(ckt)
    sol = tran(c, (0.0, 6e-4))
    assert bool(sol.converged)
    for t_rel in (0.5e-4, 1e-4, 3e-4):
        want = 1.0 - np.exp(-t_rel / tau)
        got = float(sol.interp("vout", 1e-5 + t_rel))
        assert abs(got - want) < 4e-3, (t_rel, got, want)


ZP = """
module vazp(inp, out);
  inout inp, out;
  electrical inp, out;
  parameter real a = 1000.0;
  parameter real b = 3000.0;
  analog V(out) <+ laplace_zp(V(inp), {}, {-a, b, -a, -b});
endmodule
"""


def test_laplace_zp_complex_pair_matches_analytic():
    a, b = 1000.0, 3000.0
    c = _filter_circuit(ZP, "vazp", VSource, dict(dc=0.0, ac=1.0),
                        a=a, b=b)
    freqs = acdec(8, 10.0, 1e5)
    sol = ac(c, freqs)
    w = 2 * np.pi * freqs
    # H = 1/((s+a-jb)(s+a+jb)) = 1/(s² + 2as + a² + b²)
    s = 1j * w
    href = 1.0 / (s ** 2 + 2 * a * s + a * a + b * b)
    assert np.allclose(sol["vout"], href, rtol=1e-8, atol=1e-15)


ZD = """
module vazd(inp, out);
  inout inp, out;
  electrical inp, out;
  analog V(out) <+ laplace_zd(V(inp), {-500.0, 0.0}, {1.0, 2e-3, 1e-6});
endmodule
"""


def test_laplace_zd_real_zero():
    c = _filter_circuit(ZD, "vazd", VSource, dict(dc=0.0, ac=1.0))
    freqs = acdec(8, 1.0, 1e4)
    sol = ac(c, freqs)
    s = 2j * np.pi * freqs
    href = (s + 500.0) / (1.0 + 2e-3 * s + 1e-6 * s ** 2)
    assert np.allclose(sol["vout"], href, rtol=1e-8)


NP = """
module vanp(inp, out);
  inout inp, out;
  electrical inp, out;
  analog V(out) <+ laplace_np(V(inp), {1.0}, {-1000.0, 0.0});
endmodule
"""


def test_laplace_np_single_pole():
    c = _filter_circuit(NP, "vanp", VSource, dict(dc=0.0, ac=1.0))
    freqs = acdec(6, 1.0, 1e4)
    sol = ac(c, freqs)
    s = 2j * np.pi * freqs
    assert np.allclose(sol["vout"], 1.0 / (s + 1000.0), rtol=1e-8)


DELAY = """
module vadel(inp, out);
  inout inp, out;
  electrical inp, out;
  parameter real td = 50e-6;
  analog V(out) <+ absdelay(V(inp), td);
endmodule
"""


def test_absdelay_sine():
    td, f = 50e-6, 1e3
    devs = load_va(DELAY)
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourceSIN, "V1", (vin, ckt.gnd),
            dict(vo=0.0, va=1.0, freq=f))
    ckt.add(devs["vadel"], "F1", (vin, vout), dict(td=td))
    c = compile_circuit(ckt)
    sol = tran(c, (0.0, 3e-3))
    assert bool(sol.converged)
    # after the Padé transient settles, out(t) = sin(2πf(t − td))
    for t in np.linspace(1.0e-3, 2.8e-3, 7):
        want = np.sin(2 * np.pi * f * (t - td))
        got = float(sol.interp("vout", t))
        assert abs(got - want) < 8e-3, (t, got, want)


def test_absdelay_ac_allpass_phase():
    c = _filter_circuit(DELAY, "vadel", VSource, dict(dc=0.0, ac=1.0),
                        td=50e-6)
    freqs = np.array([100.0, 1e3, 3e3])       # ω·td ≤ ~0.94 rad
    sol = ac(c, freqs)
    h = np.asarray(sol["vout"])
    assert np.allclose(np.abs(h), 1.0, rtol=1e-9)          # all-pass
    assert np.allclose(np.angle(h), -2 * np.pi * freqs * 50e-6, rtol=1e-4)


def test_absdelay_zero_is_identity():
    c = _filter_circuit(DELAY, "vadel", VSource, dict(dc=1.5, ac=1.0),
                        td=0.0)
    res = solve_dc(c)
    assert np.isclose(np.asarray(res.x)[c.node_names.index("vout")],
                      1.5, rtol=1e-12)


SLEW = """
module vaslew(inp, out);
  inout inp, out;
  electrical inp, out;
  parameter real rp = 1e4;
  parameter real rn = -2e4;
  analog V(out) <+ slew(V(inp), rp, rn);
endmodule
"""


def test_slew_rate_limits():
    devs = load_va(SLEW)
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    # 0→1 step at 10 µs, back down at 510 µs
    ckt.add(VSourcePULSE, "V1", (vin, ckt.gnd),
            dict(v1=0.0, v2=1.0, td=1e-5, tr=1e-9, tf=1e-9, pw=5e-4))
    ckt.add(devs["vaslew"], "F1", (vin, vout), dict(rp=1e4, rn=-2e4))
    c = compile_circuit(ckt)
    sol = tran(c, (0.0, 8e-4))
    assert bool(sol.converged)
    # rising: 1 V at 1e4 V/s → 100 µs ramp
    assert abs(float(sol.interp("vout", 1e-5 + 5e-5)) - 0.5) < 5e-3
    assert abs(float(sol.interp("vout", 1e-5 + 1.5e-4)) - 1.0) < 2e-3
    # falling: 1 V at 2e4 V/s → 50 µs ramp
    assert abs(float(sol.interp("vout", 5.1e-4 + 2.5e-5)) - 0.5) < 5e-3
    assert abs(float(sol.interp("vout", 5.1e-4 + 8e-5)) - 0.0) < 2e-3


TRANS = """
module vatrans(inp, out);
  inout inp, out;
  electrical inp, out;
  parameter real td = 0.0;
  parameter real tt = 10e-6;
  analog V(out) <+ transition(V(inp), td, tt);
endmodule
"""


def test_transition_edge_shaping():
    devs = load_va(TRANS)
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourcePULSE, "V1", (vin, ckt.gnd),
            dict(v1=0.0, v2=3.3, td=2e-5, tr=1e-9))
    ckt.add(devs["vatrans"], "F1", (vin, vout), dict(td=0.0, tt=1e-5))
    c = compile_circuit(ckt)
    sol = tran(c, (0.0, 1e-4))
    assert bool(sol.converged)
    # exponential edge: 63.2% at τ = tt/ln(100), 99% at tt
    tau = 1e-5 / np.log(100.0)
    got_tau = float(sol.interp("vout", 2e-5 + tau))
    assert abs(got_tau - 3.3 * (1 - np.exp(-1))) < 0.04
    got_tt = float(sol.interp("vout", 2e-5 + 1e-5))
    assert abs(got_tt - 3.3 * 0.99) < 0.02
    assert abs(float(sol.interp("vout", 9e-5)) - 3.3) < 1e-3


def test_transition_with_delay():
    devs = load_va(TRANS)
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    # slow 20 µs edge so the Padé delay block stays in-band
    ckt.add(VSourcePULSE, "V1", (vin, ckt.gnd),
            dict(v1=0.0, v2=1.0, td=2e-5, tr=2e-5))
    ckt.add(devs["vatrans"], "F1", (vin, vout), dict(td=3e-5, tt=5e-6))
    c = compile_circuit(ckt)
    sol = tran(c, (0.0, 2e-4))
    assert bool(sol.converged)
    assert abs(float(sol.interp("vout", 1.8e-4)) - 1.0) < 5e-3
    # 50% crossing shifts by roughly td (+ follower lag): input crosses
    # 0.5 at 30 µs, so output should cross near 60 µs
    ts = np.linspace(0.0, 1.5e-4, 301)
    ys = np.array([float(sol.interp("vout", t)) for t in ts])
    t50 = ts[np.searchsorted(ys > 0.5, True)]
    assert 5.2e-5 < t50 < 7.5e-5, t50


VCO = """
module vavco(inp, out);
  inout inp, out;
  electrical inp, out;
  parameter real fc = 1e3;
  analog V(out) <+ idtmod(fc * V(inp), 0.0, 1.0);
endmodule
"""


def test_idtmod_phase_wrap():
    devs = load_va(VCO)
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=1.0))
    ckt.add(devs["vavco"], "F1", (vin, vout), dict(fc=1e3))
    c = compile_circuit(ckt)
    res = solve_dc(c)          # phase pins to its ic at the op
    assert abs(float(np.asarray(res.x)[c.node_names.index("vout")])) < 1e-9
    sol = tran(c, (0.0, 2.5e-3))
    assert bool(sol.converged)
    for t, want in ((3e-4, 0.3), (1.25e-3, 0.25), (2.4e-3, 0.4)):
        got = float(sol.interp("vout", t))
        assert abs(got - want) < 3e-3, (t, got, want)


def test_zi_filters_now_supported():
    """zi_* used to be rejected; they now run over the latched-state
    channel (full behavioral coverage in tests/test_va_zi.py).  Keep a
    compile smoke here, plus the malformed-site rejection."""
    good = """
module vazi(inp, out);
  inout inp, out;
  electrical inp, out;
  analog V(out) <+ zi_nd(V(inp), {1.0}, {1.0}, 1e-6);
endmodule
"""
    devs = load_va(good)
    assert devs["vazi"].n_latch >= 2
    bad = """
module vazibad(inp, out);
  inout inp, out;
  electrical inp, out;
  analog V(out) <+ zi_zp(V(inp), {0.5, 0.0, 0.2, 0.0}, {0.1, 0.0}, 1e-6);
endmodule
"""
    with pytest.raises(VACodegenError, match="more zeros"):
        load_va(bad)


def test_improper_laplace_rejected():
    bad = """
module vabad(inp, out);
  inout inp, out;
  electrical inp, out;
  analog V(out) <+ laplace_nd(V(inp), {1.0, 1.0, 1.0}, {1.0, 1e-3});
endmodule
"""
    with pytest.raises(VACodegenError, match="improper"):
        load_va(bad)
