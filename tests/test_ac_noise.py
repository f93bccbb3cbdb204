"""AC / noise / sensitivity analytic golden tests.

Ported behaviors: AC magnitude/phase vs analytic transfer functions
(/root/reference/test/ac.jl:17-66, Butterworth /root/reference/test/
transients.jl:96-180), resistor thermal-noise PSD
(/root/reference/test/ac.jl:100-170), divider forward sensitivities
(/root/reference/test/sensitivity.jl:14-100)."""

import numpy as np

from cedarsim_tpu import (
    Circuit, Resistor, Capacitor, Inductor, VSource,
    compile_circuit, ac, acdec, noise,
)
from cedarsim_tpu.analysis.sensitivity import dc_sensitivity
from cedarsim_tpu.frontend.elaborate import load_spice

K = 1.380649e-23
T = 300.15  # 27C


def test_rc_lowpass_ac():
    r, c = 1e3, 1e-6
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=0.0, ac=1.0))
    ckt.add(Resistor, "R1", (vin, vout), dict(r=r))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=c))
    comp = compile_circuit(ckt)
    freqs = acdec(10, 1.0, 1e5)
    sol = ac(comp, freqs)
    h = sol["vout"]
    w = 2 * np.pi * freqs
    href = 1.0 / (1.0 + 1j * w * r * c)
    assert np.allclose(np.abs(h), np.abs(href), rtol=1e-8)
    assert np.allclose(np.angle(h), np.angle(href), rtol=1e-6, atol=1e-9)


def test_butterworth_ac():
    # 3rd-order Butterworth: L1=3/2, C2=4/3, L3=1/2, R4=1
    # |H(jω)| = 0.5/sqrt(1+ω^6) into the loaded divider (source->R4 gain 1/2
    # at DC)  (reference test/transients.jl:96-180, test/ac.jl)
    ckt = Circuit()
    vin = ckt.net("vin")
    n1 = ckt.net("n1")
    vout = ckt.net("vout")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=0.0, ac=1.0))
    ckt.add(Inductor, "L1", (vin, n1), dict(l=1.5))
    ckt.add(Capacitor, "C2", (n1, ckt.gnd), dict(c=4.0 / 3.0))
    ckt.add(Inductor, "L3", (n1, vout), dict(l=0.5))
    ckt.add(Resistor, "R4", (vout, ckt.gnd), dict(r=1.0))
    comp = compile_circuit(ckt)
    w = np.logspace(-2, 1, 40)           # rad/s
    freqs = w / (2 * np.pi)
    sol = ac(comp, freqs)
    h = sol["vout"]
    gref = 1.0 / np.sqrt(1.0 + w ** 6)
    assert np.allclose(np.abs(h), gref, rtol=1e-8)
    # directly-observed source (reference: freqresp of node_vin == 1)
    assert np.allclose(sol["vin"], 1.0, rtol=1e-12)
    # device-voltage observable: V(L3) = jwL3 * I = jwL3 * H (R4=1)
    # (reference test/ac.jl:62-66, obs vs G = s*L3*H)
    hjw = 1.0 / ((1j * w + 1) * ((1j * w) ** 2 + 1j * w + 1))
    vl3 = sol["L3.V"]
    assert np.allclose(vl3, 1j * w * 0.5 * hjw, rtol=1e-8)


def test_resistor_noise_psd():
    # divider: output noise PSD = 4kT·(R1 || R2), flat
    r1, r2 = 1e3, 3e3
    code = f"""* noise divider
V1 vin 0 0
R1 vin vout {r1}
R2 vout 0 {r2}
.op
"""
    comp = compile_circuit(load_spice(code))
    freqs = np.array([1.0, 1e3, 1e6])
    ns = noise(comp, "vout", freqs)
    rpar = r1 * r2 / (r1 + r2)
    ref = 4 * K * T * rpar
    assert np.allclose(ns.psd, ref, rtol=1e-6)
    # per-source split: R1 contributes 4kT/R1·|Zout|², same for R2 → both
    # equal 4kT·rpar²/Ri
    assert np.allclose(ns.per_source[:, 0], 4 * K * T * rpar ** 2 / r1,
                       rtol=1e-6)


def test_rc_noise_rolloff():
    # kT/C total: PSD(f) = 4kTR/(1+(2πfRC)²)
    r, c = 1e3, 1e-9
    ckt = Circuit()
    vout = ckt.net("vout")
    ckt.add(Resistor, "R1", (vout, ckt.gnd), dict(r=r))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=c))
    comp = compile_circuit(ckt)
    freqs = acdec(5, 1e3, 1e8)
    ns = noise(comp, "vout", freqs)
    ref = 4 * K * T * r / (1 + (2 * np.pi * freqs * r * c) ** 2)
    assert np.allclose(ns.psd, ref, rtol=1e-6)


def test_divider_sensitivity():
    # vmid = V·R2/(R1+R2); dvmid/dR1 = -V·R2/(R1+R2)², dvmid/dR2 = +V·R1/(R1+R2)²
    code = """* divider
V1 vin 0 2
R1 vin vmid 1k
R2 vmid 0 1k
.op
"""
    comp = compile_circuit(load_spice(code))
    val, g = dc_sensitivity(comp, "vmid", ["r1.r", "r2.r"])
    v, r1, r2 = 2.0, 1e3, 1e3
    assert np.isclose(float(val), 1.0, rtol=1e-9)
    assert np.isclose(float(g["r1.r"]), -v * r2 / (r1 + r2) ** 2, rtol=1e-6)
    assert np.isclose(float(g["r2.r"]), v * r1 / (r1 + r2) ** 2, rtol=1e-6)


def test_tran_sensitivity():
    # d v_out(1ms)/dR of an RC step — fwd-mode AD through the whole
    # adaptive integrator vs the analytic derivative
    from cedarsim_tpu.analysis.sensitivity import tran_sensitivity
    code = """* rc
V1 vin 0 1
R1 vin vout 1k
C1 vout 0 1u
.ic v(vout)=0
.tran 1u 3m
"""
    comp = compile_circuit(load_spice(code))
    v, dv = tran_sensitivity(comp, "vout", "r1.r", (0.0, 3e-3), 1e-3)
    t, r, c = 1e-3, 1000.0, 1e-6
    ref_v = 1 - np.exp(-t / (r * c))
    ref_dv = -np.exp(-t / (r * c)) * t / (r * r * c)
    assert np.isclose(float(v), ref_v, rtol=1e-3)
    assert np.isclose(float(dv), ref_dv, rtol=5e-3)


def test_split_axes():
    from cedarsim_tpu import Sweep, ProductSweep
    from cedarsim_tpu.analysis.sweeps import split_axes
    sw = ProductSweep(Sweep("temp", [0, 25, 85]), Sweep("r1.r", [1, 2]),
                      Sweep("v1.dc", [1, 2, 3]))
    outer, inner = split_axes(sw, ["temp"])
    assert outer.names == ["temp"] and len(outer) == 3
    assert set(inner.names) == {"r1.r", "v1.dc"} and len(inner) == 6


def test_rlc_noise_vs_ngspice_golden():
    # Cross-simulator golden: ngspice output table ported as data
    # (/root/reference/test/ac.jl:64-146). Butterworth RLC, R4 split into
    # two 2-ohm resistors, temp=23C.
    from tests.data_rlc_noise_ngspice import NGSPICE_RLC_NOISE
    from cedarsim_tpu import SimSpec
    code = """* third order butterworth lowpass
V1 vin 0 AC 1 SIN (0, 1, 0.159154943)
L1 vin n1 1.5
C2 n1 0 1.333333333333333333
L3 n1 vout 0.5
R4 vout 0 2
R5 vout 0 2
"""
    comp = compile_circuit(load_spice(code))
    freqs = np.array([r[0] for r in NGSPICE_RLC_NOISE])
    ref = np.array([r[1] for r in NGSPICE_RLC_NOISE])
    ctx = SimSpec.make(temp_c=23.0, gmin=1e-15)
    ns = noise(comp, "vout", freqs, ctx=ctx)
    got = np.sqrt(np.abs(ns.psd))
    assert np.allclose(got, ref, rtol=2e-6)


def test_tf_analysis():
    # .TF equivalent: divider gain = 0.5, rout = R1||R2
    from cedarsim_tpu.analysis.sensitivity import tf
    code = """* divider
V1 vin 0 2
R1 vin vmid 1k
R2 vmid 0 1k
.op
"""
    comp = compile_circuit(load_spice(code))
    r = tf(comp, "vmid", "v1")
    assert np.isclose(float(r["gain"]), 0.5, rtol=1e-9)
    assert np.isclose(float(r["rout"]), 500.0, rtol=1e-6)


def test_noise_total_ktc_and_input_referred():
    """Integrated output noise of an RC lowpass equals sqrt(kT/C)
    (equipartition — the classic closed form), and the input-referred
    spectrum is the flat 4kTR of the series resistor (ngspice
    onoise_total / inoise_spectrum roles)."""
    import numpy as np
    from cedarsim_tpu import (Circuit, Resistor, Capacitor, VSource,
                              compile_circuit, noise, acdec)
    from cedarsim_tpu import config as cfg
    R, C = 10e3, 1e-9
    ckt = Circuit()
    vin, out = ckt.net("vin"), ckt.net("out")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=0.0, ac=1.0))
    ckt.add(Resistor, "R1", (vin, out), dict(r=R))
    ckt.add(Capacitor, "C1", (out, ckt.gnd), dict(c=C))
    comp = compile_circuit(ckt)
    f = acdec(48, 1.0, 1e9)        # f3dB ~ 15.9 kHz, wide coverage
    n = noise(comp, "out", f)
    kT = cfg.K_BOLTZMANN * (27.0 + 273.15)
    assert abs(n.total() - np.sqrt(kT / C)) / np.sqrt(kT / C) < 2e-3
    # input-referred: flat 4kTR at every frequency (the R's noise source
    # sees exactly the drive's transfer function)
    ino = n.inoise()
    assert np.allclose(ino, 4 * kT * R, rtol=1e-6)
    # band-limited integral matches the analytic arctan fraction
    f1, f2 = 1e3, 1e5
    f3db = 1.0 / (2 * np.pi * R * C)
    want = np.sqrt(kT / C * (2 / np.pi)
                   * (np.arctan(f2 / f3db) - np.arctan(f1 / f3db)))
    assert abs(n.total(f1, f2) - want) / want < 5e-3
