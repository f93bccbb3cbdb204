"""Harmonic balance vs closed forms, vs brute-force transients, and the
autonomous-oscillator mode vs describing-function theory."""

import numpy as np

from cedarsim_tpu import (Circuit, Resistor, Capacitor, Diode, VSourceSIN,
                          compile_circuit, tran, TranOptions, SimSpec,
                          load_spice)
from cedarsim_tpu.analysis.hb import hb, hb_autonomous


def test_hb_linear_rc_exact():
    """Sine-driven RC: the orbit is a pure fundamental, which the
    collocation basis represents exactly — HB must hit the phasor answer
    to solver precision even from a flat DC start."""
    f0, R, C = 1e6, 1e3, 1e-9
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourceSIN, "V1", (vin, ckt.gnd), dict(vo=0.0, va=1.0, freq=f0))
    ckt.add(Resistor, "R1", (vin, vout), dict(r=R))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=C))
    comp = compile_circuit(ckt)
    T = 1.0 / f0
    res = hb(comp, T, ctx=SimSpec.make(gmin=1e-15), n_harmonics=3,
             init="dc", tol=1e-12)
    assert res.converged, (res.iters, res.resnorm)

    w = 2 * np.pi * f0
    H = 1.0 / (1.0 + 1j * w * R * C)
    tgrid = np.linspace(0.0, T, 24, endpoint=False)
    exact = np.abs(H) * np.sin(w * tgrid + np.angle(H))
    err = np.abs(res.interp("vout", tgrid) - exact).max()
    assert err < 1e-8, err
    # spectrum: v = |H| sin(wt+phi) -> X1 = |H| e^{i phi} / (2i)
    X = res.spectrum("vout")
    assert abs(X[0]) < 1e-9
    assert abs(2 * np.abs(X[1]) - np.abs(H)) < 1e-8


def test_hb_rectifier_matches_settled_transient():
    """Diode peak rectifier (load tau = 100 periods): HB's Newton lands on
    the orbit a brute-force transient needs hundreds of periods to reach."""
    f0 = 1e6
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourceSIN, "V1", (vin, ckt.gnd), dict(vo=0.0, va=2.0, freq=f0))
    ckt.add(Diode, "D1", (vin, vout), {"is": 1e-14, "n": 1.0})
    ckt.add(Resistor, "RL", (vout, ckt.gnd), dict(r=100e3))
    ckt.add(Capacitor, "CL", (vout, ckt.gnd), dict(c=1e-9))
    comp = compile_circuit(ckt)
    T = 1.0 / f0
    res = hb(comp, T, ctx=SimSpec.make(gmin=1e-12), n_harmonics=25,
             warmup_periods=3, tol=1e-9)
    assert res.converged, (res.iters, res.resnorm)

    sol = tran(comp, (0.0, 400 * T), ctx=SimSpec.make(gmin=1e-12),
               opts=TranOptions(max_steps=16384,
                                hmax_frac=(1.0 / 20) / 400))
    assert sol.converged
    for frac in (0.1, 0.35, 0.6, 0.85):
        v_hb = float(res.interp("vout", frac * T))
        v_bf = float(sol.interp("vout", (399 + frac) * T))
        assert abs(v_hb - v_bf) < 0.02, (frac, v_hb, v_bf)
    assert 1.0 < float(res.interp("vout", 0.5 * T)) < 1.6


def test_hb_autonomous_van_der_pol():
    """LC tank + behavioral cubic negative conductance (van der Pol).
    Describing-function/averaging theory for i = -a·v + b·v³ across an LC
    tank: fundamental balance gives amplitude A = sqrt(4a/3b) and the
    frequency stays within O(eps²) of 1/(2π sqrt(LC)) for weak
    nonlinearity.  HB solves amplitude AND frequency as Newton unknowns."""
    L, C = 1e-3, 1e-9
    a = 2e-4                      # eps = a*sqrt(L/C) = 0.2 (weakly nonlinear)
    b = a / 3.0                   # -> A = 2.0 exactly
    ckt = load_spice(f"""vdp oscillator
L1 out 0 {L}
C1 out 0 {C}
B1 out 0 I='{-a}*V(out) + {b}*V(out)^3'
.end
""")
    comp = compile_circuit(ckt)
    f0 = 1.0 / (2 * np.pi * np.sqrt(L * C))
    res = hb_autonomous(comp, 1.0 / f0, anchor="out", n_harmonics=9,
                        kick=0.5, warmup_periods=30.0, tol=1e-10)
    assert res.converged, (res.iters, res.resnorm)
    A = 2.0 * abs(res.spectrum("out")[1])
    assert abs(A - 2.0) < 0.02, A                 # describing function
    assert abs(res.freq - f0) / f0 < 5e-3, (res.freq, f0)
    # harmonic content: odd nonlinearity -> even harmonics absent
    X = res.spectrum("out")
    assert abs(X[2]) < 1e-3 * abs(X[1])
    # third harmonic present but small (weak nonlinearity)
    assert 1e-4 < abs(X[3]) / abs(X[1]) < 0.1


def test_hb_autonomous_ring_oscillator_lv1():
    """3-stage CMOS (level-1) ring oscillator: HB computes the oscillation
    frequency as a Newton unknown; gate it against the warm transient's
    measured crossings and rail bounds."""
    vdd = 3.3
    ckt = load_spice(f"""ring3
.param wp=20u wn=10u
VDD vdd 0 {vdd}
M1p n2 n1 vdd vdd pmos W='wp' L=1u
M1n n2 n1 0   0   nmos W='wn' L=1u
M2p n3 n2 vdd vdd pmos W='wp' L=1u
M2n n3 n2 0   0   nmos W='wn' L=1u
M3p n1 n3 vdd vdd pmos W='wp' L=1u
M3n n1 n3 0   0   nmos W='wn' L=1u
C1 n1 0 0.5p
C2 n2 0 0.5p
C3 n3 0 0.5p
.model nmos nmos level=1 vto=0.7 kp=100u gamma=0.4 lambda=0.05 cgso=1n cgdo=1n
.model pmos pmos level=1 vto=-0.8 kp=40u gamma=0.5 lambda=0.05 cgso=1n cgdo=1n
.end
""")
    comp = compile_circuit(ckt)
    T_guess = 6e-9
    res = hb_autonomous(comp, T_guess, anchor="n1", n_harmonics=13,
                        kick=0.3 * vdd, warmup_periods=20.0, tol=1e-8)
    assert res.converged, (res.iters, res.resnorm)

    # reference period from a settled KICKED transient's own crossings
    # (starting exactly at the metastable operating point, the integrator
    # sits in the slow startup-growth regime for a long time — the same
    # reason hb_autonomous has the kick parameter)
    from cedarsim_tpu.analysis.dc import solve_dc
    from cedarsim_tpu.core.context import Modes
    op = solve_dc(comp, comp.params0, None, mode=Modes.TRANOP)
    x0 = np.asarray(op.x).copy()
    x0[comp.circuit._nets["n1"].index] += 0.3 * vdd
    sol = tran(comp, (0.0, 30 * T_guess), x0=x0,
               opts=TranOptions(max_steps=16384))
    ts = np.linspace(20 * T_guess, 30 * T_guess, 4096)
    y = np.interp(ts, sol.ts, sol["n1"])
    mid = 0.5 * (y.max() + y.min())
    up = np.where((y[:-1] < mid) & (y[1:] >= mid))[0]
    tc = ts[up] + (mid - y[up]) / (y[up + 1] - y[up]) * (ts[1] - ts[0])
    T_meas = float(np.mean(np.diff(tc)))
    assert abs(res.period - T_meas) / T_meas < 0.02, (res.period, T_meas)
    # waveform plausibility: swings most of the rail, stays inside it
    v = res.samples("n1")
    assert v.min() > -0.1 and v.max() < vdd + 0.1
    assert v.max() - v.min() > 0.6 * vdd


def test_pac_lti_equals_ac():
    """On a time-invariant circuit the periodic-AC harmonic transfer matrix
    collapses: k=0 equals classic AC, all conversion sidebands vanish."""
    from cedarsim_tpu import VSource, ac
    from cedarsim_tpu.analysis.hb import pac
    R, C = 1e3, 1e-9
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=0.0, ac=1.0))
    ckt.add(Resistor, "R1", (vin, vout), dict(r=R))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=C))
    comp = compile_circuit(ckt)
    T = 1e-6
    res = hb(comp, T, ctx=SimSpec.make(gmin=1e-15), n_harmonics=2,
             init="dc", tol=1e-12)
    assert res.converged
    freqs = np.array([1e4, 1.59e5, 1e6, 1e7])
    p = pac(res, freqs)
    a = ac(comp, freqs, ctx=SimSpec.make(gmin=1e-15))
    g0 = p.gain("vout", 0)
    ref = a["vout"]
    assert np.abs(g0 - ref).max() < 1e-9, np.abs(g0 - ref).max()
    sb = p.sidebands("vout")
    K = (sb.shape[1] - 1) // 2
    off = np.delete(sb, K, axis=1)
    assert np.abs(off).max() < 1e-9, np.abs(off).max()


def test_pac_ideal_multiplier_conversion_gain():
    """Ideal multiplying mixer (behavioral V = V(rf)·V(lo), LO = sin ω0t):
    the upconverted sidebands at f_in ± f0 have exact complex gains ∓1/(2i)
    — product-of-sinusoids algebra, no fit parameters."""
    from cedarsim_tpu import VSource, VSourceSIN
    from cedarsim_tpu.analysis.hb import pac
    f0 = 1e6
    ckt = load_spice(f"""multiplier mixer
Vlo lo 0 SIN(0 1 {f0})
Vrf rf 0 DC 0 AC 1
Bmix out 0 V='V(rf)*V(lo)'
Rl out 0 1k
.end
""")
    comp = compile_circuit(ckt)
    res = hb(comp, 1.0 / f0, n_harmonics=5, init="dc", tol=1e-12)
    assert res.converged
    p = pac(res, np.array([1e5]))
    gp = complex(p.gain("out", +1)[0])   # want 1/(2i) = -0.5j
    gm = complex(p.gain("out", -1)[0])   # want -1/(2i) = +0.5j
    assert abs(gp - (-0.5j)) < 1e-8, gp
    assert abs(gm - (+0.5j)) < 1e-8, gm
    # no direct feedthrough, no higher sidebands
    assert abs(complex(p.gain("out", 0)[0])) < 1e-9
    assert abs(complex(p.gain("out", +2)[0])) < 1e-9


def test_pnoise_lti_equals_stationary_noise():
    """On a time-invariant circuit PNOISE collapses to the stationary
    noise(): only the k=0 sideband contributes and the transfers match."""
    from cedarsim_tpu import VSource, noise
    from cedarsim_tpu.analysis.hb import pnoise
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=1.0, ac=1.0))
    ckt.add(Resistor, "R1", (vin, vout), dict(r=1e3))
    ckt.add(Resistor, "R2", (vout, ckt.gnd), dict(r=1e3))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=1e-9))
    comp = compile_circuit(ckt)
    res = hb(comp, 1e-6, n_harmonics=2, init="dc", tol=1e-12)
    assert res.converged
    freqs = np.array([1e3, 1e5, 1.59e5, 1e7])
    pn = pnoise(res, "vout", freqs)
    st = noise(comp, "vout", freqs)
    assert np.abs(pn.psd / st.psd - 1.0).max() < 1e-9
    # per-source split matches too
    assert np.abs(pn.source("R1") / st.source("R1") - 1.0).max() < 1e-9


def test_pnoise_mixer_noise_folding():
    """Noise folding through an ideal multiplying mixer: white noise from a
    resistive divider at the RF port, LO = sin(ω0 t).  Output PSD =
    Σ_k |LO_k|²·S_rf = (1/4 + 1/4)·4kT·R_par — exactly HALF the source PSD,
    visible only to periodic noise analysis (the stationary linearization
    at the DC op has V(lo)=0 and sees nothing)."""
    from cedarsim_tpu import noise
    from cedarsim_tpu.analysis.hb import pnoise
    K_B, T_K = 1.380649e-23, 300.15
    f0 = 1e6
    ckt = load_spice(f"""mixer noise folding
Vb nb 0 DC 0
R1 nb nr 1k
R2 nr 0 1k
Vlo lo 0 SIN(0 1 {f0})
Bmix out 0 V='V(nr)*V(lo)'
.end
""")
    comp = compile_circuit(ckt)
    res = hb(comp, 1.0 / f0, n_harmonics=5, init="dc", tol=1e-12)
    assert res.converged
    freqs = np.array([1e4, 1e5])
    pn = pnoise(res, "out", freqs)
    s_rf = 4 * K_B * T_K * 500.0          # R1 || R2
    assert np.abs(pn.psd / (0.5 * s_rf) - 1.0).max() < 1e-6, pn.psd
    # the stationary analysis is blind to the modulated path
    st = noise(comp, "out", freqs)
    assert st.psd.max() < 1e-3 * pn.psd.min()


def test_oscillator_phase_noise_lc_tank_closed_form():
    """PPV phase noise of a noisy-resistor LC oscillator vs the classical
    closed form.  For a near-harmonic tank orbit v = A·cos(ω0 t) with a
    parallel resistor's current noise (single-sided 4kT/R), projecting onto
    the tank's phase ISF −sin(ω0 t)/(A·C·ω0) gives the time-shift
    diffusion  c = kT/(R·C²·A²·ω0²).  The PPV machinery must reproduce it
    (weak-nonlinearity corrections are O(ε²), a few %)."""
    from cedarsim_tpu.analysis.hb import oscillator_phase_noise
    K_B, T_K = 1.380649e-23, 300.15
    L, C, R = 1e-3, 1e-9, 1e4
    a = 2e-4                       # net negative conductance after R
    b = a / 3.0                    # -> A = 2.0
    g_total = a + 1.0 / R
    ckt = load_spice(f"""noisy vdp
L1 out 0 {L}
C1 out 0 {C}
R1 out 0 {R}
B1 out 0 I='{-g_total}*V(out) + {b}*V(out)^3'
.end
""")
    comp = compile_circuit(ckt)
    w0 = 1.0 / np.sqrt(L * C)
    res = hb_autonomous(comp, 2 * np.pi / w0, anchor="out", n_harmonics=9,
                        kick=0.5, warmup_periods=30.0, tol=1e-10)
    assert res.converged
    A_osc = 2.0 * abs(res.spectrum("out")[1])
    pn = oscillator_phase_noise(res)
    # the PPV is trustworthy: biorthogonality constant along the orbit
    assert pn.norm_spread < 0.05, pn.norm_spread
    c_theory = K_B * T_K / (R * C ** 2 * A_osc ** 2 * w0 ** 2)
    assert abs(pn.c / c_theory - 1.0) < 0.15, (pn.c, c_theory)
    # spectrum sanity: Lorentzian rolls off 20 dB/decade far out
    l1, l2 = pn.ldbc([1e3, 1e4])
    assert 19.0 < l1 - l2 < 21.0
    # jitter accumulates as sqrt(n)
    assert abs(pn.jitter(100.0) / (10 * pn.jitter(1.0)) - 1.0) < 1e-9
