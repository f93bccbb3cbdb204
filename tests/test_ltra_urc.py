"""Lossy transmission lines: the SPICE O element (LTRA model) and U element
(URC distributed RC line).  The reference *lexes* both letters
(/root/reference/SpectreNetlistParser.jl/src/SPICE/tokenize/lexer.jl:581,
599-600) but has no runtime for either — these are fully functional here,
gated on closed-form RLCG line physics:

* DC series resistance is exact by construction (port lumps sized against
  the wave pair's steady-state contribution),
* AC uses the *exact* frequency-domain RLCG two-port (a cascade of exact
  section two-ports is the exact full line), checked against an
  independent numpy solve of the node equations,
* transient first-transit amplitude matches the analytic attenuation
  e^(-R/2Z0) with the port-lump dividers.
"""

import numpy as np
import pytest

from cedarsim_tpu import (compile_circuit, elaborate, parse_spice, simulate,
                          solve_dc, tran, ac, TranOptions)

Z0, TD = 50.0, 25e-9
LTOT, CTOT = Z0 * TD, TD / Z0  # section totals giving (Z0, TD)


def _ltra_netlist(rtot, rl, source="PULSE(0 2 10n 0.2n 0.2n 400n 1m)",
                  extra=""):
    return f"""* ltra link
V1 vin 0 DC 2 AC 1 {source if source.startswith('PULSE') else ''}
RS vin a 50
O1 a 0 b 0 lossy
RL b 0 {rl}
.model lossy LTRA (R={rtot} L={LTOT} G=0 C={CTOT} LEN=1)
{extra}
.end
"""


def test_ltra_lossless_matches_ideal_line():
    """R=G=0: the O element degenerates to exact Branin — same physics as
    the T element (matched link: pure delay, no reflection)."""
    nl = parse_spice(_ltra_netlist(0.0, 50.0))
    comp = compile_circuit(elaborate(nl))
    sol = tran(comp, (0.0, 120e-9),
               opts=TranOptions(rtol=1e-4, atol=1e-7, max_steps=16384))
    assert sol.converged
    assert abs(float(sol.interp("b", 30e-9))) < 0.02
    assert abs(float(sol.interp("b", 45e-9)) - 1.0) < 0.02
    assert abs(float(sol.interp("a", 70e-9)) - 1.0) < 0.02


def test_ltra_dc_resistance_exact():
    """DC path resistance through the lossy line is exactly R*LEN — the
    port lumps are sized so lumps + the wave pair's steady state sum to
    R*LEN (single and cascaded sections)."""
    for rtot in (8.0, 60.0):  # K=1 and K>1 section counts
        nl = parse_spice(_ltra_netlist(rtot, 100.0, source="DC"))
        comp = compile_circuit(elaborate(nl))
        r = solve_dc(comp)
        assert bool(r.converged)
        vb = float(np.asarray(r.x)[comp.node_names.index("b")])
        expect = 2.0 * 100.0 / (50.0 + rtot + 100.0)
        assert abs(vb - expect) < 1e-8, (rtot, vb, expect)


def test_ltra_ac_exact_two_port():
    """AC stamps are the exact RLCG two-port: compare V(b) against an
    independent numpy solve of the node equations with
    Y11=coth(gl)/Zc, Y12=-1/(Zc sinh gl)."""
    rtot, rl = 30.0, 75.0
    nl = parse_spice(_ltra_netlist(rtot, rl, source="DC"))
    comp = compile_circuit(elaborate(nl))
    freqs = np.array([1e6, 1 / (4 * TD), 1 / (2 * TD), 123.4e6])
    sol = ac(comp, freqs)
    va = np.asarray(sol["a"])
    vb = np.asarray(sol["b"])
    for k, f in enumerate(freqs):
        s = 2j * np.pi * f
        zs = rtot + s * LTOT
        yp = s * CTOT
        gl = np.sqrt(zs * yp)
        zc = np.sqrt(zs / yp)
        y11 = 1.0 / (zc * np.tanh(gl))
        y12 = -1.0 / (zc * np.sinh(gl))
        # node equations: a: (Va-1)/RS + y11 Va + y12 Vb = 0
        #                 b: y12 Va + y11 Vb + Vb/RL = 0
        A = np.array([[1 / 50.0 + y11, y12],
                      [y12, y11 + 1 / rl]])
        rhs = np.array([1 / 50.0, 0.0])
        ref = np.linalg.solve(A, rhs)
        assert abs(va[k] - ref[0]) < 2e-6 * max(1.0, abs(ref[0])), (f, k)
        assert abs(vb[k] - ref[1]) < 2e-6 * max(1.0, abs(ref[1])), (f, k)


def _first_transit(vs, rs, rl, rtot, k, z0=Z0):
    """Analytic first-transit amplitude at the load through a chain of k
    lossy MoC sections — the closed-form mirror of the device's own wave
    algebra (launch divider, per-junction transmission, receive divider,
    alpha per section)."""
    rk = rtot / k
    alpha = np.exp(-rk / (2 * z0))
    rs_w = z0 * (1 - alpha * alpha) / (2 * alpha)
    gc = (1 - alpha) / (z0 * (1 + alpha))
    rho = max(0.0, (rk - rs_w) / 2)
    zin = rho + z0 / (1 - z0 * gc)   # quiet-line input impedance
    # launch: w = 2*U1, U1 = z0*i1/(1 - z0*gc)
    i1 = vs / (rs + zin)
    w = 2 * z0 * i1 / (1 - z0 * gc)
    for _ in range(k - 1):
        # junction: incident e = alpha*w; next section quiet (Zin)
        e = alpha * w
        vj = e / ((1 + rho / zin) * (1 - z0 * gc) + z0 / zin)
        w = 2 * z0 * (vj / zin) / (1 - z0 * gc)
    e = alpha * w
    return e / ((1 + rho / rl) * (1 - z0 * gc) + z0 / rl)


def test_ltra_transient_attenuation():
    """Moderately lossy matched link (K=1 section): the first-transit
    amplitude at the load follows the analytic MoC wave algebra
    (attenuation e^(-R/2Z0) with the lump/compensation dividers); the
    settled level is the exact DC divider."""
    rtot = 8.0  # loss = rtot/(2 Z0) = 0.08 -> single section
    nl = parse_spice(_ltra_netlist(rtot, 50.0))
    comp = compile_circuit(elaborate(nl))
    sol = tran(comp, (0.0, 360e-9),
               opts=TranOptions(rtol=1e-4, atol=1e-7, max_steps=32768))
    assert sol.converged
    vb_first = _first_transit(2.0, 50.0, 50.0, rtot, 1)
    got = float(sol.interp("b", 45e-9))
    assert abs(got - vb_first) < 0.01 * vb_first, (got, vb_first)
    # within 1.5% of the pure exponential ideal
    assert abs(vb_first - np.exp(-rtot / (2 * Z0))) < 0.015
    # settled: exact DC divider
    vdc = 2.0 * 50.0 / (50.0 + rtot + 50.0)
    assert abs(float(sol.interp("b", 350e-9)) - vdc) < 0.01


def test_ltra_heavy_loss_cascades_sections():
    """R*LEN = 60 ohm -> multiple sections; transmitted edge amplitude
    matches the closed-form wave algebra, and the elaborated circuit
    really contains >1 section."""
    rtot, rl = 60.0, 50.0
    nl = parse_spice(_ltra_netlist(rtot, rl))
    ckt = elaborate(nl)
    secs = [i for i in ckt.instances if "o1#s" in i.name]
    assert len(secs) >= 2
    comp = compile_circuit(ckt)
    sol = tran(comp, (0.0, 360e-9),
               opts=TranOptions(rtol=1e-4, atol=1e-7, max_steps=32768))
    assert sol.converged
    k = len(secs)
    vb_first = _first_transit(2.0, 50.0, rl, rtot, k)
    # sample just after arrival (10n launch + 25n line), before the
    # inter-lump micro-echoes (period 2*TD/k ~ 8 ns) top the level up
    # toward the DC value — the lossy line's diffusion-tail analogue
    got = float(sol.interp("b", 37e-9))
    assert abs(got - vb_first) < 0.02 * vb_first, (got, vb_first, k)
    # and close to the distributed ideal e^(-R/2Z0)
    assert abs(got - np.exp(-rtot / (2 * Z0))) < 0.05
    vdc = 2.0 * rl / (50.0 + rtot + rl)
    assert abs(float(sol.interp("b", 350e-9)) - vdc) < 0.01


def _urc_netlist(length, rl="1e12", n="", isperl=""):
    return f"""* urc line
V1 vin 0 DC 1 PULSE(0 1 1n 0.1n 0.1n 1m 2m)
U1 vin b 0 rcline L={length} {n}
RL b 0 {rl}
.model rcline URC (K=2 FMAX=1G RPERL=1e5 CPERL=1e-7 {isperl})
.end
"""


def test_urc_dc_exact():
    """DC: open far end floats to the input level; a loaded far end sees
    the exact total series resistance RPERL*L."""
    # open end
    comp = compile_circuit(elaborate(parse_spice(_urc_netlist(0.01))))
    r = solve_dc(comp)
    assert bool(r.converged)
    vb = float(np.asarray(r.x)[comp.node_names.index("b")])
    assert abs(vb - 1.0) < 1e-7  # gmin leakage through rtot only
    # loaded: rtot = 1e5 * 0.01 = 1 kOhm against RL = 1 kOhm -> 0.5
    comp = compile_circuit(elaborate(parse_spice(_urc_netlist(0.01, "1e3"))))
    r = solve_dc(comp)
    vb = float(np.asarray(r.x)[comp.node_names.index("b")])
    assert abs(vb - 0.5) < 1e-7  # exact up to gmin leakage


def test_urc_diffusion_delay_converges():
    """Step response of the open-ended RC line: the far-end 50% crossing
    sits near the distributed-RC diffusion delay ~0.38*R*C and is
    self-convergent in the segment count (N=6 vs N=40 within 10%)."""
    length = 0.01  # rtot=1k, ctot=1n -> RC = 1e-6 s
    rc = (1e5 * length) * (1e-7 * length)

    def t50(n):
        comp = compile_circuit(elaborate(parse_spice(
            _urc_netlist(length, n=f"N={n}"))))
        sol = tran(comp, (0.0, 3e-6),
                   opts=TranOptions(rtol=1e-4, atol=1e-7, max_steps=32768))
        assert sol.converged
        ts = np.linspace(0, 3e-6, 3001)
        vb = np.asarray(sol.interp("b", ts))
        return ts[np.searchsorted(vb > 0.5, True)] - 1e-9

    a, b = t50(6), t50(24)
    assert abs(a - b) < 0.1 * b, (a, b)
    # classic distributed-RC result: t50 ~= 0.38 RC
    assert abs(b - 0.38 * rc) < 0.08 * rc, (b, 0.38 * rc)


def test_urc_diode_variant_elaborates_and_blocks_dc():
    """ISPERL>0 replaces the shunt capacitors with reverse-biased diodes
    (junction cap = the segment's capacitance share); at a positive input
    the diodes to ground are reverse biased and the line conducts DC
    through its series resistance."""
    comp = compile_circuit(elaborate(parse_spice(
        _urc_netlist(0.01, "1e3", isperl="ISPERL=1e-15 RSPERL=1e-3"))))
    names = [i.name for i in comp.circuit.instances]
    assert any("#d" in n for n in names)
    r = solve_dc(comp)
    assert bool(r.converged)
    vb = float(np.asarray(r.x)[comp.node_names.index("b")])
    # diode leakage is ~1e-17 A per lump: divider still ~exact
    assert abs(vb - 0.5) < 1e-6


def test_ltra_urc_end_to_end_simulate():
    """O and U cards through the public simulate() entry."""
    out = simulate("""* lossy link
V1 vin 0 PULSE(0 2 10n 0.2n 0.2n 400n 1m)
RS vin a 50
O1 a 0 b 0 lmod
RL b 0 50
.model lmod LTRA (R=8 L=1.25u G=0 C=0.5n LEN=1)
.tran 1n 100n
""")
    sol = out["tran"]
    assert sol.converged
    assert abs(float(sol.interp("b", 45e-9))
               - _first_transit(2.0, 50.0, 50.0, 8.0, 1)) < 0.01
