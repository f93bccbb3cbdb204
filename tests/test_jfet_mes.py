"""JFET (J, Shichman–Hodges) and MESFET (Z, Statz) devices — the reference
parses both card forms (SPICE/parse/forms.jl JFET/MESFET) but implements
neither device (spectre.jl:606-630 UnimplementedDevice).  All gates are
the models' own closed-form I-V equations."""

import numpy as np

from cedarsim_tpu import compile_circuit, elaborate, parse_spice, solve_dc, ac


def _dc(nl_text):
    comp = compile_circuit(elaborate(parse_spice(nl_text)))
    r = solve_dc(comp)
    assert bool(r.converged)
    x = np.asarray(r.x)
    return comp, {n: float(x[i]) for i, n in enumerate(comp.node_names)}


def _jfet_bias(vgs, vdd, beta=1e-3, lam=0.0, rd=100.0, extra=""):
    return f"""* jfet bias
VG g 0 DC {vgs}
VD vdd 0 DC {vdd}
RD vdd d {rd}
J1 d g 0 jn
.model jn NJF (VTO=-2 BETA={beta} LAMBDA={lam}) {extra}
.end
"""


def test_jfet_dc_saturation_and_triode():
    """NJF closed-form: sat id = beta*(vgs-vto)^2*(1+lam*vds); triode
    id = beta*vds*(2*vgst-vds)(1+lam*vds).  Solved implicitly through the
    drain resistor; compare against the scalar fixed point."""
    beta, lam, rd, vdd, vgs = 1e-3, 0.02, 100.0, 10.0, -1.0
    vgst = vgs - (-2.0)
    comp, v = _dc(_jfet_bias(vgs, vdd, beta, lam, rd))
    vd = v["d"]
    # saturation (vd ~ 9.9 > vgst = 1)
    idv = beta * vgst ** 2 * (1 + lam * vd)
    assert abs((vdd - vd) / rd - idv) < 1e-9, (vd, idv)
    # triode: big RD pulls vd below vgst
    rd = 20e3
    comp, v = _dc(_jfet_bias(vgs, vdd, beta, lam, rd))
    vd = v["d"]
    assert vd < vgst
    idv = beta * vd * (2 * vgst - vd) * (1 + lam * vd)
    assert abs((vdd - vd) / rd - idv) < 1e-9, (vd, idv)


def test_jfet_cutoff_and_pjf_mirror():
    """Below VTO the channel is off (only gmin leakage); the PJF with
    mirrored supplies reproduces the NJF solution with flipped signs."""
    comp, v = _dc(_jfet_bias(-3.0, 10.0))
    assert abs(v["d"] - 10.0) < 1e-6  # no drop across RD
    pj = """* pjf mirror
VG g 0 DC 1
VD vdd 0 DC -10
RD vdd d 100
J1 d g 0 jp
.model jp PJF (VTO=-2 BETA=1e-3 LAMBDA=0.02)
.end
"""
    comp, vp = _dc(pj)
    comp, vn = _dc(_jfet_bias(-1.0, 10.0, 1e-3, 0.02, 100.0))
    assert abs(vp["d"] + vn["d"]) < 1e-9


def test_jfet_area_scales_current():
    nl = _jfet_bias(-1.0, 10.0).replace("J1 d g 0 jn", "J1 d g 0 jn 2")
    comp, v = _dc(nl)
    id2 = (10.0 - v["d"]) / 100.0
    comp, v1 = _dc(_jfet_bias(-1.0, 10.0))
    id1 = (10.0 - v1["d"]) / 100.0
    # area=2 doubles beta: lam=0 so id is vds-independent in saturation
    assert abs(id2 - 2 * id1) < 1e-9


def test_jfet_common_source_ac_gain():
    """lam=0, saturation: gm = 2*beta*vgst exactly; CS gain = -gm*RD.
    AC solve must match to solver tolerance (no caps in the model card)."""
    beta, rd, vgs = 1e-3, 1000.0, -1.0
    nl = f"""* cs amp
VG g 0 DC {vgs} AC 1
VD vdd 0 DC 10
RD vdd d {rd}
J1 d g 0 jn
.model jn NJF (VTO=-2 BETA={beta})
.end
"""
    comp = compile_circuit(elaborate(parse_spice(nl)))
    sol = ac(comp, np.array([1e3]))
    gain = complex(np.asarray(sol["d"])[0])
    gm = 2 * beta * (vgs + 2.0)
    assert abs(gain - (-gm * rd)) < 1e-6, (gain, -gm * rd)


def test_jfet_gate_junction_forward():
    """Forward-biased gate-source junction follows the diode law."""
    nl = """* gate junction
VIN vin 0 DC 0.65
RS vin g 1000
J1 d g 0 jn
VD d 0 DC 0
.model jn NJF (VTO=-2 BETA=0 IS=1e-12)
.end
"""
    comp, v = _dc(nl)
    vg = v["g"]
    ig = (0.65 - vg) / 1000.0
    # diode law at the solved vg (g-s junction; g-d junction sees the
    # same voltage since vd=0, so half the current each)
    vt = 0.025851997  # 300.15 K default
    expect = 2 * 1e-12 * (np.exp(vg / vt) - 1.0)
    assert abs(ig - expect) < 2e-2 * abs(expect), (ig, expect)


def test_mesfet_statz_dc():
    """Statz closed form in both the cubic-rise (vds < 3/alpha) and the
    saturated region."""
    beta, b, alpha, lam, vgs = 2.5e-3, 0.3, 2.0, 0.05, -1.0
    vgst = vgs + 2.0
    for rd, vdd in ((200.0, 10.0), (8000.0, 8.0)):
        nl = f"""* mes bias
VG g 0 DC {vgs}
VD vdd 0 DC {vdd}
RD vdd d {rd}
Z1 d g 0 mn
.model mn NMF (VTO=-2 BETA={beta} B={b} ALPHA={alpha} LAMBDA={lam})
.end
"""
        comp, v = _dc(nl)
        vd = v["d"]
        kq = beta * vgst ** 2 / (1 + b * vgst)
        shape = (1 - max(1 - alpha * vd / 3, 0.0) ** 3)
        idv = kq * shape * (1 + lam * vd)
        assert abs((vdd - vd) / rd - idv) < 1e-9, (rd, vd, idv)


def test_mesfet_pmf():
    nl = """* pmf
VG g 0 DC 1
VD vdd 0 DC -6
RD vdd d 200
Z1 d g 0 mp
.model mp PMF (VTO=-2 BETA=2.5e-3 B=0.3 ALPHA=2)
.end
"""
    comp, v = _dc(nl)
    vd = v["d"]
    vgst = 1.0  # |vgs| - |vto| in flipped frame: vgs_=-1, vto=-2
    kq = 2.5e-3 * vgst ** 2 / (1 + 0.3 * vgst)
    shape = 1 - max(1 - 2.0 * (-vd) / 3, 0.0) ** 3
    idv = kq * shape
    assert abs((-6.0 - vd) / 200.0 + idv) < 1e-9, (vd, idv)


def test_jfet_transient_smoke_with_caps():
    """Junction capacitances active: a gate step slews the drain through
    the caps; transient converges and settles to the DC solution."""
    from cedarsim_tpu import tran, TranOptions
    nl = """* jfet switch
VG g 0 PULSE(-3 -1 1u 10n 10n 1m 2m)
VD vdd 0 DC 10
RD vdd d 1k
J1 d g 0 jn
.model jn NJF (VTO=-2 BETA=1e-3 CGS=2p CGD=2p PB=1)
.end
"""
    comp = compile_circuit(elaborate(parse_spice(nl)))
    sol = tran(comp, (0.0, 10e-6),
               opts=TranOptions(rtol=1e-4, atol=1e-6, max_steps=16384))
    assert sol.converged
    assert abs(float(sol.interp("d", 0.9e-6)) - 10.0) < 1e-3   # off
    assert abs(float(sol.interp("d", 9e-6)) - 9.0) < 1e-2      # on: 1mA*1k
