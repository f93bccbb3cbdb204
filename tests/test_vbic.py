"""VBIC-class BJT (models/vbic.va, BJT level 4/9 + Spectre ``vbic`` master).

The reference instantiates UnimplementedDevice for every non-GP BJT model
(/root/reference/src/spectre.jl:606-630); here VBIC is functional through
the VA pipeline.  Every gate below is the model's own closed-form equation
set evaluated in numpy at the solved bias — the same discipline as the
JFET/MESFET tests.
"""

import math

import numpy as np

from cedarsim_tpu import (SimSpec, ac, compile_circuit, elaborate,
                          parse_spice, solve_dc)

Q = 1.60219e-19
KB = 1.3806226e-23
VT = KB * 300.15 / Q          # $temperature at the default 27 C


def _dc(nl_text):
    comp = compile_circuit(elaborate(parse_spice(nl_text)))
    r = solve_dc(comp, ctx=SimSpec.make(gmin=1e-15))
    assert bool(r.converged)
    x = np.asarray(r.x)
    return comp, {n: float(x[i]) for i, n in enumerate(comp.node_names)}


def _qdep(v, p, mj, fc=0.9):
    """Normalized single-piece depletion charge (mirror of vbic.va qdep
    with cj=1)."""
    if v < fc * p:
        return p / (1 - mj) * (1 - (1 - v / p) ** (1 - mj))
    f1 = p / (1 - mj) * (1 - (1 - fc) ** (1 - mj))
    f2 = (1 - fc) ** (1 + mj)
    f3 = 1 - fc * (1 + mj)
    vl = v - fc * p
    return f1 + (vl * f3 + 0.5 * mj * vl * vl / p) / f2


def _tb(model_extra="", vb=0.65, vdd=2.0):
    return f"""* vbic bias
VB b 0 {vb}
VC vdd 0 {vdd}
RC vdd c 1.0
RE e 0 1.0
Q1 c b e 0 qn
.model qn npn level=4 is=1e-16 ibei=1e-18 rcx=1e-6 rbx=1e-6 re=1e-6
+ {model_extra}
.end
"""


def test_vbic_forward_gummel_and_beta():
    """Ideal region: Ic = IS(e^{vbe/vt}-1) - Ir - Ibc with qb ~ 1 (VEF/VER/
    IKF off); Ib = IBEI(e^{vbe/vt}-1) + Ibc — decoupled from transport."""
    comp, v = _dc(_tb())
    ic = (2.0 - v["c"]) / 1.0
    ib = v["e"] / 1.0 - ic
    vbe, vbc = 0.65 - v["e"], 0.65 - v["c"]
    ifi = 1e-16 * (math.exp(vbe / VT) - 1)
    iri = 1e-16 * (math.exp(vbc / VT) - 1)
    ibc = 1e-16 * (math.exp(vbc / VT) - 1)
    assert abs(ic - ((ifi - iri) - ibc)) / abs(ifi) < 1e-5
    ib_pred = 1e-18 * (math.exp(vbe / VT) - 1) + ibc
    assert abs(ib - ib_pred) / abs(ib_pred) < 1e-4
    # beta = IS/IBEI = 100 in the ideal region
    assert abs(ic / ib - 100.0) < 0.1


def test_vbic_early_effect_charge_based():
    """VEF: q1 uses the *normalized depletion charge* of the b-c junction
    (the VBIC distinction vs GP's 1-V/VA linearization).  Gate against the
    exact qdep-based prediction at two collector voltages; also require
    finite output conductance."""
    ics = {}
    for vdd in (2.0, 4.0):
        comp, v = _dc(_tb("vef=10 pc=0.8 mc=0.4", vdd=vdd))
        vbe, vbc = 0.65 - v["e"], 0.65 - v["c"]
        ifi = 1e-16 * (math.exp(vbe / VT) - 1)
        iri = 1e-16 * (math.exp(vbc / VT) - 1)
        q1 = 1.0 + _qdep(vbc, 0.8, 0.4) / 10.0
        qb = 0.5 * q1 * (1 + math.sqrt(1 + 1e-12))
        ic_pred = (ifi - iri) / qb - iri
        ic = (vdd - v["c"]) / 1.0
        assert abs(ic - ic_pred) / ic_pred < 1e-5, (vdd, ic, ic_pred)
        ics[vdd] = ic
    assert ics[4.0] > ics[2.0]          # reverse-bias qdep < 0 raises Ic


def test_vbic_high_injection_rolloff():
    """IKF: qb = q1/2 (1+sqrt(1+4 If/IKF)) halves the Gummel slope at high
    injection; closed-form gate at a bias where If/IKF ~ 40."""
    comp, v = _dc(_tb("ikf=1e-6", vb=0.75))
    vbe, vbc = 0.75 - v["e"], 0.75 - v["c"]
    ifi = 1e-16 * (math.exp(vbe / VT) - 1)
    iri = 1e-16 * (math.exp(vbc / VT) - 1)
    q2 = ifi / 1e-6
    assert q2 > 10.0                    # genuinely in rolloff
    qb = 0.5 * (1 + math.sqrt(1 + 4 * q2 + 1e-12))
    ic_pred = (ifi - iri) / qb - iri
    ic = (2.0 - v["c"]) / 1.0
    assert abs(ic - ic_pred) / ic_pred < 1e-5


def test_vbic_pnp_mirror():
    """TYPE=-1: mirrored supplies reproduce the npn solution with flipped
    signs."""
    comp, vn = _dc(_tb())
    pnp = """* vbic pnp
VB b 0 -0.65
VC vdd 0 -2.0
RC vdd c 1.0
RE e 0 1.0
Q1 c b e 0 qp
.model qp pnp level=4 is=1e-16 ibei=1e-18 rcx=1e-6 rbx=1e-6 re=1e-6
.end
"""
    comp, vp = _dc(pnp)
    assert abs(vp["c"] + vn["c"]) < 1e-9
    assert abs(vp["e"] + vn["e"]) < 1e-9


def test_vbic_avalanche():
    """Weak avalanche adds Iavc = Itz*AVC1*vl*exp(-AVC2*vl^(MC-1)) to the
    collector (vl = smoothed PC - vbci)."""
    base = _tb(vdd=5.0)
    av = _tb("avc1=1e-3 avc2=1e-2", vdd=5.0)
    _, v0 = _dc(base)
    _, v1 = _dc(av)
    ic0 = (5.0 - v0["c"]) / 1.0
    ic1 = (5.0 - v1["c"]) / 1.0
    vbc = 0.65 - v1["c"]
    vl = 0.5 * (math.sqrt((0.75 - vbc) ** 2 + 0.01) + (0.75 - vbc))
    iavc_pred = ic0 * 1e-3 * vl * math.exp(-1e-2 * vl ** (0.33 - 1.0))
    assert abs((ic1 - ic0) - iavc_pred) / iavc_pred < 2e-3


def test_vbic_junction_cap_ac():
    """CJE at reverse bias: input admittance of a grounded-base diode-
    connected b-e junction is jw*C with C = CJE*(1-v/PE)^(-ME) — checked
    via ac() at 1 MHz, 1 kOhm source."""
    nl = parse_spice("""* vbic cap
VB in 0 dc -1 ac 1
RB in b 1k
Q1 0 b 0 0 qn
.model qn npn level=4 is=1e-16 ibei=1e-18 cje=2e-12 pe=0.7 me=0.4
+ rcx=1e-6 rbx=1e-6 re=1e-6
.end
""")
    comp = compile_circuit(elaborate(nl))
    r = ac(comp, np.array([1e6]), ctx=SimSpec.make(gmin=1e-15))
    vb_ac = complex(np.asarray(r["b"])[0])
    # divider: vb = Z/(Z+R), Z = 1/(jwC) with C at vbe ~= -1 V
    c_pred = 2e-12 * (1 - (-1.0) / 0.7) ** (-0.4)
    z = 1.0 / (1j * 2 * math.pi * 1e6 * c_pred)
    pred = z / (z + 1e3)
    assert abs(vb_ac - pred) / abs(pred) < 2e-3, (vb_ac, pred)


def test_vbic_spectre_master():
    """Spectre dialect: model qsp vbic type=pnp + master instantiation."""
    scs = """// vbic spectre
simulator lang=spectre
model qsp vbic type=npn is=1e-16 ibei=1e-18 rcx=1e-6 rbx=1e-6 re=1e-6
vb (b 0) vsource dc=0.65
vc (vdd 0) vsource dc=2.0
rc (vdd c) resistor r=1.0
q1 (c b 0 0) qsp
"""
    from cedarsim_tpu.frontend.spectre import parse_spectre
    comp = compile_circuit(elaborate(parse_spectre(scs)))
    r = solve_dc(comp, ctx=SimSpec.make(gmin=1e-15))
    assert bool(r.converged)
    x = np.asarray(r.x)
    v = {n: float(x[i]) for i, n in enumerate(comp.node_names)}
    ic = (2.0 - v["c"]) / 1.0
    ic_pred = 1e-16 * (math.exp(0.65 / VT) - 1)
    assert abs(ic - ic_pred) / ic_pred < 1e-4


def test_vbic_self_heating():
    """RTH electrothermal loop: the device evaluates at T + dT with
    dT = RTH * P solved self-consistently.  Gate against the numpy fixed
    point of the model's own temperature mapping at the solved bias."""
    nl = parse_spice("""* vbic sh
VB b 0 0.7
VC vdd 0 3.0
RC vdd c 1.0
RE e 0 1.0
Q1 c b e 0 qn
.model qn npn level=4 is=1e-16 ibei=1e-18 rcx=1e-6 rbx=1e-6 re=1e-6
+ rth=2e4
.end
""")
    comp = compile_circuit(elaborate(nl))
    r = solve_dc(comp, ctx=SimSpec.make(gmin=1e-15))
    assert bool(r.converged)
    x = np.asarray(r.x)
    v = {n: float(x[i]) for i, n in enumerate(comp.node_names)}
    ic = (3.0 - v["c"]) / 1.0
    vbe, vbc = 0.7 - v["e"], 0.7 - v["c"]
    tnomk = 300.15
    dT = 0.0
    for _ in range(300):
        t = tnomk + dT
        rt, vt = t / tnomk, KB * t / Q
        iset = 1e-16 * rt ** 3 * math.exp(1.12 * (rt - 1) / (rt * vt))
        ibei = 1e-18 * rt ** 3 * math.exp(1.12 * (rt - 1) / (rt * vt))
        ifi = iset * (math.exp(vbe / vt) - 1)
        iri = iset * (math.exp(vbc / vt) - 1)
        ibe = ibei * (math.exp(vbe / vt) - 1)
        itz = ifi - iri
        p = itz * (vbe - vbc) + ibe * vbe + iri * vbc
        dT = 0.5 * dT + 0.5 * 2e4 * p      # damped fixed point
    assert dT > 2.0                        # self-heating is significant
    ic_pred = itz - iri
    assert abs(ic - ic_pred) / ic_pred < 1e-4, (ic, ic_pred, dT)
    # and the cold device (rth absent) carries measurably less current
    nl0 = parse_spice("""* vbic cold
VB b 0 0.7
VC vdd 0 3.0
RC vdd c 1.0
RE e 0 1.0
Q1 c b e 0 qn
.model qn npn level=4 is=1e-16 ibei=1e-18 rcx=1e-6 rbx=1e-6 re=1e-6
.end
""")
    r0 = solve_dc(compile_circuit(elaborate(nl0)), ctx=SimSpec.make(gmin=1e-15))
    x0 = np.asarray(r0.x)
    names0 = compile_circuit(elaborate(nl0)).node_names
    ic0 = (3.0 - float(x0[names0.index("c")])) / 1.0
    assert ic > 1.3 * ic0
