"""Netlist dialect conversion tests (cedarsim_tpu/tools/convert.py — the
spak-convert equivalent, /root/reference/SpiceArmyKnife.jl/src/Convert.jl).

The strongest check is the semantic round-trip: convert, re-parse in the
other dialect, elaborate, and compare operating points / transients with the
original — stricter than any text diff.
"""

import json

import numpy as np
import pytest

from cedarsim_tpu import parse_spice, elaborate, compile_circuit, SimSpec
from cedarsim_tpu.analysis.dc import solve_dc
from cedarsim_tpu.frontend.spectre import parse_spectre
from cedarsim_tpu.tools.convert import (convert_text, extract_models,
                                        parse_any, fmt_num, emit_expr)

DIVIDER = """* divider with expression params
.param rr=2k vv={1+0.5}
v1 in 0 dc {2*vv}
r1 in mid {rr}
r2 mid 0 1k
c1 mid 0 1n
.op
.end
"""

BSIM4_INV = """* bsim4 inverter (level 54)
.model nch nmos level=54 toxe=4.1e-9 ndep=3.5e17 vth0=0.47 k1=0.55 k2=0.03
+ u0=320 ua=1.2e-9 ub=2e-18 vsat=9e4 rdsw=180 voff=-0.09 nfactor=1.2
+ cgso=3.5e-10 cgdo=3.5e-10 xj=1.6e-7
.model pch pmos level=54 toxe=4.1e-9 ndep=2.5e17 vth0=-0.45 k1=0.5 k2=0.02
+ u0=120 ua=1.4e-9 ub=2e-18 vsat=7e4 rdsw=300 voff=-0.1 nfactor=1.3
+ cgso=3.5e-10 cgdo=3.5e-10 xj=1.6e-7
vdd vdd 0 1.8
vin in 0 dc 0.6
mn out in 0 0 nch w=1u l=0.18u
mp out in vdd vdd pch w=2u l=0.18u
.end
"""

SUBCKT_PULSE = """* subckt + sources torture
.subckt lp in out r=1k c=1n
r1 in out {r}
c1 out 0 {c}
.ends
v1 in 0 dc 0 pulse(0 5 1u 1n 1n 4u 10u)
x1 in out lp r=2k
.tran 1n 20u
.end
"""


def _dc_solution(comp):
    res = solve_dc(comp, ctx=SimSpec.make())
    assert bool(res.converged)
    return {n: float(res.x[i]) for i, n in enumerate(comp.node_names)}


def _roundtrip_dc(spice_text, tol=1e-9):
    nl0 = parse_spice(spice_text)
    comp0 = compile_circuit(elaborate(nl0))
    ref = _dc_solution(comp0)

    scs = convert_text(spice_text, "spice", "spectre")
    nl1 = parse_spectre(scs)
    comp1 = compile_circuit(elaborate(nl1))
    got = _dc_solution(comp1)
    for n, v in ref.items():
        assert got[n] == pytest.approx(v, abs=tol), (n, scs)

    # and back to SPICE
    cir = convert_text(scs, "spectre", "spice")
    nl2 = parse_spice(cir)
    comp2 = compile_circuit(elaborate(nl2))
    got2 = _dc_solution(comp2)
    for n, v in ref.items():
        assert got2[n] == pytest.approx(v, abs=tol), (n, cir)
    return scs, cir


def test_divider_roundtrip():
    scs, cir = _roundtrip_dc(DIVIDER)
    assert "simulator lang=spectre" in scs
    assert "resistor" in scs


def test_bsim4_inverter_roundtrip():
    scs, cir = _roundtrip_dc(BSIM4_INV, tol=1e-6)
    assert "model nch bsim4 type=n" in scs
    assert "model pch bsim4 type=p" in scs
    # spice re-emission restores the level
    assert "level=54" in cir


def test_subckt_and_pulse_roundtrip_transient():
    from cedarsim_tpu import tran, TranOptions
    scs = convert_text(SUBCKT_PULSE, "spice", "spectre")
    assert "subckt lp" in scs and "type=pulse" in scs
    comp0 = compile_circuit(elaborate(parse_spice(SUBCKT_PULSE)))
    comp1 = compile_circuit(elaborate(parse_spectre(scs)))
    ctx = SimSpec.make()
    s0 = tran(comp0, (0.0, 2e-5), ctx=ctx, opts=TranOptions(max_steps=8192))
    s1 = tran(comp1, (0.0, 2e-5), ctx=ctx, opts=TranOptions(max_steps=8192))
    assert s0.converged and s1.converged
    for t in (0.5e-6, 3e-6, 6e-6, 12e-6):
        assert float(s1.interp("out", t)) == pytest.approx(
            float(s0.interp("out", t)), abs=2e-3)


def test_analyses_and_directives_convert():
    text = """* directives
v1 a 0 dc 1 ac 1
r1 a b 1k
c1 b 0 1n
.option reltol=1e-4
.temp 85
.ic v(b)=0.5
.global vdd!
.tran 1n 10u
.ac dec 10 1 1e6
.op
.end
"""
    scs = convert_text(text, "spice", "spectre")
    assert "options reltol=" in scs
    assert "temp=85" in scs
    assert "ic b=0.5" in scs
    assert "tran" in scs and "stop=1e-05" in scs, scs
    assert "ac" in scs and "dec=10" in scs
    assert "mag=1" in scs
    # and it parses back
    nl = parse_spectre(scs)
    comp = compile_circuit(elaborate(nl))
    assert "b" in comp.node_names


def test_model_db_extraction():
    nl = parse_spice(BSIM4_INV)
    db = extract_models(nl, source="inv.cir")
    names = {m["name"]: m for m in db}
    assert set(names) == {"nch", "pch"}
    assert names["nch"]["kind"] == "nmos"
    assert names["nch"]["params"]["vth0"] == pytest.approx(0.47)
    json.dumps(db)   # serializable


def test_cli(tmp_path):
    from cedarsim_tpu.tools.convert import main
    src = tmp_path / "in.cir"
    src.write_text(BSIM4_INV)
    out = tmp_path / "out.scs"
    db = tmp_path / "db.json"
    assert main([str(src), str(out), "--output-simulator", "spectre",
                 "--extract-models", str(db)]) == 0
    assert "bsim4" in out.read_text()
    assert len(json.loads(db.read_text())) == 2


def test_fmt_and_expr():
    assert fmt_num(1000.0) == "1000"
    assert fmt_num(1e-9) == "1e-09"
    assert emit_expr(("bin", "*", ("num", 2.0), ("ref", "vv"))) == "(2*vv)"


# ------------------------------------------------------- Verilog-A output

VA_RT_SUBCKT = """* rc block
.subckt blk in out r=1k
r1 in out {r}
r2 out 0 2k
c1 out 0 1p
.ends
.end
"""

VA_RT_CTRL = """* controlled/behavioral block
.subckt amp in out
v1 ref 0 1
e1 mid 0 in 0 2
bload out 0 v={v(mid)+0.5*i(v1)}
.ends
.end
"""


def test_veriloga_subckt_roundtrip(tmp_path):
    """SPICE subckt of primitives -> VA module -> back through our own VA
    pipeline: DC must match the direct SPICE elaboration (the strongest
    check on the cg_veriloga.jl role)."""
    va = convert_text(VA_RT_SUBCKT, "spice", "veriloga")
    assert "module blk(in, out);" in va
    assert "ground gnd;" in va
    assert "parameter real r = 1000;" in va
    f = tmp_path / "blk.va"
    f.write_text(va)
    code = f"""* va roundtrip
.hdl "{f}"
v1 vin 0 3
x1 vin vout blk r=1k
.op
"""
    from cedarsim_tpu import simulate
    res = simulate(code)
    comp = res["compiled"]
    vout = float(np.asarray(res["op"].x)[comp.node_names.index("vout")])
    # direct SPICE: divider 1k over 2k of 3 V -> 2 V
    assert vout == pytest.approx(2.0, abs=1e-6)


def test_veriloga_controlled_behavioral_roundtrip(tmp_path):
    """VCVS, internal V source and a B source probing v() and i() all
    lower to VA contributions and solve identically."""
    va = convert_text(VA_RT_CTRL, "spice", "veriloga")
    assert "branch" in va and "V(b_v1) <+" in va
    f = tmp_path / "amp.va"
    f.write_text(va)
    code = f"""* va roundtrip 2
.hdl "{f}"
vin vin 0 1.5
x1 vin vout amp
.op
"""
    from cedarsim_tpu import simulate
    res = simulate(code)
    comp = res["compiled"]
    vout = float(np.asarray(res["op"].x)[comp.node_names.index("vout")])
    # e1 gain 2 -> mid = 3.0; i(v1) = 0 (dangling); bload: vout = mid
    assert vout == pytest.approx(3.0, abs=1e-6)


def test_veriloga_models_sources_hierarchy():
    """.model -> paramset, .param -> `define, top elements -> testbench
    module, X instances -> structural instantiation, waveform sources ->
    $abstime expressions (reference cg_veriloga.jl:229-537 behaviors)."""
    text = """* tb
.param vddv=1.8
.model nch nmos level=54 vth0=0.47
.subckt lp a b r=1k
r1 a b {r}
.ends
vdd vdd 0 {vddv}
vp p 0 pulse(0 {vddv} 1n 100p 100p 4n 10n)
vs s 0 sin(0 1 1meg)
m1 out p 0 0 nch w=1u l=0.1u
x1 out qq lp r=2k
.tran 1n 20n
.end
"""
    va = convert_text(text, "spice", "veriloga")
    assert "`define vddv (1.8)" in va
    assert "paramset nch bsim4;" in va
    assert '.type = "n";' in va
    assert "module testbench();" in va
    assert "floor(" in va           # periodic pulse
    assert "sin(" in va
    assert "`vddv" in va            # global define referenced w/ backtick
    assert "nch #(.w(1e-06),.l(1e-07)) m1(out, p, gnd, gnd);" in va
    assert "lp #(.r(2000)) x1(out, qq);" in va


def test_veriloga_cli(tmp_path):
    from cedarsim_tpu.tools.convert import main
    src = tmp_path / "in.cir"
    src.write_text(VA_RT_SUBCKT)
    out = tmp_path / "out.va"
    assert main([str(src), str(out), "--output-simulator", "veriloga"]) == 0
    assert "module blk" in out.read_text()


def test_vbic_model_mapping_roundtrip():
    """BJT level 4 maps to the Spectre/VA vbic master and back."""
    text = """* vbic map
.model qv npn level=4 is=1e-16
q1 c b 0 0 qv
.end
"""
    scs = convert_text(text, "spice", "spectre")
    assert "model qv vbic type=npn" in scs
    back = convert_text(scs, "spectre", "spice")
    assert "level=4" in back and ("npn" in back)
    va = convert_text(text, "spice", "veriloga")
    assert "paramset qv vbic;" in va
