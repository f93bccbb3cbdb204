"""Spectre dialect tests: instance/parameters/analysis syntax, primitive
masters, model masters, and mixed-language switching
(/root/reference/SpectreNetlistParser.jl forms + test/)."""

import numpy as np

from cedarsim_tpu import simulate


def test_spectre_divider_dc():
    code = """// spectre divider
simulator lang=spectre
parameters rtop=1k rbot=3k
v1 (vin 0) vsource dc=2
r1 (vin vmid) resistor r=rtop
r2 (vmid 0) resistor r=rbot
op1 dc
"""
    res = simulate(code, dialect="spectre")
    c = res["compiled"]
    x = np.asarray(res["op"].x)
    assert bool(res["op"].converged)
    assert np.isclose(x[c.node_names.index("vmid")], 1.5, rtol=1e-9)


def test_spectre_subckt_and_tran():
    code = """// spectre rc
simulator lang=spectre
subckt lowpass (in out)
parameters r=1k c=1u
r1 (in out) resistor r=r
c1 (out 0) capacitor c=c
ends lowpass
v1 (vin 0) vsource type=pulse val0=0 val1=1 delay=1m rise=1u fall=1u width=10m
x1 (vin vout) lowpass r=2k
tran1 tran stop=5m
"""
    res = simulate(code, dialect="spectre")
    sol = res["tran"]
    assert sol.converged
    # tau = 2k*1u = 2ms; at t=1m+2m, v = 1-e^-1
    v = sol.interp("vout", 3e-3)
    assert np.isclose(v, 1 - np.exp(-1), atol=0.02)


def test_mixed_language():
    code = """* spice section first
V1 a 0 1
R1 a b 1k
simulator lang=spectre
r2 (b 0) resistor r=1k
op1 dc
"""
    res = simulate(code, dialect="spice")
    c = res["compiled"]
    x = np.asarray(res["op"].x)
    assert np.isclose(x[c.node_names.index("b")], 0.5, rtol=1e-9)


def test_spectre_model_master():
    code = """// model master
simulator lang=spectre
model mynmos nmos (level=1 vto=0.7 kp=100u)
v1 (vdd 0) vsource dc=3.3
v2 (g 0) vsource dc=3.3
r1 (vdd d) resistor r=10k
m1 (d g 0 0) mynmos w=10u l=1u
op1 dc
"""
    res = simulate(code, dialect="spectre")
    c = res["compiled"]
    x = np.asarray(res["op"].x)
    assert bool(res["op"].converged)
    # strong NMOS pulls d low
    assert x[c.node_names.index("d")] < 0.5
