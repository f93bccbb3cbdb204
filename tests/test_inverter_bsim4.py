"""CMOS inverter on the BSIM4-class model — the reference's inverter
benchmark config shape (/root/reference/benchmarks/
inverter_performance_bench.jl; sky130/gf180 cards are not redistributable,
so the in-tree 0.6 µm 5 V cards stand in).  Gates: VTC monotonicity +
switching threshold, rail-to-rail transient with sane propagation delay."""

import os

import numpy as np

from cedarsim_tpu import (parse_spice, elaborate, compile_circuit, tran,
                          TranOptions, SimSpec)
from cedarsim_tpu.analysis.sweeps import Sweep, dc_sweep
from cedarsim_tpu.core.compile import ensure_dynamic

D = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "benchmarks", "gf180_dff")

NETLIST = """* bsim4 inverter
.option gmin=1e-15
.include "models_bsim4.spice"
VDD vdd 0 5.0
VIN in 0 {vin}
XP out in vdd vdd pfet_06v0 w=20u l=0.6u
XN out in 0 0 nfet_06v0 w=10u l=0.6u
CL out 0 50f
.end
"""


def _build(vin="PULSE(0 5 1n 0.2n 0.2n 4n 10n)", **kw):
    nl = parse_spice(NETLIST.replace("{vin}", vin))
    return compile_circuit(elaborate(nl, include_paths=[D]), **kw)


def test_vtc():
    comp = ensure_dynamic(_build(vin="0"), ["vin.dc"])
    vin = np.linspace(0.0, 5.0, 41)
    res = dc_sweep(comp, Sweep("vin.dc", vin), ctx=SimSpec.make(gmin=1e-15))
    vout = np.asarray(res.x)[:, comp.node_names.index("out")]
    assert bool(np.asarray(res.converged).all())
    # rail-to-rail and monotone non-increasing
    assert vout[0] > 4.9 and vout[-1] < 0.1
    assert np.all(np.diff(vout) < 1e-6)
    # switching threshold in the middle third
    vm = float(np.interp(-2.5, -vout, vin))
    assert 1.6 < vm < 3.4, vm


def test_transient_propagation():
    comp = _build()
    sol = tran(comp, (0.0, 10e-9), ctx=SimSpec.make(gmin=1e-15),
               opts=TranOptions(max_steps=8192))
    assert sol.converged
    t = np.linspace(0, 10e-9, 1000)
    vout = np.interp(t, sol.ts, sol["out"])
    vin = np.interp(t, sol.ts, sol["in"])
    # before the edge: out high; after: out low; swing is rail-to-rail
    assert vout[t < 0.9e-9].min() > 4.9
    assert vout[(t > 3e-9) & (t < 5e-9)].max() < 0.1
    # propagation delay: 50%-in-fall to 50%-out within 0-1 ns
    t_in = t[np.argmax(vin > 2.5)]
    t_out = t[np.argmax(vout < 2.5)]
    tpd = t_out - t_in
    assert 0.0 < tpd < 1e-9, tpd
