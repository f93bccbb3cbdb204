"""Bipolar common-emitter amplifier — one of the reference's benchmark
configs (/root/reference/scratch/bipolar_amplifier.cir; the BC546B model
card is the public ngspice-tutorial one).  Correctness is cross-method:
the transient output amplitude must match the AC small-signal gain at the
drive frequency, and both must match the analytic gm·(RC‖RL) estimate.
"""

import numpy as np

from cedarsim_tpu import parse_spice, elaborate, compile_circuit, tran, ac
from cedarsim_tpu import solve_dc, SimSpec, TranOptions

NETLIST = """* bipolar common-emitter amplifier (reference benchmark config)
.model BC546B npn ( IS=7.59E-15 VAF=73.4 BF=480 IKF=0.0962 NE=1.2665
+ ISE=3.278E-15 IKR=0.03 ISC=2.00E-13 NC=1.2 NR=1 BR=5 RC=0.25 CJC=6.33E-12
+ FC=0.5 MJC=0.33 VJC=0.65 CJE=1.25E-11 MJE=0.55 VJE=0.65 TF=4.26E-10
+ ITF=0.6 VTF=3 XTF=20 RB=100 IRB=0.0001 RBM=10 RE=0.5 TR=1.50E-07)
RLoad1 out 0 100k
R2 nb 0 10k
Q1 nc nb 0 BC546B
Vin1 vin 0 dc 0 ac 1 sin(0 1m 500)
Cin1 vin nb 10u
VCC1 vcc 0 5
R1 vcc nb 68k
Cout1 nc out 10u
R3 vcc nc 10k
.end
"""


def _build():
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        nl = parse_spice(NETLIST)
        return compile_circuit(elaborate(nl))


def test_bias_point():
    comp = _build()
    r = solve_dc(comp, ctx=SimSpec.make(gmin=1e-12))
    assert bool(r.converged)
    x = np.asarray(r.x)
    vc = x[comp.node_names.index("nc")]
    vb = x[comp.node_names.index("nb")]
    # active region: VB ~ 0.6-0.7, VC well inside (0.5, 4.5)
    assert 0.5 < vb < 0.8, vb
    assert 0.5 < vc < 4.5, vc


def test_ac_gain_matches_transient_amplitude():
    comp = _build()
    ctx = SimSpec.make(gmin=1e-12)
    sol_ac = ac(comp, [500.0], ctx=ctx)
    gain = abs(complex(np.asarray(sol_ac["out"])[0]))

    # analytic estimate: |A| ~ gm*(R3 || RLoad) with gm = IC/VT
    r = solve_dc(comp, ctx=ctx)
    x = np.asarray(r.x)
    vc = x[comp.node_names.index("nc")]
    ic = (5.0 - vc) / 10e3
    gm = ic / 0.02585
    a_est = gm * (10e3 * 100e3 / 110e3)
    assert 0.5 * a_est < gain < 1.5 * a_est, (gain, a_est)

    # transient: 2 drive periods after a settling period; amplitude at out
    sol = tran(comp, (0.0, 6e-3), ctx=ctx,
               opts=TranOptions(max_steps=16384))
    assert sol.converged
    tgrid = np.linspace(4e-3, 6e-3, 600)
    v = np.interp(tgrid, sol.ts, sol["out"])
    amp = (v.max() - v.min()) / 2.0
    # drive is 1 mV -> output amplitude = gain * 1 mV (within distortion)
    assert abs(amp - gain * 1e-3) < 0.25 * gain * 1e-3, (amp, gain * 1e-3)
