"""Shooting PSS vs closed forms and vs brute-force settled transients."""

import numpy as np
import jax

from cedarsim_tpu import (Circuit, Resistor, Capacitor, Diode, VSourceSIN,
                          compile_circuit, tran, TranOptions, SimSpec)
from cedarsim_tpu.analysis.pss import pss


def test_driven_rc_matches_closed_form():
    """Sine-driven RC: the periodic orbit is the AC phasor response —
    PSS must land on it directly from the DC point (which is OFF-orbit)."""
    f0, R, C = 1e6, 1e3, 1e-9
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourceSIN, "V1", (vin, ckt.gnd),
            dict(vo=0.0, va=1.0, freq=f0))
    ckt.add(Resistor, "R1", (vin, vout), dict(r=R))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=C))
    comp = compile_circuit(ckt)
    T = 1.0 / f0
    res = pss(comp, T, ctx=SimSpec.make(gmin=1e-15),
              opts=TranOptions(max_steps=4096, rtol=1e-5, atol=1e-9),
              tol=1e-7)
    assert res.converged, (res.iters, res.resnorm)

    # closed form: H = 1/(1+jwRC); v(t) = |H| sin(wt + arg H)
    w = 2 * np.pi * f0
    H = 1.0 / (1.0 + 1j * w * R * C)
    tgrid = np.linspace(0.05 * T, 0.95 * T, 24)
    v = np.interp(tgrid, res.solution.ts, res.solution["vout"])
    exact = np.abs(H) * np.sin(w * tgrid + np.angle(H))
    assert np.abs(v - exact).max() < 5e-3, np.abs(v - exact).max()


def test_rectifier_matches_settled_transient():
    """Diode peak rectifier: PSS fixed point equals the orbit a long
    transient settles onto (tau = 100 periods, so brute force needs
    hundreds of periods; shooting needs a few Newton solves)."""
    f0 = 1e6
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourceSIN, "V1", (vin, ckt.gnd),
            dict(vo=0.0, va=2.0, freq=f0))
    ckt.add(Diode, "D1", (vin, vout), {"is": 1e-14, "n": 1.0})
    ckt.add(Resistor, "RL", (vout, ckt.gnd), dict(r=100e3))
    ckt.add(Capacitor, "CL", (vout, ckt.gnd), dict(c=1e-9))  # tau = 100 T
    comp = compile_circuit(ckt)
    T = 1.0 / f0
    res = pss(comp, T, ctx=SimSpec.make(gmin=1e-12),
              opts=TranOptions(max_steps=4096), tol=1e-6)
    assert res.converged, (res.iters, res.resnorm)
    # brute force: 400 periods from DC; hmax bounded to T/20 (SIN sources
    # have no breakpoints, so an unbounded hmax leaps whole cycles)
    sol = tran(comp, (0.0, 400 * T), ctx=SimSpec.make(gmin=1e-12),
               opts=TranOptions(max_steps=16384,
                                hmax_frac=(1.0 / 20) / 400))
    assert sol.converged
    v_pss = float(np.interp(0.5 * T, res.solution.ts,
                            res.solution["vout"]))
    v_bf = float(sol.interp("vout", 399.5 * T))
    assert abs(v_pss - v_bf) < 0.02, (v_pss, v_bf)
    # physics: ripple-averaged level near the peak minus a diode drop
    assert 1.0 < v_pss < 1.6, v_pss
