"""Transient noise: per-step white-noise injection through device noise
sources (ngspice TRNOISE role — a capability the reference lacks).

Physics gate: a resistor's thermal noise integrating on a capacitor
produces the equilibrium variance kT/C regardless of R (equipartition).
"""

import numpy as np

from cedarsim_tpu import (Circuit, Resistor, Capacitor, VSource,
                          compile_circuit, tran, TranOptions, SimSpec)
from cedarsim_tpu.config import K_BOLTZMANN, T_ZERO_C


def test_ktc_equilibrium_variance():
    R, C = 1e5, 1e-13          # tau = 10 ns; kT/C = (203 uV)^2 at 27C
    ckt = Circuit()
    vout = ckt.net("vout")
    ckt.add(Resistor, "R1", (vout, ckt.gnd), dict(r=R))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=C))
    comp = compile_circuit(ckt)
    tau = R * C
    span = 400 * tau
    # near-fixed stepping at ~tau/8: loose LTE so the controller rides hmax
    opts = TranOptions(noise_seed=7, hmax_frac=(tau / 8) / span,
                       rtol=10.0, atol=10.0, max_steps=8192, method="be",
                       h0=tau / 8)
    sol = tran(comp, (0.0, span), ctx=SimSpec.make(gmin=1e-15), opts=opts)
    assert sol.converged
    v = sol["vout"]
    # discard the first 20 tau (settling from v=0)
    sel = sol.ts > 20 * tau
    var = float(np.var(v[sel]))
    T = T_ZERO_C + 27.0
    ktc = K_BOLTZMANN * T / C
    # BE discretization at h = tau/8 underestimates the variance by
    # 1/(1+h/(2 tau)) ~ 6%; the statistical error of ~3000 samples over
    # 380 tau is ~10%
    assert 0.6 * ktc < var < 1.4 * ktc, (var, ktc)


def test_noiseless_default_unchanged():
    R, C = 1e5, 1e-13
    ckt = Circuit()
    vout = ckt.net("vout")
    ckt.add(VSource, "V1", (ckt.net("vin"), ckt.gnd), dict(dc=1.0))
    ckt.add(Resistor, "R1", (ckt.net("vin"), vout), dict(r=R))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=C))
    comp = compile_circuit(ckt)
    sol = tran(comp, (0.0, 1e-6), ctx=SimSpec.make(gmin=1e-15))
    assert sol.converged
    v_end = float(sol.interp("vout", 1e-6))
    assert abs(v_end - 1.0) < 1e-3


def test_reproducible_and_seed_dependent():
    R, C = 1e5, 1e-13
    ckt = Circuit()
    vout = ckt.net("vout")
    ckt.add(Resistor, "R1", (vout, ckt.gnd), dict(r=R))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=C))
    comp = compile_circuit(ckt)
    tau = R * C
    span = 40 * tau
    mk = lambda seed: TranOptions(noise_seed=seed, h0=tau / 8,
                                  hmax_frac=(tau / 8) / span, rtol=10.0,
                                  atol=10.0, max_steps=2048, method="be")
    a = tran(comp, (0.0, span), ctx=SimSpec.make(gmin=1e-15), opts=mk(1))
    b = tran(comp, (0.0, span), ctx=SimSpec.make(gmin=1e-15), opts=mk(1))
    c2 = tran(comp, (0.0, span), ctx=SimSpec.make(gmin=1e-15), opts=mk(2))
    assert np.array_equal(a["vout"], b["vout"])
    assert not np.array_equal(a["vout"], c2["vout"])
