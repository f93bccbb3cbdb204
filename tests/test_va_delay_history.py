"""Exact-history absdelay (delay_mode="history"): the integrator carries a
(t, u) sample ring and the device reads u(t−td) as an injected input —
wideband-exact where the default Padé(3,3) all-pass runs out of band
(group delay good only to ω·td ≈ 4 rad).  The reference simulator has no
absdelay runtime at all (VerilogAParser tokenizes it only)."""

import numpy as np
import pytest

from cedarsim_tpu import (Circuit, Resistor, VSource, VSourceSIN,
                          compile_circuit, solve_dc, tran, TranOptions)
from cedarsim_tpu.va.parser import parse_va
from cedarsim_tpu.va.codegen import make_device, VACodegenError

VA = """
module vdelay(p, n, ps, ns);
  inout p, n, ps, ns;
  electrical p, n, ps, ns;
  parameter real td = 1e-6;
  analog V(p, n) <+ absdelay(V(ps, ns), td);
endmodule
"""

F = 1e6          # 1 MHz input
TD = 2e-6        # omega*td = 12.6 rad: far beyond the Pade(3,3) band


def _build(delay_mode):
    Dly = make_device(parse_va(VA, "vdelay.va")[0], delay_mode=delay_mode)
    assert (Dly.n_delay == 1) == (delay_mode == "history")
    ckt = Circuit()
    vin, out = ckt.net("vin"), ckt.net("out")
    ckt.add(VSourceSIN, "V1", (vin, ckt.gnd),
            dict(vo=0.0, va=1.0, freq=F))
    ckt.add(Dly, "X1", (out, ckt.gnd, vin, ckt.gnd), dict(td=TD))
    ckt.add(Resistor, "RL", (out, ckt.gnd), dict(r=1e4))
    return compile_circuit(ckt)


def _run(comp, tstop=8e-6, **kw):
    return tran(comp, (0.0, tstop),
                opts=TranOptions(rtol=1e-4, atol=1e-7, max_steps=16384,
                                 **kw))


def test_history_delay_is_wideband_exact():
    sol = _run(_build("history"))
    assert sol.converged
    probes = np.linspace(3e-6, 7.5e-6, 60)
    err = max(abs(float(sol.interp("out", t))
                  - np.sin(2 * np.pi * F * (t - TD))) for t in probes)
    assert err < 0.02, err
    # the same circuit through the Pade(3,3) path is way out of band here:
    # proves the history path is doing something materially different
    sol_p = _run(_build("pade"))
    err_p = max(abs(float(sol_p.interp("out", t))
                    - np.sin(2 * np.pi * F * (t - TD))) for t in probes)
    assert err_p > 10 * err, (err, err_p)


def test_history_delay_dc_passthrough():
    Dly = make_device(parse_va(VA, "vdelay.va")[0], delay_mode="history")
    ckt = Circuit()
    vin, out = ckt.net("vin"), ckt.net("out")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=0.7))
    ckt.add(Dly, "X1", (out, ckt.gnd, vin, ckt.gnd), dict(td=TD))
    ckt.add(Resistor, "RL", (out, ckt.gnd), dict(r=1e4))
    comp = compile_circuit(ckt)
    r = solve_dc(comp)
    assert bool(r.converged)
    assert abs(float(np.asarray(r.x)[comp.node_names.index("out")])
               - 0.7) < 1e-9


def test_history_delay_ac_exact():
    """AC of a history-mode absdelay is the EXACT transfer e^{−jωtd}
    (analysis/ac._delay_ac frequency-dependent stamp): |H| = 1 and
    phase = −ωtd at every frequency, including far beyond the Padé(3,3)
    band (ω·td up to 63 rad here).  Round 4 raised on this path; the
    exact stamp replaced the raise in round 5."""
    from cedarsim_tpu import ac
    comp = _build("history")
    # drive the source's AC input: VSourceSIN carries ac=0 by default, so
    # rebuild with an explicit AC 1 drive
    Dly = make_device(parse_va(VA, "vdelay.va")[0], delay_mode="history")
    ckt = Circuit()
    vin, out = ckt.net("vin"), ckt.net("out")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=0.0, ac=1.0))
    ckt.add(Dly, "X1", (out, ckt.gnd, vin, ckt.gnd), dict(td=TD))
    ckt.add(Resistor, "RL", (out, ckt.gnd), dict(r=1e4))
    comp = compile_circuit(ckt)
    freqs = np.array([1e3, 1e5, 1e6, 5e6])        # ω·td up to 63 rad
    sol = ac(comp, freqs)
    h = sol["out"]
    want = np.exp(-1j * 2 * np.pi * freqs * TD)
    assert np.allclose(np.abs(h), 1.0, atol=1e-9)
    assert np.allclose(h, want, atol=1e-9), (h, want)


def test_history_delay_checkpoint_resume():
    comp = _build("history")
    full = _run(comp, tstop=8e-6)
    first = _run(comp, tstop=4e-6)
    resumed = tran(comp, (0.0, 8e-6), resume=first.checkpoint,
                   opts=TranOptions(rtol=1e-4, atol=1e-7, max_steps=16384))
    assert resumed.converged
    # the resumed run carries the history ring through the checkpoint: its
    # delayed output stays exact past the seam
    for t in (5e-6, 6.5e-6, 7.5e-6):
        want = np.sin(2 * np.pi * F * (t - TD))
        assert abs(float(resumed.interp("out", t)) - want) < 0.02
        assert abs(float(full.interp("out", t))
                   - float(resumed.interp("out", t))) < 0.02
