"""LRM-exact transition() linear ramps (transition_mode="latch"): the
integrator's latched aux-state channel carries (target, y_start, t_start)
per site, re-latched at accepted steps when the input changes — the
lax.while_loop replacement for the reference-class event queue.  Gates are
the LRM's own piecewise-linear ramp geometry (the default "smooth" mode
remains the exponential shaper, tests/test_va_filters.py)."""

import numpy as np

from cedarsim_tpu import (Circuit, VSource, VSourcePULSE, compile_circuit,
                          solve_dc, tran, ac, TranOptions)
from cedarsim_tpu.va.codegen import load_va

TRANS = """
module vatrans(inp, out);
  inout inp, out;
  electrical inp, out;
  parameter real td = 0.0;
  parameter real tt = 10e-6;
  parameter real tf = 0.0;
  analog V(out) <+ transition(V(inp), td, tt, (tf > 0.0) ? tf : tt);
endmodule
"""


def _ckt(vsrc_params, pulse=True, **devp):
    devs = load_va(TRANS, transition_mode="latch")
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourcePULSE if pulse else VSource, "V1", (vin, ckt.gnd),
            vsrc_params)
    ckt.add(devs["vatrans"], "F1", (vin, vout), devp)
    return compile_circuit(ckt)


def test_latch_ramp_is_linear():
    """Fast input edge at 20 µs, tt = 10 µs: the output is the exact
    linear ramp 0 → 3.3 V over [20, 30] µs — quarter points on the line
    (the exponential shaper would sit at 90% by midpoint)."""
    c = _ckt(dict(v1=0.0, v2=3.3, td=2e-5, tr=1e-9, pw=1e-3, per=2e-3),
             td=0.0, tt=1e-5)
    sol = tran(c, (0.0, 6e-5),
               opts=TranOptions(rtol=1e-5, atol=1e-8, max_steps=16384))
    assert bool(sol.converged)
    t0 = 2e-5
    for fr in (0.25, 0.5, 0.75):
        got = float(sol.interp("vout", t0 + fr * 1e-5))
        assert abs(got - 3.3 * fr) < 0.05, (fr, got)
    assert abs(float(sol.interp("vout", t0 + 1.05e-5)) - 3.3) < 1e-6
    assert abs(float(sol.interp("vout", 1.9e-5))) < 1e-9  # quiet before


def test_latch_interrupted_ramp():
    """Input falls back at 25 µs, mid-ramp: the running ramp's current
    value (~1.65 V) becomes the new start and the fall ramp takes the
    full fall time from there (LRM interrupted-transition rule)."""
    c = _ckt(dict(v1=0.0, v2=3.3, td=2e-5, tr=1e-9, tf=1e-9, pw=5e-6,
                  per=2e-3),
             td=0.0, tt=1e-5)
    sol = tran(c, (0.0, 6e-5),
               opts=TranOptions(rtol=1e-5, atol=1e-8, max_steps=16384))
    assert bool(sol.converged)
    peak = float(sol.interp("vout", 2.5e-5))
    assert abs(peak - 1.65) < 0.05, peak
    # fall ramp: from ~1.65 at 25 µs to 0 at 35 µs; midpoint 30 µs
    mid = float(sol.interp("vout", 3.0e-5))
    assert abs(mid - peak / 2) < 0.05, (mid, peak)
    assert abs(float(sol.interp("vout", 3.6e-5))) < 0.02


def test_latch_asymmetric_rise_fall():
    """Separate rise (10 µs) and fall (2 µs) durations."""
    c = _ckt(dict(v1=0.0, v2=2.0, td=1e-5, tr=1e-9, tf=1e-9, pw=2e-5,
                  per=2e-3),
             td=0.0, tt=1e-5, tf=2e-6)
    sol = tran(c, (0.0, 5e-5),
               opts=TranOptions(rtol=1e-5, atol=1e-8, max_steps=16384))
    assert bool(sol.converged)
    # rise completes at 20 µs; fall starts at 30 µs, done by 32 µs
    assert abs(float(sol.interp("vout", 2.05e-5)) - 2.0) < 1e-6
    assert abs(float(sol.interp("vout", 3.1e-5)) - 1.0) < 0.06
    assert abs(float(sol.interp("vout", 3.3e-5))) < 0.02


def test_latch_dc_and_ac_are_identity():
    c = _ckt(dict(dc=1.7, ac=1.0), pulse=False, td=0.0, tt=1e-5)
    r = solve_dc(c)
    assert bool(r.converged)
    assert abs(float(np.asarray(r.x)[c.node_names.index("vout")])
               - 1.7) < 1e-9
    sol = ac(c, np.array([1e3, 1e6]))
    assert np.allclose(np.asarray(sol["vout"]), 1.0, atol=1e-9)


def test_latch_state_checkpoints():
    """Resume mid-ramp: the latched (target, y_start, t_start) ride the
    checkpoint, so the seam lands on the same line."""
    c = _ckt(dict(v1=0.0, v2=3.3, td=2e-5, tr=1e-9, pw=1e-3, per=2e-3),
             td=0.0, tt=1e-5)
    opts = TranOptions(rtol=1e-5, atol=1e-8, max_steps=16384)
    ref = tran(c, (0.0, 4e-5), opts=opts)
    s1 = tran(c, (0.0, 2.4e-5), opts=opts)   # stop mid-ramp
    s2 = tran(c, (2.4e-5, 4e-5), opts=opts, resume=s1.checkpoint)
    assert bool(s2.converged)
    for t in (2.6e-5, 2.8e-5, 3.2e-5):
        a = float(ref.interp("vout", t))
        b = float(s2.interp("vout", t))
        assert abs(a - b) < 0.02, (t, a, b)
