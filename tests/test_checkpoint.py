"""Solver-state checkpoint/resume (SURVEY.md §5 — a capability the reference
lacks: its transients restart from t=0 on any interruption)."""

import math

import numpy as np

from cedarsim_tpu import (Circuit, Resistor, Capacitor, VSourcePULSE,
                          compile_circuit, tran, save_checkpoint,
                          load_checkpoint)


def _rc():
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourcePULSE, "Vin", (vin, ckt.gnd),
            dict(v1=0.0, v2=3.3, td=1e-6, tr=1e-9, tf=1e-9, pw=4e-6,
                 per=10e-6))
    ckt.add(Resistor, "R1", (vin, vout), dict(r=1000.0))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=1e-9))
    return compile_circuit(ckt)


def test_resume_continues_the_physics(tmp_path):
    c = _rc()
    # segment 1: stop mid-ramp at 2 us (1 tau past the step edge)
    s1 = tran(c, (0.0, 2e-6))
    assert s1.converged
    ck = s1.checkpoint
    assert abs(float(ck["t"]) - 2e-6) < 1e-8

    # round-trip through disk
    path = tmp_path / "seg1.npz"
    save_checkpoint(path, ck)
    ck2 = load_checkpoint(path)
    assert set(ck2) == set(ck)

    # segment 2 resumes; a reference run covers the whole span at once
    s2 = tran(c, (0.0, 8e-6), resume=ck2)
    assert s2.converged
    ref = tran(c, (0.0, 8e-6))
    for t in (3e-6, 4.9e-6):
        v2 = float(s2.interp("vout", t))
        vr = float(ref.interp("vout", t))
        exact = 3.3 * (1 - math.exp(-(t - 1.0005e-6) / 1e-6))
        assert abs(v2 - exact) < 0.02, (t, v2, exact)
        assert abs(v2 - vr) < 0.02, (t, v2, vr)
    # resumed segment starts where the checkpoint left off
    assert s2.ts[0] >= 2e-6 - 1e-9


def test_resume_past_tstop_raises():
    c = _rc()
    s1 = tran(c, (0.0, 2e-6))
    try:
        tran(c, (0.0, 1e-6), resume=s1.checkpoint)
    except ValueError as e:
        assert "past" in str(e)
    else:
        raise AssertionError("expected ValueError")
