"""Netlist-keyed artifact cache (SURVEY.md §5): DC operating points are
stored under a content hash and replayed as warm starts."""

import numpy as np

from cedarsim_tpu import (Circuit, Resistor, VSource, Diode, compile_circuit,
                          solve_dc, SimSpec)
from cedarsim_tpu.utils import artifacts


def _ckt(r=1000.0):
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=2.0))
    ckt.add(Resistor, "R1", (vin, vout), dict(r=r))
    ckt.add(Diode, "D1", (vout, ckt.gnd), {"is": 1e-14, "n": 1.0})
    return compile_circuit(ckt)


def test_op_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("CEDARSIM_TPU_ARTIFACTS", str(tmp_path))
    c = _ckt()
    ctx = SimSpec.make(gmin=1e-12)
    r1 = solve_dc(c, ctx=ctx)
    assert bool(r1.converged)
    key = artifacts.op_key(c, c.params0, ctx.with_mode("dcop"), "dcop")
    stored = artifacts.load_op(key)
    assert stored is not None
    assert np.allclose(stored, np.asarray(r1.x))

    # warm-started second solve converges to the same point
    r2 = solve_dc(c, ctx=ctx)
    assert bool(r2.converged)
    assert np.abs(np.asarray(r2.x) - np.asarray(r1.x)).max() < 1e-9


def test_op_cache_key_tracks_params_and_structure(tmp_path, monkeypatch):
    monkeypatch.setenv("CEDARSIM_TPU_ARTIFACTS", str(tmp_path))
    ctx = SimSpec.make(gmin=1e-12).with_mode("dcop")
    a = _ckt(r=1000.0)
    b = _ckt(r=2000.0)
    ka = artifacts.op_key(a, a.params0, ctx, "dcop")
    kb = artifacts.op_key(b, b.params0, ctx, "dcop")
    assert ka != kb
    # a different gmin must also miss
    ctx2 = SimSpec.make(gmin=1e-9).with_mode("dcop")
    assert artifacts.op_key(a, a.params0, ctx2, "dcop") != ka


def test_op_cache_disabled(tmp_path, monkeypatch):
    monkeypatch.setenv("CEDARSIM_TPU_ARTIFACTS", "0")
    c = _ckt()
    r = solve_dc(c, ctx=SimSpec.make(gmin=1e-12))
    assert bool(r.converged)
    assert artifacts.cache_dir() is None
