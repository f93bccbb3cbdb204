"""Analytic golden tests — assertions ported (as data) from the reference's
test suite: /root/reference/test/basic.jl (VR, IR, VRC, ParallelInstances)."""

import numpy as np
import pytest

from cedarsim_tpu import (
    Circuit, Resistor, Capacitor, VSource, ISource,
    compile_circuit, solve_dc, tran, TranOptions,
)

DEFTOL = dict(rtol=1e-6, atol=1e-8)


def test_simple_vr_circuit():
    # V=5 across R=2 → I = 2.5  (reference test/basic.jl:22-43)
    ckt = Circuit()
    vcc = ckt.net("vcc")
    ckt.add(VSource, "V", (vcc, ckt.gnd), dict(dc=5.0))
    ckt.add(Resistor, "R", (vcc, ckt.gnd), dict(r=2.0))
    c = compile_circuit(ckt)
    res = solve_dc(c)
    assert bool(res.converged)
    x = np.asarray(res.x)
    v = x[c.node_names.index("vcc")]
    assert np.isclose(v, 5.0, **DEFTOL)
    # current through R
    obs = c.observe("R.I")
    import jax.numpy as jnp
    from cedarsim_tpu import SimSpec
    i = float(obs(res.x, jnp.zeros_like(res.x), SimSpec.make(), None))
    assert np.isclose(i, 2.5, **DEFTOL)


def test_simple_ir_circuit():
    # I=-5 into R=2 → V = 10  (reference test/basic.jl:84-107, SPICE sign
    # convention: negative current flows from - to + terminal)
    ckt = Circuit()
    icc = ckt.net("icc")
    ckt.add(ISource, "I", (icc, ckt.gnd), dict(dc=-5.0))
    ckt.add(Resistor, "R", (icc, ckt.gnd), dict(r=2.0))
    c = compile_circuit(ckt)
    res = solve_dc(c)
    assert bool(res.converged)
    v = np.asarray(res.x)[c.node_names.index("icc")]
    assert np.isclose(v, 10.0, **DEFTOL)


def _vrc_circuit(m=1.0):
    v_val, r_val, c_val = 5.0, 2000.0, 1e-6
    ckt = Circuit()
    vcc, vrc = ckt.net("vcc"), ckt.net("vrc")
    ckt.add(VSource, "V", (vcc, ckt.gnd), dict(dc=v_val))
    ckt.add(Resistor, "R", (vcc, vrc), dict(r=r_val), m=m)
    ckt.add(Capacitor, "C", (vrc, ckt.gnd), dict(c=c_val))
    return ckt, v_val, r_val, c_val


def test_simple_vrc_transient():
    # RC charge from uncharged cap: i(0)=V/R, v(∞)=V
    # (reference test/basic.jl:109-141, u0=[0.0])
    ckt, v_val, r_val, c_val = _vrc_circuit()
    ckt.ic("vrc", 0.0)
    c = compile_circuit(ckt)
    sol = tran(c, (0.0, 1.0))
    assert sol.converged
    c_i = sol["C.I"]
    c_v = sol["C.V"]
    assert np.isclose(c_i[0], v_val / r_val, rtol=1e-4)
    assert np.isclose(c_i[-1], 0.0, atol=1e-6)
    assert np.isclose(c_v[0], 0.0, atol=1e-6)
    assert np.isclose(c_v[-1], v_val, rtol=1e-6)
    # full analytic waveform check: v(t) = V(1 - exp(-t/RC))
    tau = r_val * c_val
    ref = v_val * (1 - np.exp(-sol.ts / tau))
    assert np.allclose(c_v, ref, atol=5e-3 * v_val)


def test_parallel_instances():
    # m=10 resistors in parallel: i(0) = 10·V/R
    # (reference test/basic.jl:143-166)
    ckt, v_val, r_val, c_val = _vrc_circuit(m=10.0)
    ckt.ic("vrc", 0.0)
    c = compile_circuit(ckt)
    sol = tran(c, (0.0, 1.0))
    assert sol.converged
    c_i = sol["C.I"]
    assert np.isclose(c_i[0], 10 * v_val / r_val, rtol=1e-4)
    assert np.isclose(sol["C.V"][-1], v_val, rtol=1e-6)


def test_voltage_divider_dc():
    ckt = Circuit()
    vin, mid = ckt.net("vin"), ckt.net("mid")
    ckt.add(VSource, "V", (vin, ckt.gnd), dict(dc=1.0))
    ckt.add(Resistor, "R1", (vin, mid), dict(r=1000.0))
    ckt.add(Resistor, "R2", (mid, ckt.gnd), dict(r=3000.0))
    c = compile_circuit(ckt)
    res = solve_dc(c)
    assert bool(res.converged)
    assert np.isclose(np.asarray(res.x)[c.node_names.index("mid")], 0.75,
                      **DEFTOL)
