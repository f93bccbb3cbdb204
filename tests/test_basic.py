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


def test_dc_result_named_access():
    # res["name"] observable UX on operating points — the reference's
    # sol[sys.vout] access (/root/reference/src/circsummary.jl)
    ckt = Circuit()
    vcc = ckt.net("vcc")
    ckt.add(VSource, "V", (vcc, ckt.gnd), dict(dc=5.0))
    ckt.add(Resistor, "R", (vcc, ckt.gnd), dict(r=2.0))
    c = compile_circuit(ckt)
    res = solve_dc(c)
    assert np.isclose(float(res["vcc"]), 5.0, **DEFTOL)
    assert np.isclose(float(res["R.I"]), 2.5, **DEFTOL)
    # a raw pytree (no attached context) refuses with a clear error
    from cedarsim_tpu.analysis.dc import DCResult
    bare = DCResult(res.x, res.converged, res.iters, res.resnorm)
    with pytest.raises(TypeError):
        bare["vcc"]


def test_dc_sweep_named_access():
    # batched named access: one value per sweep lane, per-lane params
    from cedarsim_tpu.analysis.sweeps import Sweep, dc_sweep
    ckt = Circuit()
    vin, vmid = ckt.net("vin"), ckt.net("vmid")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=1.0))
    ckt.add(Resistor, "R1", (vin, vmid), dict(r=1e3))
    ckt.add(Resistor, "R2", (vmid, ckt.gnd), dict(r=1e3))
    comp = compile_circuit(ckt)
    r2s = np.array([500.0, 1000.0, 2000.0])
    res = dc_sweep(comp, Sweep("R2.r", r2s))
    assert np.allclose(res["vmid"], r2s / (1000.0 + r2s), rtol=1e-8)
    # branch current through the swept R2 uses the per-lane resistance
    assert np.allclose(res["R2.I"], (1.0 / (1000.0 + r2s)), rtol=1e-8)


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


def test_functional_devices():
    """OpenCircuit / ShortCircuit / nonlinear_resistor / nonlinear_capacitor
    (reference simpledevices.jl:79-97): short merges nets, open contributes
    nothing, NL resistor solves i = k·v² against a closed form."""
    import jax.numpy as jnp
    from cedarsim_tpu.devices import (OpenCircuit, ShortCircuit,
                                      nonlinear_resistor,
                                      nonlinear_capacitor)
    # 2 V source -- 1 kΩ -- [short] -- NLR with i = 1e-3·v²  (plus an open
    # hanging off the middle node).  KCL: (2−v)/1000 = 1e-3·v² → v = 1.
    NLR = nonlinear_resistor(lambda v: 1e-3 * v * v)
    ckt = Circuit()
    a, b, c_ = ckt.net("a"), ckt.net("b"), ckt.net("c")
    ckt.add(VSource, "V1", (a, ckt.gnd), dict(dc=2.0))
    ckt.add(Resistor, "R1", (a, b), dict(r=1000.0))
    ckt.add(ShortCircuit, "S1", (b, c_), {})
    ckt.add(OpenCircuit, "O1", (b, ckt.gnd), {})
    ckt.add(NLR, "N1", (c_, ckt.gnd), {})
    comp = compile_circuit(ckt)
    res = solve_dc(comp)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert abs(x[comp.node_names.index("b")] - 1.0) < 1e-6
    assert abs(x[comp.node_names.index("c")] - 1.0) < 1e-6

    # NL capacitor Q = 1e-9·v³ on an RC: C_eff(v) = 3e-9·v², check the
    # transient against a tiny-step reference of dv/dt = (vin−v)/(R·C(v))
    NLC = nonlinear_capacitor(lambda v: 1e-9 * v ** 3)
    ck2 = Circuit()
    vin, vo = ck2.net("vin"), ck2.net("vo")
    ck2.add(VSource, "V1", (vin, ck2.gnd), dict(dc=2.0))
    ck2.add(Resistor, "R1", (vin, vo), dict(r=1e3))
    ck2.add(NLC, "C1", (vo, ck2.gnd), {})
    ck2.ic("vo", 0.5)
    c2 = compile_circuit(ck2)
    sol = tran(c2, (0.0, 1e-5), opts=TranOptions(uic=True))
    assert sol.converged
    # dense-step odeint reference
    v, dt = 0.5, 1e-9
    for _ in range(int(3e-6 / dt)):
        v += dt * (2.0 - v) / (1e3 * 3e-9 * v * v)
    got = float(sol.interp("vo", 3e-6))
    assert abs(got - v) < 5e-3 * max(1.0, abs(v)), (got, v)
