"""Sweep combinator semantics (reference test/sweep.jl:30-250) and batched
vmapped execution with per-point physics (test/sweep.jl:252-330)."""

import numpy as np

from cedarsim_tpu import (
    Sweep, ProductSweep, TandemSweep, SerialSweep, sweepify,
    compile_circuit, dc_sweep,
)
from cedarsim_tpu.frontend.elaborate import load_spice


def test_combinator_iteration():
    s1 = Sweep("a", [1, 2])
    s2 = Sweep("b", [10, 20, 30])
    prod = ProductSweep(s1, s2)
    assert len(prod) == 6
    pts = list(prod)
    assert pts[0] == {"a": 1, "b": 10}
    assert pts[-1] == {"a": 2, "b": 30}

    tand = TandemSweep(Sweep("a", [1, 2, 3]), Sweep("b", [4, 5, 6]))
    assert len(tand) == 3
    assert list(tand)[1] == {"a": 2, "b": 5}

    ser = SerialSweep(s1, s2)
    assert len(ser) == 5
    assert list(ser)[0] == {"a": 1}
    assert list(ser)[2] == {"b": 10}
    assert set(ser.names) == {"a", "b"}

    # dict shorthand is a product (reference sweepify, sweeps.jl:349-354)
    sw = sweepify({"a": [1, 2], "b": [3]})
    assert len(sw) == 2


def test_batched_dc_sweep_divider():
    code = """* divider
V1 vin 0 1
R1 vin vmid 1k
R2 vmid 0 1k
.op
"""
    comp = compile_circuit(load_spice(code))
    r2s = np.array([500.0, 1000.0, 2000.0, 4000.0])
    res = dc_sweep(comp, Sweep("r2.r", r2s))
    assert np.asarray(res.converged).all()
    i = comp.node_names.index("vmid")
    v = np.asarray(res.x)[:, i]
    ref = r2s / (1000.0 + r2s)
    assert np.allclose(v, ref, rtol=1e-8)


def test_product_sweep_2d():
    code = """* divider2
V1 vin 0 {vv}
R1 vin vmid 1k
R2 vmid 0 1k
.param vv=1
.op
"""
    comp = compile_circuit(load_spice(code))
    sweep = ProductSweep(Sweep("v1.dc", [1.0, 2.0]),
                         Sweep("r1.r", [1e3, 3e3]))
    res = dc_sweep(comp, sweep)
    v = np.asarray(res.x)[:, comp.node_names.index("vmid")]
    ref = [1 * 1e3 / 2e3, 1 * 1e3 / 4e3, 2 * 1e3 / 2e3, 2 * 1e3 / 4e3]
    assert np.allclose(v, ref, rtol=1e-8)


def test_monte_carlo_dc():
    # on-device Gaussian scatter of R2 -> distribution of divider output
    from cedarsim_tpu.analysis.montecarlo import mc_dc
    code = """* mc divider
V1 vin 0 1
R1 vin vmid 1k
R2 vmid 0 1k
.op
"""
    comp = compile_circuit(load_spice(code))
    n = 256
    res = mc_dc(comp, n, {"r2.r": ("rel", 0.05)}, seed=3)
    assert bool(np.asarray(res.converged).all())
    v = np.asarray(res.x)[:, comp.node_names.index("vmid")]
    # mean near 0.5, spread consistent with 5% sigma on R2:
    # dv/dR2 * sigma = 0.25/1k * 50 = 0.0125
    assert abs(v.mean() - 0.5) < 0.005
    assert 0.006 < v.std() < 0.02
    # reproducible by seed
    res2 = mc_dc(comp, n, {"r2.r": ("rel", 0.05)}, seed=3)
    assert np.allclose(np.asarray(res2.x), np.asarray(res.x))


def test_temperature_sweep_axis():
    # T axis of PVT: resistor tc1 makes the divider temp-dependent
    code = """* temp divider
V1 vin 0 1
R1 vin vmid 1k tc1=0.002 tnom=27
R2 vmid 0 1k
.op
"""
    comp = compile_circuit(load_spice(code))
    temps = [27.0, 77.0, 127.0]
    res = dc_sweep(comp, Sweep("temp", temps))
    assert np.asarray(res.converged).all()
    v = np.asarray(res.x)[:, comp.node_names.index("vmid")]
    r1 = 1e3 * (1 + 0.002 * (np.asarray(temps) - 27.0))
    ref = 1e3 / (r1 + 1e3)
    assert np.allclose(v, ref, rtol=1e-8)


def test_sweep_dc_on_wave_source_flips_given():
    """Explicitly setting/sweeping a waveform source's dc must mark it
    $given — devices switch on the mask (a PULSE source in DC mode uses
    the wave value at t=0 unless dc is given), so a swept dc was silently
    ignored before the mask co-dynamicization."""
    import numpy as np
    from cedarsim_tpu import (Circuit, Resistor, VSourcePULSE,
                              compile_circuit, SimSpec)
    from cedarsim_tpu.analysis.sweeps import Sweep, dc_sweep
    from cedarsim_tpu.core.compile import ensure_dynamic
    ckt = Circuit()
    vin, mid = ckt.net("vin"), ckt.net("mid")
    ckt.add(VSourcePULSE, "V1", (vin, ckt.gnd),
            dict(v1=0.0, v2=5.0, td=1e-9, tr=1e-9, tf=1e-9, pw=1e-6,
                 per=2e-6))
    ckt.add(Resistor, "R1", (vin, mid), dict(r=1e3))
    ckt.add(Resistor, "R2", (mid, ckt.gnd), dict(r=1e3))
    comp = ensure_dynamic(compile_circuit(ckt), ["V1.dc"])
    vals = np.array([0.0, 1.0, 2.0])
    res = dc_sweep(comp, Sweep("V1.dc", vals),
                   ctx=SimSpec.make(gmin=1e-12))
    mid_v = np.asarray(res.x)[:, ckt._nets["mid"].index]
    assert np.allclose(mid_v, vals / 2, atol=1e-9), mid_v


def test_find_param_ranges():
    from cedarsim_tpu.analysis.sweeps import (Sweep, ProductSweep,
                                              SerialSweep, find_param_ranges)
    s = ProductSweep(Sweep("r", [1.0, 2.0, 3.0]),
                     SerialSweep(Sweep("c", [5.0]), Sweep("c", [9.0])))
    r = find_param_ranges(s)
    assert r["r"] == (1.0, 3.0, 3)
    assert r["c"] == (5.0, 9.0, 2)


def test_mc_statistics_batched():
    """Spectre statistics-block Monte-Carlo as ONE vmapped program:
    per-seed elaborations are diffed to find the varied device params,
    stacked, and solved batched — each lane must land exactly on its own
    seeded draw (the serial re-elaborate loop's answer)."""
    import numpy as np
    from cedarsim_tpu.frontend.spectre import parse_spectre
    from cedarsim_tpu.analysis.montecarlo import mc_statistics
    scs = """// stats mc
simulator lang=spectre
parameters r0=1k
statistics {
   process { vary r0 dist=gauss std=100 }
   mismatch { vary r0 dist=gauss std=10 }
}
i1 (0 a) isource dc=1m
r1 (a 0) resistor r=r0
"""
    nl = parse_spectre(scs)
    n = 8
    res = mc_statistics(nl, n, seed=11)
    assert bool(np.asarray(res.converged).all())
    vals = np.asarray(res.x)[:, 0] / 1e-3
    import zlib
    for i in range(n):
        rng = np.random.default_rng(11 + i)
        mm = np.random.default_rng(
            [11 + i, zlib.crc32(b"r1"), zlib.crc32(b"r0")])
        # process: per-lane global draw; mismatch: instance-keyed draw
        expect = 1000.0 + rng.normal(0, 100) + mm.normal(0, 10)
        assert abs(vals[i] - expect) < 1e-4, (i, vals[i], expect)


def test_mc_statistics_structure_change_rejected():
    """A seed that flips circuit structure (here an .if on a sampled
    parameter) cannot batch and must raise, not silently mis-assemble."""
    import pytest
    from cedarsim_tpu import parse_spice
    from cedarsim_tpu.analysis.montecarlo import statistics_params
    code = """* structure flip
.param g={agauss(0,1,1)}
v1 a 0 1
.if (g > 0)
r1 a 0 1k
.else
c1 a 0 1n
.endif
.end
"""
    nl = parse_spice(code)
    with pytest.raises(ValueError, match="structure"):
        statistics_params(nl, 16, seed=0)
