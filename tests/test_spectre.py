"""Spectre dialect tests: instance/parameters/analysis syntax, primitive
masters, model masters, and mixed-language switching
(/root/reference/SpectreNetlistParser.jl forms + test/)."""

import numpy as np

from cedarsim_tpu import simulate
from cedarsim_tpu.frontend.spectre import parse_spectre


def test_spectre_divider_dc():
    code = """// spectre divider
simulator lang=spectre
parameters rtop=1k rbot=3k
v1 (vin 0) vsource dc=2
r1 (vin vmid) resistor r=rtop
r2 (vmid 0) resistor r=rbot
op1 dc
"""
    res = simulate(code, dialect="spectre")
    c = res["compiled"]
    x = np.asarray(res["op"].x)
    assert bool(res["op"].converged)
    assert np.isclose(x[c.node_names.index("vmid")], 1.5, rtol=1e-9)


def test_spectre_subckt_and_tran():
    code = """// spectre rc
simulator lang=spectre
subckt lowpass (in out)
parameters r=1k c=1u
r1 (in out) resistor r=r
c1 (out 0) capacitor c=c
ends lowpass
v1 (vin 0) vsource type=pulse val0=0 val1=1 delay=1m rise=1u fall=1u width=10m
x1 (vin vout) lowpass r=2k
tran1 tran stop=5m
"""
    res = simulate(code, dialect="spectre")
    sol = res["tran"]
    assert sol.converged
    # tau = 2k*1u = 2ms; at t=1m+2m, v = 1-e^-1
    v = sol.interp("vout", 3e-3)
    assert np.isclose(v, 1 - np.exp(-1), atol=0.02)


def test_mixed_language():
    code = """* spice section first
V1 a 0 1
R1 a b 1k
simulator lang=spectre
r2 (b 0) resistor r=1k
op1 dc
"""
    res = simulate(code, dialect="spice")
    c = res["compiled"]
    x = np.asarray(res["op"].x)
    assert np.isclose(x[c.node_names.index("b")], 0.5, rtol=1e-9)


def test_spectre_model_master():
    code = """// model master
simulator lang=spectre
model mynmos nmos (level=1 vto=0.7 kp=100u)
v1 (vdd 0) vsource dc=3.3
v2 (g 0) vsource dc=3.3
r1 (vdd d) resistor r=10k
m1 (d g 0 0) mynmos w=10u l=1u
op1 dc
"""
    res = simulate(code, dialect="spectre")
    c = res["compiled"]
    x = np.asarray(res["op"].x)
    assert bool(res["op"].converged)
    # strong NMOS pulls d low
    assert x[c.node_names.index("d")] < 0.5


def test_spectre_user_function():
    # reference FunctionDecl (SpectreNetlistParser forms.jl:145)
    import numpy as np
    from cedarsim_tpu import simulate
    src = """// user functions
simulator lang=spectre
real rscale(real base, real k) {
    return base * k + 100;
}
parameters rbase=1k rk=2
V1 (in 0) vsource dc=2.1
R1 (in out) resistor r=rscale(rbase, rk)
R2 (out 0) resistor r=rscale(rbase, rk)
"""
    res = simulate(src, dialect="spectre")
    c = res["compiled"]
    v = np.asarray(res["op"].x)[c.node_names.index("out")]
    assert abs(v - 1.05) < 1e-6          # equal divider → vin/2


def test_spectre_inline_subckt():
    import numpy as np
    from cedarsim_tpu import simulate
    src = """// inline subckt
simulator lang=spectre
inline subckt myres (p n)
parameters r=1k
myres (p n) resistor r=r
ends myres
V1 (in 0) vsource dc=1.0
X1 (in mid) myres r=2k
X2 (mid 0) myres r=2k
"""
    res = simulate(src, dialect="spectre")
    c = res["compiled"]
    v = np.asarray(res["op"].x)[c.node_names.index("mid")]
    assert abs(v - 0.5) < 1e-9


def test_spectre_altergroup_applies():
    import numpy as np
    from cedarsim_tpu import simulate
    src = """// altergroup
simulator lang=spectre
parameters rr=1k
V1 (in 0) vsource dc=1.0
R1 (in out) resistor r=rr
R2 (out 0) resistor r=1k
op1 op
ag1 altergroup {
parameters rr=3k
}
op2 op
"""
    res = simulate(src, dialect="spectre")
    c0 = res["compiled"]
    v0 = np.asarray(res["op"].x)[c0.node_names.index("out")]
    assert abs(v0 - 0.5) < 1e-9          # 1k/1k divider
    c1 = res["compiled@ag1"]
    v1 = np.asarray(res["op@ag1"].x)[c1.node_names.index("out")]
    assert abs(v1 - 0.25) < 1e-9         # 3k/1k divider


def test_spectre_alter_device_param():
    import numpy as np
    from cedarsim_tpu import simulate
    src = """// device alter
simulator lang=spectre
V1 (in 0) vsource dc=1.0
R1 (in out) resistor r=1k
R2 (out 0) resistor r=1k
op1 op
a1 alter dev=r2 param=r value=3k
op2 op
"""
    res = simulate(src, dialect="spectre")
    c0 = res["compiled"]
    v0 = np.asarray(res["op"].x)[c0.node_names.index("out")]
    assert abs(v0 - 0.5) < 1e-9
    c1 = res["compiled@a1"]
    v1 = np.asarray(res["op@a1"].x)[c1.node_names.index("out")]
    assert abs(v1 - 0.75) < 1e-9         # r2 = 3k


# ----------------------------------------------------- statistics blocks

STATS_DECK = """// stats
simulator lang=spectre
parameters r0=1k c0=1p
statistics {
   process {
      vary r0 dist=gauss std=100
   }
   mismatch {
      vary r0 dist=gauss std=10
   }
}
i1 (0 a) isource dc=1m
r1 (a 0) resistor r=r0
"""


def _stats_rval(seed):
    import numpy as np
    from cedarsim_tpu import SimSpec, compile_circuit, elaborate, solve_dc
    comp = compile_circuit(elaborate(parse_spectre(STATS_DECK),
                                     mc_seed=seed))
    r = solve_dc(comp, ctx=SimSpec.make(gmin=1e-15))
    assert bool(r.converged)
    x = np.asarray(r.x)
    return float(x[comp.node_names.index("a")]) / 1e-3


def test_statistics_block_monte_carlo():
    """Spectre statistics{process/mismatch{vary}} blocks drive seeded
    Monte-Carlo parameter variation (beyond the reference: its parser has
    no statistics form).  Nominal elaboration ignores them; a seeded one
    applies process draws from the elaboration RNG and mismatch draws
    keyed per instance, reproducibly."""
    import numpy as np
    import zlib
    assert abs(_stats_rval(None) - 1000.0) < 1e-6
    v7a, v7b = _stats_rval(7), _stats_rval(7)
    assert v7a == v7b                       # reproducible
    rng = np.random.default_rng(7)
    nominal = 1000.0 + rng.normal(0, 100)   # process: global draw
    mm = np.random.default_rng(
        [7, zlib.crc32(b"r1"), zlib.crc32(b"r0")])
    expect = nominal + mm.normal(0, 10)     # mismatch: instance-keyed
    assert abs(v7a - expect) < 1e-6
    assert _stats_rval(8) != v7a            # seed changes the draw


def test_statistics_mismatch_per_instance_decorrelation():
    """Spectre mismatch semantics: each *instance* draws independently
    (the reference's per-instance agauss sampling from spec.rng,
    /root/reference/src/spectre_env.jl:178-187) while process draws are
    shared — two matched resistors decorrelate under mismatch, agree
    under process, and parameters *derived* from a mismatch-varied one
    decorrelate too.  No approximation warning is emitted."""
    import warnings as _w
    from cedarsim_tpu import elaborate
    deck = """// matched pair
simulator lang=spectre
parameters r0=1k rd=r0*2
statistics {
   process  { vary r0 dist=gauss std=100 }
   mismatch { vary r0 dist=gauss std=10 }
}
r1 (a 0) resistor r=r0
r2 (a 0) resistor r=r0
r3 (a 0) resistor r=rd
r4 (a 0) resistor r=rd
"""
    with _w.catch_warnings():
        _w.simplefilter("error")            # any warning fails the test
        ckt = elaborate(parse_spectre(deck), mc_seed=11)
        ckt_same = elaborate(parse_spectre(deck), mc_seed=11)
        ckt_proc = elaborate(parse_spectre(
            deck.replace("mismatch { vary r0 dist=gauss std=10 }", "")),
            mc_seed=11)
    r = {i.name: float(i.params["r"]) for i in ckt.instances}
    # matched direct consumers decorrelate...
    assert r["r1"] != r["r2"]
    # ...as do consumers of a DERIVED parameter (rd = r0*2 re-evaluates
    # per instance with the instance's own r0 draw)
    assert r["r3"] != r["r4"]
    assert abs(r["r3"] - 2000.0) < 600 and abs(r["r4"] - 2000.0) < 600
    # same seed reproduces every instance's draw exactly
    r_same = {i.name: float(i.params["r"]) for i in ckt_same.instances}
    assert r == r_same
    # process-only: matched instances agree (shared draw), and that shared
    # value is the mismatch run's per-instance mean structure
    rp = {i.name: float(i.params["r"]) for i in ckt_proc.instances}
    assert rp["r1"] == rp["r2"]
    assert rp["r3"] == rp["r4"]
    assert abs(rp["r3"] - 2 * rp["r1"]) < 1e-9


def test_statistics_percent_and_undefined():
    """percent=yes scales std by |nominal|/100; varying an undefined
    parameter is an elaboration error with the netlist location."""
    import numpy as np
    import pytest
    from cedarsim_tpu import elaborate
    from cedarsim_tpu.frontend.elaborate import ElabError
    deck = """// stats pct
simulator lang=spectre
parameters r0=1k
statistics {
   process { vary r0 dist=gauss std=5 percent=yes }
}
r1 (a 0) resistor r=r0
"""
    ckt = elaborate(parse_spectre(deck), mc_seed=3)
    rng = np.random.default_rng(3)
    expect = 1000.0 + rng.normal(0, 50.0)   # 5 percent of 1k
    grp = [k for k in ckt.instances if True]
    # find the resistor's r parameter value
    inst = next(i for i in ckt.instances if i.name == "r1")
    assert abs(float(inst.params["r"]) - expect) < 1e-9
    bad = """// stats bad
simulator lang=spectre
statistics { process { vary nope dist=gauss std=1 } }
r1 (a 0) resistor r=1k
"""
    with pytest.raises(ElabError, match="nope"):
        elaborate(parse_spectre(bad), mc_seed=1)
