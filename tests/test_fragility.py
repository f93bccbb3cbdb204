"""Initialization-fragility probe (reference dcop.jl:205-248 +
scratch/initialization_fragility.jl:57-76): vmapped randomized DC inits,
distinct-operating-point clustering, residual-norm scoring."""

import numpy as np

from cedarsim_tpu import Circuit, Resistor, VSource, compile_circuit, solve_dc
from cedarsim_tpu.devices import nonlinear_resistor
from cedarsim_tpu.analysis.fragility import init_fragility, initialization_norm


def _bistable():
    """One node with i = 1e-3*(v^3 - v) to ground: DC solutions v in
    {-1, 0, +1} — a minimal metastable circuit (three basins)."""
    NLR = nonlinear_resistor(lambda v: 1e-3 * (v ** 3 - v))
    ckt = Circuit()
    v = ckt.net("v")
    ckt.add(NLR, "N1", (v, ckt.gnd), {})
    return compile_circuit(ckt)


def test_fragility_finds_all_basins():
    comp = _bistable()
    rep = init_fragility(comp, n=48, sigma=1.0, seed=3)
    assert rep.converged_frac == 1.0
    assert rep.n_solutions == 3, rep.summary()
    vs = sorted(float(s[comp.node_names.index("v")]) for s in rep.solutions)
    assert np.allclose(vs, [-1.0, 0.0, 1.0], atol=1e-5), vs
    # every sample's solution is a genuine root
    assert rep.resnorm[rep.converged].max() < 1e-8
    assert "3 distinct operating point" in rep.summary()


def test_fragility_unique_solution_for_stable_circuit():
    ckt = Circuit()
    top, mid = ckt.net("top"), ckt.net("mid")
    ckt.add(VSource, "V1", (top, ckt.gnd), dict(dc=3.0))
    ckt.add(Resistor, "R1", (top, mid), dict(r=1000.0))
    ckt.add(Resistor, "R2", (mid, ckt.gnd), dict(r=1000.0))
    comp = compile_circuit(ckt)
    rep = init_fragility(comp, n=16, sigma=2.0, seed=0)
    assert rep.converged_frac == 1.0
    assert rep.n_solutions == 1
    assert abs(rep.solutions[0][comp.node_names.index("mid")] - 1.5) < 1e-6


def test_initialization_norm():
    comp = _bistable()
    op = solve_dc(comp)
    assert bool(op.converged)
    at_op = initialization_norm(comp, op.x)
    iv = comp.node_names.index("v")
    perturbed = np.asarray(op.x).copy()
    perturbed[iv] += 0.5
    assert at_op < 1e-10
    assert initialization_norm(comp, perturbed) > 1e-5
