"""Build an N-cell DFF shift-register netlist (level-1 models) — the
large-circuit scaling workload for the sparse Newton path.  Each cell is the
gf180 dffnq_4 topology (~38 transistors, ~13 unknowns); Q of cell k drives D
of cell k+1, all cells share CLKN.  n_x grows ~13.3 per cell: 80 cells ≈
1100 unknowns."""

import os

D = os.path.dirname(os.path.abspath(__file__))


def chain_netlist(n_cells: int, tstop=2e-7, models="lv1") -> str:
    """``models``: "lv1" (level-1 substitutes) or "bsim4" (the in-tree
    BSIM4-class VA compact model) — same cell topology, model cards swap
    by include."""
    with open(os.path.join(D, "dffnq_cell.spice")) as f:
        body = f.read()
    lines = [
        f"* {n_cells}-cell DFF shift register ({models} models)",
        ".option gmin=1e-15",
        f'.include "models_{models}.spice"',
        ".subckt dffnq D CLKN Q VDD VNW VPW VSS",
        body,
        ".ends",
        "VVDD VDD 0 5.0",
        "VVSS VSS 0 0.0",
        "VNW VNW VDD 0",
        "VPW VPW VSS 0",
        "VCLKN CLKN 0 PULSE(5 0 20n 1n 1n 25n 50n)",
        "VD d0 0 PULSE(0 5 45n 1n 1n 50n 100n)",
    ]
    for k in range(n_cells):
        lines.append(
            f"XD{k} d{k} CLKN d{k + 1} VDD VNW VPW VSS dffnq")
        lines.append(f"CL{k} d{k + 1} 0 5e-15")
    lines.append(f".tran 1n {tstop}")
    lines.append(".end")
    return "\n".join(lines)


def build(n_cells: int, sparse="auto", models="lv1", **kw):
    from cedarsim_tpu import parse_spice, elaborate, compile_circuit
    nl = parse_spice(chain_netlist(n_cells, models=models),
                     file=f"chain{n_cells}_{models}.cir")
    ckt = elaborate(nl, include_paths=[D])
    return compile_circuit(ckt, sparse=sparse, **kw)
