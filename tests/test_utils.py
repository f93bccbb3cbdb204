"""Export / introspection tests (reference ext/CedarSimCSVExt.jl,
ParamObserver test/params.jl, aliasmap test/alias.jl)."""

import os
import numpy as np

from cedarsim_tpu import simulate
from cedarsim_tpu.utils.export import write_csv, save_html, default_name_map
from cedarsim_tpu.utils.inspect import (param_tree, flatten_param_list,
                                        nest_param_list, alias_map)


def _rc(tmp_path=None):
    return simulate("""* rc
V1 vin 0 PULSE(0 1 1m 1u 1u 10m 20m)
R1 vin vout 1k
C1 vout 0 1u
.tran 0.1m 5m
""")


def test_csv_and_html_export(tmp_path):
    res = _rc()
    sol = res["tran"]
    p = write_csv(tmp_path / "sol.csv", sol)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("time,")
    assert len(lines) == len(sol.ts) + 1
    h = save_html(tmp_path / "sol.html", sol)
    txt = open(h).read()
    assert "<svg" in txt and "polyline" in txt


def test_param_tree_and_flatten():
    res = simulate("""* tree
.subckt div a b rr=2k
R1 a b {rr}
R2 b 0 {rr}
.ends
V1 vin 0 1
X1 vin vmid div rr=5k
.op
""")
    tree = param_tree(res["circuit"])
    assert tree["x1"]["r1"]["r"] == 5000.0
    flat = flatten_param_list(tree)
    assert flat["x1.r2.r"] == 5000.0
    assert nest_param_list(flat)["x1"]["r1"]["r"] == 5000.0


def test_alias_map():
    res = simulate("""* alias
V1 a 0 1
R1 a gnd! 1k
.op
""")
    am = alias_map(res["circuit"])
    assert am.get("gnd!") == "0"
