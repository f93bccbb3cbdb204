"""explore(): batched slider-grid simulation → self-contained HTML viewer
(reference explore(), /root/reference/ext/CedarSimMakieExt.jl — redesigned
as one vmapped program over the whole grid instead of a re-sim per slider
move)."""

import json
import re

import numpy as np

from cedarsim_tpu import (Circuit, Resistor, Capacitor, VSourcePULSE,
                          compile_circuit)
from cedarsim_tpu.utils.explore import explore


def test_explore_grid_physics(tmp_path):
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourcePULSE, "Vin", (vin, ckt.gnd),
            dict(v1=0.0, v2=1.0, td=1e-7, tr=1e-9, tf=1e-9, pw=1e-5,
                 per=2e-5))
    ckt.add(Resistor, "R1", (vin, vout), dict(r=1000.0))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=1e-9))
    c = compile_circuit(ckt, dynamic_params=["r"])

    path = tmp_path / "explore.html"
    explore(c, (0.0, 8e-6), {"R1.r": [1000.0, 4000.0]}, ["vout"],
            path=str(path), n_samples=200)
    text = path.read_text()
    assert 'input type="range"' in text

    payload = json.loads(
        re.search(r"const D = (\{.*?\});\n", text, re.S).group(1))
    t = np.asarray(payload["t"])
    v = np.asarray(payload["series"]["vout"])       # [2 lanes, 200]
    assert v.shape[0] == 2
    # both lanes settle at 1.0; the 4k lane (tau=4us) lags the 1k lane
    i2us = int(np.searchsorted(t, 2e-6))
    assert v[0, -1] > 0.95 and v[1, -1] > 0.8
    assert v[0, i2us] > v[1, i2us] + 0.2
    # physics: 1k lane at t=1.1us (1 tau past edge) ~ 1-exp(-1)
    i11 = int(np.searchsorted(t, 1.1e-6))
    assert abs(v[0, i11] - (1 - np.exp(-1.0))) < 0.05
