"""VA live-reload (SURVEY.md §2.8, the reference's Revise .va integration)."""

import os
import time

import numpy as np

from cedarsim_tpu import Circuit, VSource, Resistor, compile_circuit, solve_dc
from cedarsim_tpu.va.reload import VAWatch

_RES = """
`include "disciplines.vams"
module myres(p, n);
  inout p, n;
  electrical p, n;
  parameter real r = {rval};
  analog I(p, n) <+ V(p, n) / r;
endmodule
"""


def _mid_voltage(cls):
    """2 V source over [VA resistor @default r] + 1 kΩ — divider midpoint."""
    ckt = Circuit()
    vin, mid = ckt.net("vin"), ckt.net("mid")
    ckt.add(VSource, "V1", (vin, ckt.gnd), dict(dc=2.0))
    ckt.add(cls, "R1", (vin, mid), {})
    ckt.add(Resistor, "R2", (mid, ckt.gnd), dict(r=1000.0))
    res = solve_dc(compile_circuit(ckt))
    assert bool(res.converged)
    return float(np.asarray(res.x)[ckt._nets["mid"].index])


def test_watch_reload(tmp_path):
    path = tmp_path / "myres.va"
    path.write_text(_RES.format(rval="1000.0"))
    w = VAWatch(str(path))
    assert "myres" in w.classes
    assert not w.reload()
    assert abs(_mid_voltage(w.classes["myres"]) - 1.0) < 1e-6  # 1k/1k

    # edit on disk -> reload picks up the new default
    time.sleep(0.02)
    path.write_text(_RES.format(rval="3000.0"))
    os.utime(path)
    assert w.changed()
    assert w.reload()
    assert abs(_mid_voltage(w.classes["myres"]) - 0.5) < 1e-6  # 3k/1k
    assert not w.reload()
