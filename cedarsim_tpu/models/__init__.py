"""Vendored compact models compiled through the Verilog-A pipeline.

``bsim4.va`` is an original BSIM4-class implementation (see its header);
the frontend maps ``.model ... nmos/pmos level=8/14/49/53/54`` onto it,
mirroring the reference's ``spice_select_device`` level table
(/root/reference/src/spectre.jl:589-630 — level 14/54 -> bsim4 there; the
BSIM3 levels map onto the same shared core here via parameter aliases).
"""

from __future__ import annotations

import os

_CACHE: dict = {}


def bsim4_class():
    """Compile (once per process) and return the BSIM4 DeviceModel class."""
    return _load("bsim4")


def vbic_class():
    """Compile (once per process) and return the VBIC DeviceModel class
    (``vbic.va`` — BJT levels 4/9 and the Spectre ``vbic`` master; the
    reference leaves every non-GP BJT unimplemented, spectre.jl:606-630)."""
    return _load("vbic")


def _load(name):
    if name not in _CACHE:
        from cedarsim_tpu.va.codegen import load_va
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            name + ".va")
        with open(path) as f:
            _CACHE[name] = load_va(f.read(), path)[name]
    return _CACHE[name]
