"""Vendored compact models compiled through the Verilog-A pipeline.

``bsim4.va`` is an original BSIM4-class implementation (see its header);
the frontend maps ``.model ... nmos/pmos level=8/14/49/53/54`` onto it,
mirroring the reference's ``spice_select_device`` level table
(/root/reference/src/spectre.jl:589-630 — level 14/54 -> bsim4 there; the
BSIM3 levels map onto the same shared core here via parameter aliases).
"""

from __future__ import annotations

import os

_HERE = os.path.dirname(os.path.abspath(__file__))

#: vendored CMC BSIM-CMG 107 sources (third-party, see its README.md) —
#: netlists reach them with ``.hdl "bsimcmg.va"``: the elaborator's file
#: resolution falls back to the in-tree model directories, the analog of
#: the reference's jlpkg:// package-model resolution
#: (/root/reference/src/spectre.jl:1276-1311)
BSIMCMG107_DIR = os.path.join(_HERE, "bsimcmg107")

#: implicit include-path tail searched by the elaborator for model files
MODEL_SEARCH_PATHS = (_HERE, BSIMCMG107_DIR)

_CACHE: dict = {}


def bsim4_class(rdsmod: int = 0):
    """Compile (once per process per variant) and return the BSIM4
    DeviceModel class.  ``rdsmod=1`` compiles the external-S/D-resistance
    variant (internal diffusion nodes di/si, selected by the
    BSIM4_RDSMOD1 preprocessor define) so rdsMod=0 circuits pay zero
    extra unknowns."""
    if rdsmod not in (0, 1):
        raise ValueError(f"bsim4: RDSMOD must be 0 or 1, got {rdsmod}")
    return _load("bsim4", ("BSIM4_RDSMOD1",) if rdsmod else ())


def vbic_class():
    """Compile (once per process) and return the VBIC DeviceModel class
    (``vbic.va`` — BJT levels 4/9 and the Spectre ``vbic`` master; the
    reference leaves every non-GP BJT unimplemented, spectre.jl:606-630)."""
    return _load("vbic")


def bsimcmg_class():
    """Compile (once per process) and return the vendored CMC BSIM-CMG 107
    DeviceModel class — the target of ``.model ... level=17/72`` cards and
    Spectre ``bsimcmg`` masters (the reference's spice_select_device maps
    those levels to bsimcmg107, /root/reference/src/spectre.jl:599-607;
    the ASAP7 decks use this path)."""
    key = ("bsimcmg", ())
    if key not in _CACHE:
        from cedarsim_tpu.va.codegen import load_va
        path = os.path.join(BSIMCMG107_DIR, "bsimcmg.va")
        with open(path) as f:
            _CACHE[key] = load_va(f.read(), path,
                                  include_paths=(BSIMCMG107_DIR,))["bsimcmg"]
    return _CACHE[key]


def _load(name, defines=()):
    key = (name, tuple(defines))
    if key not in _CACHE:
        from cedarsim_tpu.va.codegen import load_va
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            name + ".va")
        with open(path) as f:
            _CACHE[key] = load_va(f.read(), path, defines=defines)[name]
    return _CACHE[key]
