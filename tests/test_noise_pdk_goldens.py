"""Cross-simulator noise goldens for the two PDK-level inverters.

The reference embeds three ngspice output-noise tables; the RLC one is
ported exactly (tests/test_ac_noise.py::test_rlc_noise_vs_ngspice_golden —
card-free, rtol 2e-6).  The remaining two are vendored here as data:

- gf180 6 V CMOS inverter (/root/reference/test/inverter_noise.jl:57-125)
  → tests/data_gf180_inverter_noise_ngspice.py
- ASAP7 BSIM-CMG FinFET inverter (/root/reference/test/ac.jl:176-250,
  circuit test/bsimcmg/inverter_cmg_cedar.cir)
  → tests/data_cmg_inverter_noise_ngspice.py

The CMG table's deck IS available: the reference's parser corpus carries
the ASAP7 TT cards in Spectre form (``7nm_TT.scs``, vendored at
tests/data/asap7/ — same card values as the ``7nm_TT.pm`` ngspice ran),
so the CMG test gates the full value-for-value golden at the reference's
rtol=1e-6 discipline (measured max rel err 7.9e-9, 2026-08-21).

The gf180 deck (GF180MCUPDK ``sm141064.ngspice``) does NOT exist in this
offline environment (the reference pulls it from an external Julia
package; SURVEY.md §2.13).  Its exact gate activates when a deck is
supplied via ``CEDARSIM_GF180_SM141064=/path/to/sm141064.ngspice``
(the reference's exact netlist at the reference's tolerance).

Without that deck, the gf180 test still gates hard — on the
card-INDEPENDENT structure both simulators must agree on, measured from
the table itself and from our analysis on the in-tree representative
cards:

- thermal plateau: flat to <0.5% below 1 MHz (gf180; the CMG table is
  flicker-dominated there and must instead show the f^-1/2 slope in
  sqrt-PSD);
- the high-frequency tail: PSD rolls off exactly f^-2 (sqrt f^-1) once
  above every device corner — the table's last three decades reproduce a
  1000x drop to <1%, and ours must too;
- magnitudes in the same physical regime: the plateau is 4kT-scale
  channel resistance noise, so our representative-card plateau must sit
  within 2x of the gf180 table's (measured 2026-08-21: within 10%).
"""

import os

import numpy as np
import pytest

from cedarsim_tpu import (parse_spice, elaborate, compile_circuit, SimSpec,
                          noise)

from tests.data_gf180_inverter_noise_ngspice import NGSPICE_GF180_INV_NOISE
from tests.data_cmg_inverter_noise_ngspice import NGSPICE_CMG_INV_NOISE

D = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "benchmarks", "gf180_dff")

GF180_TOPOLOGY = """* gf180 inverter noise TB (reference inverter_noise.jl)
{models}
Xneg VSS D Q VSS nfet_06v0 W=3.6e-07 L=6e-07
Xpos VDD D Q VDD pfet_06v0 W=4.95e-07 L=5e-07
VVDD VDD 0 5.0
VVSS VSS 0 0.0
CQ D 0 1e-15
VD D 0 0.0 AC 1
.end
"""


def _loglog_slope(f, s, f_lo, f_hi):
    m = (f >= f_lo) & (f <= f_hi)
    return np.polyfit(np.log10(f[m]), np.log10(s[m]), 1)[0]


def test_gf180_inverter_noise_vs_ngspice():
    freqs = np.array([r[0] for r in NGSPICE_GF180_INV_NOISE])
    ref = np.array([r[1] for r in NGSPICE_GF180_INV_NOISE])

    deck = os.environ.get("CEDARSIM_GF180_SM141064")
    if deck:
        # the reference's exact configuration and tolerance
        models = f'.lib "{deck}" typical'
    else:
        models = '.include "models_bsim4.spice"'
    nl = parse_spice(GF180_TOPOLOGY.format(models=models))
    comp = compile_circuit(elaborate(nl, include_paths=[D]))
    ns = noise(comp, "q", freqs, ctx=SimSpec.make(gmin=1e-15))
    got = np.sqrt(np.abs(ns.psd))
    assert np.all(np.isfinite(got)) and np.all(got > 0)

    if deck:
        assert np.allclose(got, ref, rtol=1e-6)
        return

    # card-independent structural gates (see module docstring).
    # 1. thermal plateau, flat to <0.5% below 1 MHz — in the table AND ours
    for s in (ref, got):
        pl = s[freqs <= 1e6]
        assert np.ptp(pl) / pl.mean() < 5e-3, s is got
    # 2. plateau magnitude: same 4kT-scale physics, within 2x of ngspice
    #    (measured 1.73e-8 vs 1.58e-8 on the in-tree cards, 2026-08-21)
    assert 0.5 < got[0] / ref[0] < 2.0, (got[0], ref[0])
    # 3. high-frequency tail: PSD ~ f^-2 ⇒ sqrt-PSD slope -1 over the last
    #    three decades, to 1% — exact in the table, required of ours
    assert abs(_loglog_slope(freqs, ref, 1e12, 1e15) + 1.0) < 0.01
    assert abs(_loglog_slope(freqs, got, 1e12, 1e15) + 1.0) < 0.01
    # 4. the corner (sqrt-PSD fallen to half the plateau) sits in the same
    #    device-capacitance decade band in both
    def corner(s):
        half = 0.5 * s[0]
        k = np.argmax(s < half)
        return freqs[k]
    assert 1e9 <= corner(ref) <= 1e11
    assert 1e9 <= corner(got) <= 1e11


#: the reference's exact circuit (test/bsimcmg/inverter_cmg_cedar.cir) on
#: the vendored ASAP7 TT deck (tests/data/asap7/7nm_TT.scs — the SAME card
#: values the ngspice table was generated with, see its PROVENANCE.md)
CMG_EXACT_TOPOLOGY = """* CMG inverter noise, ASAP7 TT (inverter_cmg_cedar.cir)
.include "7nm_TT.scs"
mneg Q D VSS VSS nmos_lvt
mpos Q D VDD VDD pmos_lvt
VVDD VDD 0 1.0
VVSS VSS 0 0.0
CQ D 0 1e-15
VD D 0 0.5 AC 1 SIN (0.5 0.01 1e7)
.end
"""


@pytest.mark.skipif(not os.environ.get("CEDARSIM_RUN_SLOW"),
                    reason="slow: BSIM-CMG compile; set CEDARSIM_RUN_SLOW=1")
def test_cmg_inverter_noise_vs_ngspice_exact():
    """Full cross-simulator golden at the reference's own tolerance
    (/root/reference/test/ac.jl:250 gates rtol=1e-6): Spectre-parse the
    ASAP7 deck → CMG model cards → vendored BSIM-CMG 107 through the VA
    pipeline → DC op → noise analysis, against the ngspice table.
    Measured 2026-08-21: max rel err 7.9e-9 across all 61 frequencies."""
    freqs = np.array([r[0] for r in NGSPICE_CMG_INV_NOISE])
    ref = np.array([r[1] for r in NGSPICE_CMG_INV_NOISE])
    asap7 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "asap7")
    nl = parse_spice(CMG_EXACT_TOPOLOGY)
    comp = compile_circuit(elaborate(nl, include_paths=[asap7]))
    ns = noise(comp, "q", freqs, ctx=SimSpec.make(gmin=1e-15))
    got = np.sqrt(np.abs(ns.psd))
    assert np.allclose(got, ref, rtol=1e-6)
    # and the table's structure, cheap sanity on top of the value gate:
    # flicker-dominated low end, capacitive ~f^-1 tail
    assert abs(_loglog_slope(freqs, ref, 1e3, 1e5) + 0.5) < 0.02
    assert -1.05 < _loglog_slope(freqs, got, 1e13, 1e15) < -0.9
