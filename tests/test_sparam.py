"""S-parameter elements: touchstone parsing + AC stamps vs closed form
(reference SParameterElement, SPICE/parse/forms.jl:411-418)."""

import numpy as np
import pytest

from cedarsim_tpu.frontend.touchstone import (parse_touchstone, s_to_y,
                                              TouchstoneError)
from cedarsim_tpu.frontend.parser import parse_spice
from cedarsim_tpu.frontend.elaborate import elaborate, ElabError
from cedarsim_tpu.analysis.ac import ac

R, C, Z0 = 100.0, 1e-9, 50.0


def _z(f):
    return R + 1.0 / (2j * np.pi * f * C)


def _s1p(freqs):
    s11 = (_z(freqs) - Z0) / (_z(freqs) + Z0)
    lines = ["! series RC to ground: R=100, C=1n", "# HZ S RI R 50"]
    for f, s in zip(freqs, s11):
        lines.append(f"{f:.10g} {s.real:.12g} {s.imag:.12g}")
    return "\n".join(lines) + "\n"


def test_parse_formats():
    f = np.array([1e6, 2e6, 4e6])
    s = (_z(f) - Z0) / (_z(f) + Z0)
    # RI
    fr, S, z0 = parse_touchstone(_s1p(f), 1)
    assert z0 == 50.0 and np.allclose(fr, f)
    assert np.allclose(S[:, 0, 0], s, atol=1e-9)
    # MA round-trip
    ma = "\n".join(["# MHZ S MA R 50"] + [
        f"{fi/1e6} {abs(si)} {np.degrees(np.angle(si))}"
        for fi, si in zip(f, s)])
    fr2, S2, _ = parse_touchstone(ma, 1)
    assert np.allclose(fr2, f) and np.allclose(S2[:, 0, 0], s, atol=1e-9)
    # DB round-trip
    db = "\n".join(["# GHZ S DB R 50"] + [
        f"{fi/1e9} {20*np.log10(abs(si))} {np.degrees(np.angle(si))}"
        for fi, si in zip(f, s)])
    fr3, S3, _ = parse_touchstone(db, 1)
    assert np.allclose(S3[:, 0, 0], s, atol=1e-9)


def test_s_to_y_matches_impedance():
    f = np.logspace(4, 8, 31)
    _, S, z0 = parse_touchstone(_s1p(f), 1)
    Y = s_to_y(S, z0)
    assert np.allclose(Y[:, 0, 0], 1.0 / _z(f), rtol=1e-9)


def test_two_port_column_order():
    # touchstone 2-port rows are S11 S21 S12 S22
    text = ("# HZ S RI R 50\n"
            "1e6 0.1 0 0.8 0 0.05 0 0.2 0\n")
    _, S, _ = parse_touchstone(text, 2)
    assert S[0, 0, 0] == pytest.approx(0.1)
    assert S[0, 1, 0] == pytest.approx(0.8)   # S21
    assert S[0, 0, 1] == pytest.approx(0.05)  # S12
    assert S[0, 1, 1] == pytest.approx(0.2)


def test_ac_with_s_element_matches_closed_form(tmp_path):
    fgrid = np.logspace(3, 8, 201)
    (tmp_path / "rc.s1p").write_text(_s1p(fgrid))
    nl = parse_spice(f"""* s-element divider
V1 in 0 DC 0 AC 1
RS in p 50
S1 p smod
.model smod sp file="rc.s1p"
.end
""", spice_dialect="hspice")
    c_ckt = elaborate(nl, include_paths=[str(tmp_path)])
    from cedarsim_tpu import compile_circuit
    comp = compile_circuit(c_ckt)
    f_eval = fgrid[[20, 80, 140, 190]]      # on-grid: no interp error
    sol = ac(comp, f_eval)
    v = sol["p"]
    expect = _z(f_eval) / (_z(f_eval) + 50.0)
    assert np.allclose(v, expect, rtol=2e-6), (v, expect)


def test_port_count_mismatch_raises(tmp_path):
    (tmp_path / "rc.s1p").write_text(_s1p(np.array([1e6, 2e6])))
    nl = parse_spice("""* bad
S1 a b smod
.model smod sp file="rc.s1p"
.end
""", spice_dialect="hspice")
    with pytest.raises(ElabError, match="1-port data but 2"):
        elaborate(nl, include_paths=[str(tmp_path)])
