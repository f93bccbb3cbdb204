"""Dialect-dependent element letters (reference tokenize/lexer.jl:578-612):
ngspice N→OSDI / S,W→switch; hspice S→S-parameter element; xyce Y→OSDI."""

import pytest

from cedarsim_tpu.frontend.parser import parse_spice
from cedarsim_tpu.frontend.elaborate import elaborate, ElabError


def _first_element(nl):
    return [s for s in nl.statements if getattr(s, "letter", None)][0]


def test_ngspice_n_is_osdi():
    el = _first_element(parse_spice(
        "t\nN1 d g s b mybsim W=1u L=1u\n.end\n", spice_dialect="ngspice"))
    assert el.letter == "osdi"
    assert el.nodes == ["d", "g", "s", "b"]
    assert el.model == "mybsim"


def test_hspice_s_is_sparam():
    el = _first_element(parse_spice(
        "t\nS1 in out smod zo=50\n.end\n", spice_dialect="hspice"))
    assert el.letter == "sparam"
    assert el.nodes == ["in", "out"]
    assert el.model == "smod"


def test_ngspice_s_stays_switch():
    el = _first_element(parse_spice("t\nS1 a b c d smod\n.end\n"))
    assert el.letter == "s"
    assert len(el.nodes) == 4


def test_xyce_y_is_osdi():
    el = _first_element(parse_spice(
        "t\nY1 a b mymod\n.end\n", spice_dialect="xyce"))
    assert el.letter == "osdi"


def test_osdi_elaboration_redirects_to_va():
    nl = parse_spice("t\nN1 d g s b mybsim\n.end\n", spice_dialect="ngspice")
    with pytest.raises(ElabError, match="Verilog-A source"):
        elaborate(nl)


def test_sparam_needs_model_card():
    nl = parse_spice("t\nS1 in out smod\n.end\n", spice_dialect="hspice")
    with pytest.raises(ElabError):
        elaborate(nl)   # smod model card missing
