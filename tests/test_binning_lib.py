"""End-to-end elaboration + simulation of the reference's REAL binned BSIM4
library (/root/reference/test/binning/bins.cir — 93 KB, 16 bins with
LMIN/LMAX/WMIN/WMAX bounds and L/W/P binning-correction parameters).

Ports the reference's bin-selection assertions (test/binning/bins.jl:18-21:
l=2.8e-7/w=2.2e-7 -> bin nmos_3p3.0, l=5.0e-7/w=2.2e-7 -> bin nmos_3p3.1)
and goes further: the selected bin's denormalized effective parameters are
gated against the closed-form BSIM4 binning equation
    P_eff = P + LP/Lb + WP/Wb + PP/(Lb*Wb),  binunit=2 (meters)
with Lb = L + XL - 2*LINT, Wb = W + XW - 2*WINT for this lib's trivial
geometry terms, and a DC operating point is solved on the real card.
"""

import os

import numpy as np
import pytest

_VENDORED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "binning", "bins.cir")
BINS = ("/root/reference/test/binning/bins.cir"
        if os.path.exists("/root/reference/test/binning/bins.cir")
        else _VENDORED)


def _lib_text():
    with open(BINS) as f:
        lines = f.read().splitlines()
    # the fixture's first line is a stray device statement that sits in the
    # SPICE title position when the file is parsed standalone (which is how
    # the reference consumes it, bins.jl:14); drop it, keep the .param
    # block and the 16 bin cards
    return "\n".join(lines[1:])


def _elab(l, w, vg):
    from cedarsim_tpu import parse_spice, elaborate
    code = (
        "* real binned BSIM4 library DC\n"
        + _lib_text() + "\n"
        + "vd vdd 0 3.3\n"
        + f"vg g 0 {vg}\n"
        + "rd vdd d 100k\n"
        + f"m1 d g 0 0 nmos_3p3 l={l} w={w}\n"
        + ".op\n.end\n")
    nl = parse_spice(code, file="bins_wrap.cir")
    return elaborate(nl)


def _m1_params(ckt):
    for inst in ckt.instances:
        if inst.name == "m1":
            return {k: float(np.asarray(v)) for k, v in inst.params.items()}
    raise AssertionError("m1 not elaborated")


# card values quoted from bins.cir (bin .0 at :7ff, bin .1 at :251ff);
# both bins: binunit=2, wint=1e-8, lint=ll=lw=lwl=0, wl=ww=wwl=0, xl=xw=0
BIN0 = dict(vth0=0.70837662, lvth0=-3.8715455e-8, wvth0=-1.430587e-8,
            pvth0=4.3636364e-16,
            k1=0.95938091, lk1=-9.9985454e-8, wk1=0.0, pk1=0.0)
BIN1 = dict(vth0=0.67781184, lvth0=-2.3433061e-8, wvth0=-1.2304653e-8,
            pvth0=-5.642449e-16,
            k1=0.74639857, lk1=6.5057143e-9, wk1=0.0, pk1=0.0)


def _eff(card, base, L, W):
    lb = L            # lint = xl = 0
    wb = W - 2e-8     # wint = 1e-8, xw = 0
    return (card[base] + card["l" + base] / lb + card["w" + base] / wb
            + card["p" + base] / (lb * wb))


def test_bin_selection_and_denormalization():
    # reference assertion 1: (2.8e-7, 2.2e-7) selects bin .0
    ckt = _elab(2.8e-7, 2.2e-7, 0.0)
    p = _m1_params(ckt)
    want = _eff(BIN0, "vth0", 2.8e-7, 2.2e-7)
    assert abs(p["VTH0"] - want) < 1e-9, (p["VTH0"], want)
    # the correction is large (>190 mV) — dropping it would be caught
    assert abs(p["VTH0"] - BIN0["vth0"]) > 0.15
    assert abs(p["K1"] - _eff(BIN0, "k1", 2.8e-7, 2.2e-7)) < 1e-9

    # reference assertion 2: (5.0e-7, 2.2e-7) falls out of bin .0
    # (lmax=5e-7 exclusive) into bin .1 (lmin=5e-7 inclusive)
    ckt = _elab(5.0e-7, 2.2e-7, 0.0)
    p = _m1_params(ckt)
    assert abs(p["VTH0"] - _eff(BIN1, "vth0", 5.0e-7, 2.2e-7)) < 1e-9
    assert abs(p["K1"] - _eff(BIN1, "k1", 5.0e-7, 2.2e-7)) < 1e-9


def test_bin_out_of_range_rejected():
    from cedarsim_tpu.frontend.elaborate import ElabError
    with pytest.raises(ElabError, match="no bin"):
        _elab(1e-4, 2.2e-7, 0.0)     # l beyond every bin's lmax (5.0001e-5)


def test_binned_lib_dc_physics():
    # DC op on the real card: 100k pull-up on the drain; at vg=3.3 (far
    # above the ~0.51 V effective Vth) the device is deep in the linear
    # region (Ron ~ kOhms) and must pull the drain near ground; at vg=0
    # it is off and the drain sits at the rail.
    from cedarsim_tpu import compile_circuit, solve_dc

    c_on = compile_circuit(_elab(2.8e-7, 2.2e-7, 3.3))
    op = solve_dc(c_on)
    assert bool(np.all(np.asarray(op.converged)))
    vd_on = float(np.asarray(op.x)[c_on.node_names.index("d")])

    c_off = compile_circuit(_elab(2.8e-7, 2.2e-7, 0.0))
    op2 = solve_dc(c_off)
    assert bool(np.all(np.asarray(op2.converged)))
    vd_off = float(np.asarray(op2.x)[c_off.node_names.index("d")])

    # measured on this card: vd_on = 0.193 (Ron ~ 6 kOhm), vd_off = 3.272
    # (281 nA leakage from the card's junction/GIDL terms) — gate with
    # headroom on both sides plus the on/off contrast itself
    assert vd_on < 0.5, vd_on          # strongly conducting
    assert vd_off > 3.2, vd_off        # sub-microamp leakage
    assert vd_off - vd_on > 2.5
