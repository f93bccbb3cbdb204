"""Parse every valid netlist in the reference repository (SPICE, ngspice,
Spectre, model decks) — an empirical frontend-coverage test.  The two
intentionally-broken error-corpus files must fail."""

import glob
import os

import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

BROKEN = {"SpectreNetlistParser.jl/test/SPICE/examples/errors.cir",
          "SpectreNetlistParser.jl/test/examples/errors.scs"}


def _files():
    out = []
    for pat in ("**/*.cir", "**/*.spice", "**/*.ngspice", "**/*.sp",
                "**/*.scs", "**/*.pm"):
        out += glob.glob(os.path.join(REF, "**", pat), recursive=True)
    return sorted(set(out))


def test_reference_netlists_parse():
    from cedarsim_tpu.frontend.spectre import parse_mixed
    ok, fails = [], []
    for f in _files():
        rel = os.path.relpath(f, REF)
        try:
            with open(f, errors="replace") as fh:
                parse_mixed(fh.read(), file=f,
                            start_lang="spectre" if f.endswith(".scs")
                            else "spice")
            ok.append(rel)
        except Exception:
            fails.append(rel)
    unexpected = [f for f in fails if f not in BROKEN]
    assert not unexpected, f"valid netlists failed to parse: {unexpected}"
    assert len(ok) >= 27
    # the deliberately-broken files must raise
    assert set(fails) >= (BROKEN & set(os.path.relpath(f, REF)
                                       for f in _files()))
