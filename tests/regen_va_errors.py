"""Regenerate the VA diagnostics golden corpus (the reference's
``--regenerate`` flow, VerilogAParser.jl/test/errors.jl:1-30).

    python tests/regen_va_errors.py [case ...]

Inputs are the reference's error corpus
(/root/reference/VerilogAParser.jl/test/errors/*.va — read as test
*inputs*, never copied); goldens are THIS renderer's output, written to
tests/data/va_errors/<case>.out.  Re-run after any intentional
diagnostics change, then eyeball the git diff of the .out files.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

from cedarsim_tpu.va.parser import parse_va, VAParseError  # noqa: E402
from cedarsim_tpu.va.preproc import VAPreprocError  # noqa: E402

REF = "/root/reference/VerilogAParser.jl/test/errors"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                   "va_errors")


def render_case(path):
    try:
        parse_va(open(path, errors="replace").read(), path)
    except (VAParseError, VAPreprocError) as e:
        return e.render() + "\n"
    raise AssertionError(f"{path} parsed without error — not an error case")


def main(argv):
    names = argv or sorted(
        os.path.basename(f)[:-3] for f in glob.glob(REF + "/*.va"))
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        out = render_case(os.path.join(REF, name + ".va"))
        with open(os.path.join(OUT, name + ".out"), "w") as f:
            f.write(out)
        print(f"wrote {name}.out ({len(out.splitlines())} lines)")


if __name__ == "__main__":
    main(sys.argv[1:])
