"""``alter``: re-emit netlist source with substituted parameter values.

Reference: ``alter(io, ast; params...)`` prints the original netlist
byte-exactly with parameter values substituted, using red-tree offsets
(/root/reference/src/spectre.jl:1773-1829; round-trip test
test/params.jl:60-140).  Here the substitution operates on the raw source
text: ``.param``/``parameters`` assignments and instance ``name=value``
pairs are rewritten in place; every other byte is preserved.
"""

from __future__ import annotations

import re


class AlterError(ValueError):
    pass


def alter(text: str, **params) -> str:
    """Return netlist source with the given parameter values substituted.

    Substitutes ``name=<value>`` occurrences in ``.param`` /
    ``parameters`` statements (and bare ``name=value`` instance parameters
    when the name is unambiguous).  Unmatched names raise.
    """
    out = text
    for name, value in params.items():
        pat = re.compile(
            r"(?P<pre>(?:^|[\s(,])" + re.escape(name) +
            r"\s*=\s*)(?P<val>'[^']*'|\{[^}]*\}|\"[^\"]*\"|[^\s),]+)",
            re.IGNORECASE | re.MULTILINE)
        sub_count = 0

        def repl(m):
            nonlocal sub_count
            sub_count += 1
            return m.group("pre") + _fmt(value)

        out = pat.sub(repl, out)
        if sub_count == 0:
            raise AlterError(f"alter: parameter {name!r} not found in source")
    return out


def _fmt(v):
    if isinstance(v, str):
        return v
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)
