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


def alter(text: str, scoped: dict = None, **params) -> str:
    """Return netlist source with the given parameter values substituted.

    ``params`` (bare names) substitute every ``name=<value>`` occurrence in
    the file.  ``scoped`` narrows the edit to one statement's byte range,
    matching the reference's offset-targeted substitution
    (/root/reference/src/spectre.jl:1773-1829): keys are
    ``"<subckt>.<param>"`` (edits only inside that ``.subckt``/``.ends``
    body) or ``"<instname>.<param>"`` (edits only that instance card,
    including its ``+`` continuation lines).  Unmatched names raise.
    """
    out = text
    for name, value in (params or {}).items():
        out, n = _sub_range(out, name, value, 0, len(out))
        if n == 0:
            raise AlterError(f"alter: parameter {name!r} not found in source")
    for key, value in (scoped or {}).items():
        if "." not in key:
            out, n = _sub_range(out, key, value, 0, len(out))
            if n == 0:
                raise AlterError(f"alter: parameter {key!r} not found")
            continue
        scope, pname = key.rsplit(".", 1)
        lo, hi = _scope_range(out, scope)
        out, n = _sub_range(out, pname, value, lo, hi)
        if n == 0:
            raise AlterError(
                f"alter: parameter {pname!r} not found in scope {scope!r}")
    return out


def _sub_range(text, name, value, lo, hi):
    """Substitute name=value inside text[lo:hi]; returns (text', count)."""
    pat = re.compile(
        r"(?P<pre>(?:^|[\s(,])" + re.escape(name) +
        r"\s*=\s*)(?P<val>'[^']*'|\{[^}]*\}|\"[^\"]*\"|[^\s),]+)",
        re.IGNORECASE | re.MULTILINE)
    count = 0

    def repl(m):
        nonlocal count
        count += 1
        return m.group("pre") + _fmt(value)

    body, count_ = pat.subn(repl, text[lo:hi])
    return text[:lo] + body + text[hi:], count


def _scope_range(text, scope):
    """Byte range of a .subckt body or an instance card (with + continuation
    lines).  Scope names are case-insensitive, SPICE and Spectre forms."""
    low = scope.lower()
    # subckt body: .subckt NAME ... .ends   |   subckt NAME { ... }-less
    m = re.search(
        r"^[ \t]*\.?subckt[ \t]+" + re.escape(low) + r"\b.*?$",
        text, re.IGNORECASE | re.MULTILINE)
    if m:
        end = re.search(r"^[ \t]*\.?ends\b.*?$", text[m.end():],
                        re.IGNORECASE | re.MULTILINE)
        hi = m.end() + (end.start() if end else len(text) - m.end())
        return m.start(), hi
    # instance card: line whose first token is the instance name
    m = re.search(r"^[ \t]*" + re.escape(low) + r"\b[^\n]*$",
                  text, re.IGNORECASE | re.MULTILINE)
    if m:
        hi = m.end()
        rest = text[hi:]
        for line in rest.split("\n")[1:]:
            if line.lstrip().startswith("+"):
                hi += 1 + len(line)
            else:
                break
        return m.start(), hi
    raise AlterError(f"alter: scope {scope!r} not found "
                     "(no matching .subckt or instance card)")


def _fmt(v):
    if isinstance(v, str):
        return v
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)
