"""Verilog-A token-tree invariants — the analogue of the reference's
lossless-CST invariants test (/root/reference/VerilogAParser.jl/test/
invariants.jl: every ChunkTree leaf's virtual range starts exactly one
past the previous leaf's end, over the full BSIM-CMG source).

Our frontend is a token stream + origin chains rather than a red/green
CST, so the equivalent exactness guarantees are:

1. POSITION EXACTNESS — every raw-lexed token's (file, line, col) points
   at source text that reproduces the token's surface form;
2. TILING — consecutive tokens are separated ONLY by whitespace,
   comments, or line continuations (nothing is silently dropped,
   nothing overlaps, order is strictly increasing);
3. ORIGIN RESOLUTION — after preprocessing (``define expansion +
   ``include), every token's ultimate location resolves back into the
   text of the file it claims (macro-expanded tokens through their
   outermost use-site, include-file tokens into the included file).

All three run over the full vendored BSIM-CMG 107 source (the same
corpus the reference's invariants test uses) plus a synthetic
macro/include fixture.
"""

import os
import re

from cedarsim_tpu.models import BSIMCMG107_DIR
from cedarsim_tpu.va.lexer import lex_va
from cedarsim_tpu.va.preproc import preprocess

#: whitespace / comments / line continuations — the only legal inter-token
#: material (mirrors the lexer's skip classes)
_SKIP_RE = re.compile(
    r"(?:[ \t\r\n]|/\*.*?\*/|//[^\n]*|\\\r?\n)*", re.DOTALL)


def _raw(tok):
    """Reconstruct a token's surface form from its normalized text."""
    if tok.kind == "directive":
        return "`" + tok.text
    if tok.kind == "str":
        return '"' + tok.text + '"'
    return tok.text


def _line_starts(text):
    starts = [0]
    for m in re.finditer(r"\n", text):
        starts.append(m.end())
    return starts


def _offset(starts, line, col):
    return starts[line - 1] + (col - 1)


def _check_raw_stream(text, file):
    toks = lex_va(text, file)
    starts = _line_starts(text)
    prev_end = 0
    n_checked = 0
    for t in toks:
        if t.kind == "eof":
            continue
        if t.kind == "nl":
            # a newline token may sit after trailing comment/ws; just
            # require monotonicity
            continue
        off = _offset(starts, t.line, t.col)
        raw = _raw(t)
        # 1. position exactness
        got = text[off:off + len(raw)]
        assert got == raw, (file, t.line, t.col, raw[:40], got[:40])
        # 2. tiling: the gap from the previous token is only skip material
        assert off >= prev_end, (t.line, t.col, off, prev_end)
        gap = text[prev_end:off]
        assert _SKIP_RE.fullmatch(gap), (file, t.line, repr(gap[:60]))
        prev_end = off + len(raw)
        n_checked += 1
    return n_checked


def test_raw_token_stream_tiles_bsimcmg_body():
    # the 178 KB model body — the same file the reference's invariants
    # test walks
    path = os.path.join(BSIMCMG107_DIR, "bsimcmg_body.include")
    with open(path, errors="replace") as f:
        text = f.read()
    assert _check_raw_stream(text, path) > 10_000


def test_raw_token_stream_tiles_every_cmg_source():
    total = 0
    for fn in sorted(os.listdir(BSIMCMG107_DIR)):
        if not (fn.endswith(".va") or fn.endswith(".include")):
            continue
        path = os.path.join(BSIMCMG107_DIR, fn)
        with open(path, errors="replace") as f:
            text = f.read()
        total += _check_raw_stream(text, path)
    assert total > 30_000        # the 178 KB body alone is tens of
    #                              thousands of tokens


def test_preprocessed_origins_resolve():
    """Every preprocessed token's ultimate location lands in the text of
    the file it claims: plain tokens at their own (file, line, col),
    macro-expanded tokens through the OUTERMOST use-site (which must name
    the macro), include-file tokens inside the included file."""
    path = os.path.join(BSIMCMG107_DIR, "bsimcmg.va")
    with open(path) as f:
        text = f.read()
    toks = preprocess(text, path, include_paths=(BSIMCMG107_DIR,))
    sources = {}

    def src(f):
        if f not in sources:
            with open(f, errors="replace") as fh:
                t = fh.read()
            sources[f] = (t, _line_starts(t))
        return sources[f]

    n_plain = n_macro = n_incl = 0
    for t in toks:
        if t.kind == "eof":
            continue
        if t.origin:
            # outermost expansion frame: (name, use_file, use_line,
            # use_col, def_file, def_line) — the use site must show the
            # macro invocation `name
            name, use_file, use_line, use_col = t.origin[0][:4]
            txt, starts = src(use_file)
            off = _offset(starts, use_line, use_col)
            assert txt[off:off + len(name) + 1] == "`" + name, \
                (use_file, use_line, use_col, name)
            n_macro += 1
        else:
            txt, starts = src(t.file)
            off = _offset(starts, t.line, t.col)
            raw = _raw(t)
            assert txt[off:off + len(raw)] == raw, \
                (t.file, t.line, t.col, raw[:40])
            if t.file != path:
                n_incl += 1
            else:
                n_plain += 1
    # the top file is a 3-line wrapper (n_plain ~0); the model body
    # arrives via includes with thousands of macro expansions
    assert n_macro > 1000 and n_incl > 1000, (n_plain, n_macro, n_incl)


def test_macro_include_fixture_origins(tmp_path):
    inc = tmp_path / "sub.va"
    inc.write_text("`define TWO 2\nparameter real b = `TWO;\n")
    main = tmp_path / "main.va"
    main.write_text('`include "sub.va"\n'
                    "`define PLUS(x) ((x)+`TWO)\n"
                    "parameter real a = `PLUS(3);\n")
    toks = preprocess(main.read_text(), str(main),
                      include_paths=(str(tmp_path),))
    texts = [t.text for t in toks if t.kind != "eof"]
    # expansion result is right
    joined = " ".join(texts)
    assert "( ( 3 ) + 2 )" in joined, joined
    # tokens from the include carry the include's file
    b_tok = [t for t in toks if t.text == "b"][0]
    assert b_tok.file == str(inc)
    # the nested `TWO inside `PLUS resolves through a chain whose
    # outermost frame is the PLUS use in main.va
    two = [t for t in toks if t.kind == "num" and t.value == 2.0
           and t.origin]
    assert two, "expanded 2 not found"
    frames = two[-1].origin
    assert frames[0][0] == "PLUS" and frames[0][1] == str(main)
