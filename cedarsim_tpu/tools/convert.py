"""Netlist dialect conversion — the SpiceArmyKnife equivalent.

The reference ships ``spak-convert`` (SpiceArmyKnife.jl/src/Convert.jl:26-60)
with per-simulator emitters over the shared CST
(``CodeGenScope{Sim}``, src/codegen.jl:24-63; SPICE->Spectre in
cg_spectre.jl, SPICE->SPICE in cg_spice.jl).  Here both dialect parsers
already normalize to one statement AST (frontend/parser.py dataclasses), so
conversion is an emitter per output dialect over that AST plus a model-type
mapping table.

Magnitude suffixes are never emitted — numbers print in exponent form, which
sidesteps the SPICE ``M``=milli vs Spectre ``M``=mega trap the reference's
converter handles with suffix tables (cg_veriloga.jl:6-50).

CLI (mirrors spak-convert):

    python -m cedarsim_tpu.tools.convert in.cir out.scs \
        --input-simulator auto --output-simulator spectre

Model-database extraction (the Generate.jl role, SpiceArmyKnife.jl/src/
Generate.jl:14-60): ``--extract-models db.json`` writes every .model card
(incl. inside subckts/libs) as JSON.
"""

from __future__ import annotations

import argparse
import json
import math
import sys

from cedarsim_tpu.frontend import parser as P


class ConvertError(ValueError):
    pass


# ------------------------------------------------------------------ numbers

def fmt_num(v) -> str:
    if isinstance(v, bool):
        return "1" if v else "0"
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    if math.isinf(f):
        return "1e30" if f > 0 else "-1e30"
    return repr(f)


# -------------------------------------------------------------- expressions

_PREC = {"||": 1, "&&": 2, "==": 3, "!=": 3, "<": 4, "<=": 4, ">": 4,
         ">=": 4, "+": 5, "-": 5, "*": 6, "/": 6, "%": 6, "**": 7}


def emit_expr(ast, dialect="spectre") -> str:
    """Expression AST -> source text (parenthesized conservatively)."""
    if isinstance(ast, (int, float)):
        return fmt_num(ast)
    if isinstance(ast, str):
        return ast
    kind = ast[0]
    if kind == "num":
        return fmt_num(ast[1])
    if kind == "ref":
        return str(ast[1])
    if kind == "un":
        return f"(-{emit_expr(ast[2], dialect)})" if ast[1] == "-" \
            else f"({ast[1]}{emit_expr(ast[2], dialect)})"
    if kind == "bin":
        return (f"({emit_expr(ast[2], dialect)}{ast[1]}"
                f"{emit_expr(ast[3], dialect)})")
    if kind == "cond":
        return (f"({emit_expr(ast[1], dialect)}?"
                f"{emit_expr(ast[2], dialect)}:"
                f"{emit_expr(ast[3], dialect)})")
    if kind == "call":
        args = ",".join(emit_expr(a, dialect) for a in ast[2])
        return f"{ast[1]}({args})"
    raise ConvertError(f"cannot emit expression node {ast!r}")


def emit_val(v, dialect, top=True):
    """A parameter value: number stays bare; an expression gets the
    dialect's quoting ({...} for SPICE, bare for Spectre)."""
    if isinstance(v, (int, float)):
        return fmt_num(v)
    if isinstance(v, tuple) and v and v[0] == "ref" and dialect == "spice":
        return str(v[1])
    s = emit_expr(v, dialect)
    if dialect == "spice" and top:
        return "{" + s + "}"
    return s


# ------------------------------------------------------- model-type mapping

#: SPICE (mtype, level) -> Spectre master
def _spice_model_to_spectre(mtype, params):
    lvl = params.get("level")
    lvl = float(lvl) if isinstance(lvl, (int, float)) else None
    if mtype in ("nmos", "pmos"):
        ty = "n" if mtype == "nmos" else "p"
        if lvl in (8.0, 49.0, 53.0):
            return "bsim3v3", {"type": ("ref", ty)}
        if lvl in (17.0, 72.0):
            return "bsimcmg", {"type": ("ref", ty)}
        if lvl in (14.0, 54.0) or lvl is None:
            return "bsim4", {"type": ("ref", ty)}
        return "mos1", {"type": ("ref", ty)}
    table = {"d": "diode", "diode": "diode", "npn": "bjt", "pnp": "bjt",
             "r": "resistor", "res": "resistor", "resistor": "resistor",
             "c": "capacitor", "capacitor": "capacitor", "sw": "relay",
             "csw": "relay", "l": "inductor", "inductor": "inductor"}
    extra = {}
    if mtype in ("npn", "pnp"):
        extra["type"] = ("ref", mtype)
    return table.get(mtype, mtype), extra


#: Spectre master -> SPICE (mtype, extra params)
def _spectre_model_to_spice(mtype, params):
    ty = params.get("type")
    if isinstance(ty, tuple) and ty and ty[0] == "ref":
        ty = ty[1]
    ty = str(ty).lower() if ty is not None else "n"
    if mtype in ("bsim4", "bsim3v3", "bsimcmg", "mos1", "bsim3", "mos902"):
        lvl = {"bsim4": 54.0, "bsim3v3": 49.0, "bsim3": 49.0,
               "bsimcmg": 72.0, "mos1": 1.0, "mos902": 1.0}[mtype]
        return ("nmos" if ty != "p" else "pmos"), {"level": lvl}
    table = {"diode": "d", "resistor": "r", "capacitor": "c",
             "inductor": "l", "bjt": ("pnp" if ty == "pnp" else "npn"),
             "relay": "sw"}
    return table.get(mtype, mtype), {}


def _scan_source_tokens(el):
    """SPICE V/I positional token stream -> {dc, ac, acphase} (the same scan
    as elaborate._instantiate_source: the model slot and values may hold the
    'dc'/'ac' marker words)."""
    pending = []
    if el.model is not None:
        pending.append(("ref", el.model))
    pending += list(el.values)
    out = {}
    positional = []
    i = 0
    while i < len(pending):
        v = pending[i]
        if isinstance(v, tuple) and v and v[0] == "ref" \
                and isinstance(v[1], str):
            w = v[1].lower()
            if w == "dc":
                if i + 1 < len(pending):
                    out["dc"] = pending[i + 1]
                i += 2
                continue
            if w == "ac":
                if i + 1 < len(pending):
                    out["ac"] = pending[i + 1]
                    i += 2
                    if i < len(pending) and not (
                            isinstance(pending[i], tuple)
                            and pending[i][0] == "ref"):
                        out["acphase"] = pending[i]
                        i += 1
                else:
                    i += 1
                continue
        positional.append(v)
        i += 1
    if positional and "dc" not in out:
        out["dc"] = positional[0]
    return out


# ----------------------------------------------------------- Spectre output

_WAVE_TO_SPECTRE = {
    "pulse": ("pulse", ["val0", "val1", "delay", "rise", "fall", "width",
                        "period"]),
    "sin": ("sine", ["sinedc", "ampl", "freq", "delay", "damp"]),
    "sine": ("sine", ["sinedc", "ampl", "freq", "delay", "damp"]),
    "exp": ("exp", ["val0", "val1", "td1", "tau1", "td2", "tau2"]),
}


class SpectreEmitter:
    dialect = "spectre"

    def __init__(self, in_dialect="spice"):
        self.lines = []
        self.n_analysis = 0
        self.in_dialect = in_dialect

    def num_tok(self, a):
        """Directive tokens arrive as raw strings; SI suffixes must be
        re-based on the *input* dialect (SPICE M=milli vs Spectre M=mega —
        the trap the reference handles with suffix tables,
        cg_veriloga.jl:6-50)."""
        if isinstance(a, str):
            from cedarsim_tpu.frontend.numbers import parse_number
            v = parse_number(a, self.in_dialect)
            if v is not None:
                return fmt_num(v)
            return a
        return emit_val(a, self.dialect)

    def emit(self, netlist: P.SpiceNetlist) -> str:
        self.lines = ["// converted by cedarsim_tpu.tools.convert"]
        if netlist.title:
            self.lines.append("// " + netlist.title)
        self.lines.append("simulator lang=spectre")
        self.stmts(netlist.statements)
        return "\n".join(self.lines) + "\n"

    def stmts(self, stmts):
        for st in stmts:
            self.stmt(st)

    def kw(self, params, skip=()):
        out = []
        for k, v in params.items():
            if k in skip or v is None:
                continue
            out.append(f"{k}={emit_val(v, self.dialect)}")
        return out

    def stmt(self, st):
        L = self.lines
        if isinstance(st, P.Param):
            if st.assignments:
                L.append("parameters " + " ".join(
                    f"{k}={emit_val(v, self.dialect)}"
                    for k, v in st.assignments))
        elif isinstance(st, P.Model):
            master, extra = _spice_model_to_spectre(st.mtype, st.params)
            parts = [f"model {st.name} {master}"]
            parts += self.kw(extra)
            parts += self.kw(st.params, skip=("level",))
            L.append(" ".join(parts))
        elif isinstance(st, P.Subckt):
            L.append(f"subckt {st.name} ({' '.join(st.nodes)})")
            if st.params:
                L.append("parameters " + " ".join(
                    f"{k}={emit_val(v, self.dialect)}"
                    for k, v in st.params.items()))
            body = [s for s in st.body
                    if not (isinstance(s, P.Param)
                            and all(k in st.params
                                    for k, _ in s.assignments))]
            self.stmts(body)
            L.append(f"ends {st.name}")
        elif isinstance(st, P.Include):
            if st.section:
                L.append(f'include "{st.path}" section={st.section}')
            else:
                L.append(f'include "{st.path}"')
        elif isinstance(st, P.LibSection):
            L.append(f"section {st.name}")
            self.stmts(st.body)
            L.append("endsection")
        elif isinstance(st, P.Element):
            self.element(st)
        elif isinstance(st, P.Control):
            self.control(st)
        elif isinstance(st, P.IfBlock):
            # Spectre has no .if; emit every branch commented except none —
            # conservative: refuse rather than silently drop
            raise ConvertError(
                f"{st.loc.file}:{st.loc.line}: .if blocks cannot be "
                "represented in Spectre output; resolve them first")
        elif isinstance(st, P.ErrorNode):
            L.append(f"// PARSE ERROR preserved: {st.message}")
        else:
            raise ConvertError(f"cannot convert {type(st).__name__}")

    _MASTER = {"r": "resistor", "c": "capacitor", "l": "inductor",
               "v": "vsource", "i": "isource", "e": "vcvs", "g": "vccs",
               "f": "cccs", "h": "ccvs"}

    def element(self, el: P.Element):
        L = self.lines
        nodes = f"({' '.join(el.nodes)})"
        letter = el.letter
        if letter in ("r", "c", "l"):
            params = dict(el.params)
            key = letter
            if el.values and key not in params:
                params = {key: el.values[0], **params}
            parts = [f"{el.name} {nodes} {self._MASTER[letter]}"]
            parts += self.kw(params)
            L.append(" ".join(parts))
            return
        if letter in ("v", "i"):
            parts = [f"{el.name} {nodes} {self._MASTER[letter]}"]
            p = dict(el.params)
            p.update(_scan_source_tokens(el))
            acmag = p.pop("ac", None)
            if acmag is not None:
                p["mag"] = acmag
            p.pop("acphase", None)
            parts += self.kw(p)
            for kind, args in el.waves:
                if kind == "pwl":
                    pts = " ".join(emit_val(a, self.dialect, top=False)
                                   for a in args)
                    parts.append(f"type=pwl wave=[{pts}]")
                elif kind in _WAVE_TO_SPECTRE:
                    sname, names = _WAVE_TO_SPECTRE[kind]
                    parts.append(f"type={sname}")
                    for pname, a in zip(names, args):
                        parts.append(
                            f"{pname}={emit_val(a, self.dialect)}")
                else:
                    raise ConvertError(f"{el.name}: waveform {kind!r} not "
                                       "convertible")
            L.append(" ".join(parts))
            return
        if letter in ("e", "g"):
            gain = el.values[0] if el.values else el.params.get(
                "gain", el.params.get("gm", 1.0))
            gname = "gain" if letter == "e" else "gm"
            L.append(f"{el.name} {nodes} {self._MASTER[letter]} "
                     f"{gname}={emit_val(gain, self.dialect)}")
            return
        if letter in ("f", "h"):
            gain = el.values[0] if el.values else 1.0
            gname = "gain" if letter == "f" else "rm"
            L.append(f"{el.name} {nodes} {self._MASTER[letter]} "
                     f"probe={el.model} {gname}="
                     f"{emit_val(gain, self.dialect)}")
            return
        if letter == "b":
            parts = [f"{el.name} {nodes} bsource"]
            for k, v in el.params.items():
                parts.append(f"{k}={emit_expr(v, self.dialect)}")
            L.append(" ".join(parts))
            return
        if letter == "k":
            names = list(el.nodes)
            if el.model:
                names.append(el.model)
            kval = el.values[0] if el.values else el.params.get("k", 1.0)
            L.append(f"{el.name} mutual_inductor coupling="
                     f"{emit_val(kval, self.dialect)} "
                     f"ind1={names[0]} ind2={names[1]}")
            return
        if letter in ("d", "m", "q", "j", "x", "s", "w", "z"):
            parts = [f"{el.name} {nodes} {el.model}"]
            for i, v in enumerate(el.values):
                if letter in ("d", "q") and i == 0:
                    parts.append(f"area={emit_val(v, self.dialect)}")
            parts += self.kw(el.params)
            L.append(" ".join(parts))
            return
        raise ConvertError(f"{el.name}: device letter {letter!r} not "
                           "convertible")

    def control(self, st: P.Control):
        L = self.lines
        cmd = st.cmd

        def aname(kind):
            self.n_analysis += 1
            return f"{kind}{self.n_analysis}"

        def num(a):
            return self.num_tok(a)

        if cmd == "tran":
            args = [a for a in st.args]
            # .tran tstep tstop [tstart [hmax]]
            parts = [f"{aname('tran')} tran"]
            if len(args) >= 2:
                parts.append(f"stop={num(args[1])}")
                parts.append(f"step={num(args[0])}")
            elif args:
                parts.append(f"stop={num(args[0])}")
            parts += self.kw(st.kwargs)
            L.append(" ".join(parts))
        elif cmd == "op":
            L.append(f"{aname('dcop')} dc")
        elif cmd == "dc":
            parts = [f"{aname('dc')} dc"]
            if len(st.args) >= 4:
                parts += [f"dev={st.args[0]}", "param=dc",
                          f"start={num(st.args[1])}",
                          f"stop={num(st.args[2])}",
                          f"step={num(st.args[3])}"]
            L.append(" ".join(parts))
        elif cmd == "ac":
            # .ac dec|lin|oct n fstart fstop
            parts = [f"{aname('ac')} ac"]
            if len(st.args) >= 4:
                mode = str(st.args[0]).lower()
                parts.append(f"start={num(st.args[2])}")
                parts.append(f"stop={num(st.args[3])}")
                if mode == "dec":
                    parts.append(f"dec={num(st.args[1])}")
                elif mode == "lin":
                    parts.append(f"lin={num(st.args[1])}")
                elif mode == "oct":
                    parts.append(f"oct={num(st.args[1])}")
            L.append(" ".join(parts))
        elif cmd == "noise":
            parts = [f"{aname('noise')} noise"]
            parts += [str(a) for a in st.args if isinstance(a, str)]
            L.append(" ".join(parts))
        elif cmd in ("ic", "nodeset"):
            L.append(cmd + " " + " ".join(
                f"{k}={emit_val(v, self.dialect)}"
                for k, v in st.kwargs.items()))
        elif cmd == "global":
            L.append("global " + " ".join(st.args))
        elif cmd == "option":
            L.append("opts1 options " + " ".join(
                f"{k}={emit_val(v, self.dialect)}"
                for k, v in st.kwargs.items()))
        elif cmd == "temp":
            L.append(f"opts_temp options temp={st.args[0]}")
        elif cmd in ("hdl", "va"):
            L.append(f'ahdl_include "{st.args[0]}"')
        elif cmd == "funcdecl":
            name, args, body = st.args
            argl = ", ".join(f"real {a}" for a in args)
            L.append(f"real {name}({argl}) {{ return "
                     f"{emit_expr(body, self.dialect)}; }}")
        elif cmd in ("meas", "measure"):
            L.append("// (no Spectre equivalent) " + st.loc.src.strip())
        elif cmd in ("print", "plot", "save", "probe", "width", "end",
                     "backanno", "data", "four", "tf", "alterstmt",
                     "altergroup"):
            if st.loc is not None and st.loc.src:
                L.append("// " + st.loc.src.strip())
        else:
            L.append("// unconverted: " +
                     (st.loc.src.strip() if st.loc else cmd))


# ------------------------------------------------------------- SPICE output

_WAVE_ORDER = {"pulse": 7, "sin": 6, "sine": 6, "exp": 6, "pwl": None}


class SpiceEmitter:
    dialect = "spice"

    def __init__(self, in_dialect="spectre"):
        self.lines = []
        self.in_dialect = in_dialect

    def emit(self, netlist: P.SpiceNetlist) -> str:
        self.lines = [netlist.title or
                      "* converted by cedarsim_tpu.tools.convert"]
        self.stmts(netlist.statements)
        self.lines.append(".end")
        return "\n".join(self.lines) + "\n"

    def stmts(self, stmts):
        for st in stmts:
            self.stmt(st)

    def kw(self, params, skip=()):
        return [f"{k}={emit_val(v, self.dialect)}"
                for k, v in params.items() if k not in skip and v is not None]

    def stmt(self, st):
        L = self.lines
        if isinstance(st, P.Param):
            for k, v in st.assignments:
                L.append(f".param {k}={emit_val(v, self.dialect)}")
        elif isinstance(st, P.Model):
            mtype, extra = _spectre_model_to_spice(st.mtype, st.params)
            parts = [f".model {st.name} {mtype}"]
            parts += self.kw(extra)
            parts += self.kw(st.params, skip=("type",))
            L.append(" ".join(parts))
        elif isinstance(st, P.Subckt):
            head = [f".subckt {st.name}"] + list(st.nodes)
            head += self.kw(st.params)
            L.append(" ".join(head))
            body = [s for s in st.body
                    if not (isinstance(s, P.Param)
                            and all(k in st.params
                                    for k, _ in s.assignments))]
            self.stmts(body)
            L.append(".ends " + st.name)
        elif isinstance(st, P.Include):
            if st.section:
                L.append(f'.lib "{st.path}" {st.section}')
            else:
                L.append(f'.include "{st.path}"')
        elif isinstance(st, P.LibSection):
            L.append(f".lib {st.name}")
            self.stmts(st.body)
            L.append(f".endl {st.name}")
        elif isinstance(st, P.Element):
            self.element(st)
        elif isinstance(st, P.Control):
            self.control(st)
        elif isinstance(st, P.IfBlock):
            for i, (cond, body) in enumerate(st.branches):
                if cond is None:
                    L.append(".else")
                else:
                    k = ".if" if i == 0 else ".elseif"
                    L.append(f"{k} ({emit_expr(cond, self.dialect)})")
                self.stmts(body)
            L.append(".endif")
        elif isinstance(st, P.ErrorNode):
            L.append(f"* PARSE ERROR preserved: {st.message}")
        else:
            raise ConvertError(f"cannot convert {type(st).__name__}")

    def element(self, el: P.Element):
        L = self.lines
        name = el.name
        if not name.lower().startswith(el.letter):
            name = el.letter + name
        parts = [name] + list(el.nodes)
        if el.model is not None:
            # for f/h the model slot is the control source; emit positionally
            parts.append(el.model)
        for v in el.values:
            parts.append(emit_val(v, self.dialect))
        for kind, args in el.waves:
            a = " ".join(emit_val(x, self.dialect, top=False) for x in args)
            parts.append(f"{kind.upper()}({a})")
        parts += self.kw(el.params)
        L.append(" ".join(parts))

    def control(self, st: P.Control):
        L = self.lines
        cmd = st.cmd
        if cmd == "funcdecl":
            name, args, body = st.args
            L.append(f".param {name}({','.join(args)})="
                     f"{{{emit_expr(body, self.dialect)}}}")
            return
        if cmd in ("ic", "nodeset"):
            L.append(f".{cmd} " + " ".join(
                f"v({k})={emit_val(v, self.dialect)}"
                for k, v in st.kwargs.items()))
            return
        if cmd in ("hdl", "va"):
            L.append(f'.hdl "{st.args[0]}"')
            return
        if cmd == "op":
            L.append(".op")
            return
        def tok(a):
            if isinstance(a, str):
                from cedarsim_tpu.frontend.numbers import parse_number
                v = parse_number(a, self.in_dialect)
                return fmt_num(v) if v is not None else a
            return fmt_num(a)

        parts = [f".{cmd}"]
        parts += [tok(a) for a in st.args
                  if not isinstance(a, (list, tuple, dict))]
        parts += self.kw(st.kwargs)
        L.append(" ".join(parts))


# ------------------------------------------------------------ model DB

def extract_models(netlist: P.SpiceNetlist, source="<netlist>"):
    """Collect every .model card (recursing into subckts/lib sections) —
    the reference's extract_model_definitions
    (SpiceArmyKnife.jl/src/va_models.jl)."""
    out = []

    def walk(stmts, scope):
        for st in stmts:
            if isinstance(st, P.Model):
                params = {}
                for k, v in st.params.items():
                    try:
                        params[k] = (float(v) if isinstance(v, (int, float))
                                     else emit_expr(v, "spice"))
                    except ConvertError:
                        params[k] = repr(v)
                out.append(dict(name=st.name, kind=st.mtype, scope=scope,
                                source=source, params=params))
            body = getattr(st, "body", None)
            if isinstance(body, list):
                nm = getattr(st, "name", None)
                walk(body, scope + [nm] if nm else scope)
            if isinstance(st, P.IfBlock):
                for _, b in st.branches:
                    walk(b, scope)

    walk(netlist.statements, [])
    return out


# ------------------------------------------------------------------ driver

def detect_dialect(text: str) -> str:
    for line in text.splitlines()[:50]:
        ls = line.strip().lower()
        if ls.startswith("simulator") and "lang=spectre" in ls.replace(
                " ", ""):
            return "spectre"
        if ls.startswith("//"):
            return "spectre"
    return "spice"


def parse_any(text: str, dialect="auto", file="<netlist>"):
    if dialect == "auto":
        dialect = detect_dialect(text)
    if dialect == "spectre":
        from cedarsim_tpu.frontend.spectre import parse_spectre
        return parse_spectre(text, file=file), "spectre"
    return P.parse_spice(text, file=file), "spice"


def convert_text(text: str, input_dialect="auto", output_dialect="spectre",
                 file="<netlist>") -> str:
    nl, ind = parse_any(text, input_dialect, file)
    if output_dialect == "spectre":
        return SpectreEmitter(in_dialect=ind).emit(nl)
    if output_dialect in ("spice", "ngspice", "hspice"):
        return SpiceEmitter(in_dialect=ind).emit(nl)
    raise ConvertError(f"unknown output dialect {output_dialect!r}")


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="cedarsim-convert",
        description="Convert netlists between SPICE and Spectre dialects "
                    "(spak-convert equivalent)")
    ap.add_argument("input")
    ap.add_argument("output", nargs="?")
    ap.add_argument("--input-simulator", default="auto",
                    choices=["auto", "spice", "ngspice", "hspice",
                             "spectre"])
    ap.add_argument("--output-simulator", default="spectre",
                    choices=["spice", "ngspice", "hspice", "spectre"])
    ap.add_argument("--extract-models", metavar="DB_JSON",
                    help="also write all .model cards as a JSON model DB")
    a = ap.parse_args(argv)
    with open(a.input) as f:
        text = f.read()
    ind = a.input_simulator
    if ind in ("ngspice", "hspice"):
        ind = "spice"
    nl, ind = parse_any(text, ind, file=a.input)
    if a.extract_models:
        with open(a.extract_models, "w") as f:
            json.dump(extract_models(nl, source=a.input), f, indent=1)
    if a.output:
        out = (SpectreEmitter(in_dialect=ind)
               if a.output_simulator == "spectre"
               else SpiceEmitter(in_dialect=ind)).emit(nl)
        with open(a.output, "w") as f:
            f.write(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
