""".measure evaluation over transient solutions.

Reference parses MEAS forms in its SPICE CST
(/root/reference/SpectreNetlistParser.jl/src/SPICE/parse/forms.jl MEAS
forms); evaluation subset here: FIND ... AT=, MAX/MIN/AVG/RMS/PP with
FROM/TO windows, WHEN <sig>=<val> with RISE/FALL/CROSS counts, and
TRIG/TARG delay measurements.
"""

from __future__ import annotations

import re

import numpy as np


class MeasureError(ValueError):
    pass


class MeasureResults(dict):
    """name -> value dict; failed measures get value None with the failure
    message in ``.errors[name]``."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.errors = {}


# np.trapezoid is NumPy >= 2.0; fall back to the old name on 1.x.
_trapezoid = getattr(np, "trapezoid", None) or np.trapz


_NUM = r"[-+]?[\d.]+(?:[eE][-+]?\d+)?[a-zA-Z]*"


def _num(s):
    from cedarsim_tpu.frontend.numbers import parse_number
    v = parse_number(s)
    if v is None:
        raise MeasureError(f"bad number {s!r}")
    return v


def _sig(sol, spec):
    spec = spec.strip()
    m = re.match(r"^[vV]\(\s*([^,)]+)\s*(?:,\s*([^)]+)\s*)?\)$", spec)
    if m:
        a = sol[m.group(1).lower()]
        if m.group(2):
            return a - sol[m.group(2).lower()]
        return a
    m = re.match(r"^[iI]\(\s*([^)]+)\s*\)$", spec)
    if m:
        return sol[m.group(1).lower() + ".I"]
    return sol[spec.lower()]


def _crossings(ts, y, val, kind="cross"):
    d = y - val
    s = np.sign(d)
    idx = np.nonzero(np.diff(s) != 0)[0]
    out = []
    for i in idx:
        rising = y[i + 1] > y[i]
        if kind == "rise" and not rising:
            continue
        if kind == "fall" and rising:
            continue
        # linear interpolation of the crossing time
        t = ts[i] + (val - y[i]) * (ts[i + 1] - ts[i]) / (y[i + 1] - y[i])
        out.append(t)
    return out


def evaluate_measure(sol, line: str):
    """Evaluate one .meas statement against a TranSolution. Returns
    (name, value)."""
    toks = line.split()
    if toks[0].lower().startswith(".meas"):
        toks = toks[1:]
    if toks and toks[0].lower() in ("tran", "ac", "dc"):
        toks = toks[1:]
    if not toks:
        raise MeasureError(f"empty .measure: {line!r}")
    name = toks[0]
    rest = " ".join(toks[1:])
    low = rest.lower()

    kw = dict(re.findall(r"(\w+)\s*=\s*('[^']*'|[^\s]+)", rest))
    kw = {k.lower(): v.strip("'") for k, v in kw.items()}
    t0 = _num(kw["from"]) if "from" in kw else float(sol.ts[0])
    t1 = _num(kw["to"]) if "to" in kw else float(sol.ts[-1])
    win = (sol.ts >= t0) & (sol.ts <= t1)

    m = re.match(r"^\s*find\s+(\S+)\s+at\s*=", low)
    if m or ("find" in low and "at" in kw):
        sigspec = re.search(r"find\s+(\S+)", rest, re.I).group(1)
        y = _sig(sol, sigspec)
        return name, float(np.interp(_num(kw["at"]), sol.ts, y))

    m = re.match(r"^\s*(max|min|avg|rms|pp|integ)\s+(\S+)", rest, re.I)
    if m:
        op, sigspec = m.group(1).lower(), m.group(2)
        y = _sig(sol, sigspec)[win]
        t = sol.ts[win]
        if op == "max":
            return name, float(y.max())
        if op == "min":
            return name, float(y.min())
        if op == "pp":
            return name, float(y.max() - y.min())
        if op == "avg":
            return name, float(_trapezoid(y, t) / (t[-1] - t[0]))
        if op == "rms":
            return name, float(np.sqrt(_trapezoid(y * y, t)
                                       / (t[-1] - t[0])))
        if op == "integ":
            return name, float(_trapezoid(y, t))

    m = re.match(r"^\s*when\s+(\S+)\s*=\s*(\S+)", rest, re.I)
    if m:
        y = _sig(sol, m.group(1))
        val = _num(m.group(2))
        kind = "cross"
        nth = 1
        for k in ("rise", "fall", "cross"):
            if k in kw:
                kind = k
                nth = (int(_num(kw[k])) if kw[k].lower() != "last"
                       else -1)
        cr = _crossings(sol.ts, y, val, kind)
        if not cr:
            raise MeasureError(f"{name}: no {kind} crossing of {val}")
        return name, float(cr[nth - 1 if nth > 0 else -1])

    m = re.match(r"^\s*trig\s+(\S+)\s+val\s*=\s*(\S+)(.*?)targ\s+(\S+)\s+"
                 r"val\s*=\s*(\S+)(.*)$", rest, re.I | re.S)
    if m:
        y1 = _sig(sol, m.group(1))
        v1 = _num(m.group(2))
        mid = m.group(3).lower()
        y2 = _sig(sol, m.group(4))
        v2 = _num(m.group(5))
        tail = m.group(6).lower()

        def kindn(txt):
            mm = re.search(r"(rise|fall|cross)\s*=\s*(\d+)", txt)
            if mm:
                return mm.group(1), int(mm.group(2))
            return "cross", 1

        k1, n1 = kindn(mid)
        k2, n2 = kindn(tail)
        c1 = _crossings(sol.ts, y1, v1, k1)
        c2 = _crossings(sol.ts, y2, v2, k2)
        if len(c1) < n1 or len(c2) < n2:
            raise MeasureError(f"{name}: trig/targ crossing not found")
        return name, float(c2[n2 - 1] - c1[n1 - 1])

    raise MeasureError(f"unsupported .measure form: {line!r}")


def measure_name(line: str) -> str:
    """The measure's name token (first token after `.meas [analysis]`)."""
    toks = line.split()
    if toks and toks[0].lower().startswith(".meas"):
        toks = toks[1:]
    if toks and toks[0].lower() in ("tran", "ac", "dc"):
        toks = toks[1:]
    return toks[0] if toks else line


def evaluate_all(sol, circuit) -> MeasureResults:
    out = MeasureResults()
    for cmd, args, kw in circuit.directives:
        if cmd in ("meas", "measure"):
            name = measure_name(args[0])
            try:
                _, out[name] = evaluate_measure(sol, args[0])
            except MeasureError as e:
                out[name] = None
                out.errors[name] = str(e)
    return out


def fourier(sol, freq: float, names, n_harmonics: int = 9):
    """SPICE .FOUR: DFT of the last full period of each waveform at
    ``freq``; returns {name: dict(f0_mag, harmonics=[(k, mag, phase_deg)],
    thd_percent)}."""
    t1 = float(sol.ts[-1])
    t0 = t1 - 1.0 / freq
    if t0 < float(sol.ts[0]):
        raise MeasureError(".four: simulation shorter than one period")
    m = 512
    tg = np.linspace(t0, t1, m, endpoint=False)
    out = {}
    for name in names:
        y = np.interp(tg, sol.ts, _sig(sol, name))
        spec = np.fft.rfft(y) / m
        mags = 2.0 * np.abs(spec[1:n_harmonics + 1])
        phases = np.degrees(np.angle(spec[1:n_harmonics + 1]))
        thd = (np.sqrt(np.sum(mags[1:] ** 2)) / mags[0] * 100.0
               if mags[0] > 0 else float("inf"))
        out[name] = dict(
            dc=float(np.real(spec[0])), f0_mag=float(mags[0]),
            harmonics=[(k + 1, float(mags[k]), float(phases[k]))
                       for k in range(n_harmonics)],
            thd_percent=float(thd))
    return out
