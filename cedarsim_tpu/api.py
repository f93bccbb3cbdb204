"""High-level netlist-in → results-out API.

The reference's equivalents: ``tran!(::ParsedCircuit)`` reads the tspan from
the netlist's ``.tran`` via ``find_default_tspan`` and
``solve(ps::ParsedCircuit)`` (/root/reference/src/circsummary.jl:109-128,
src/sweeps.jl:450-465).  Spectre ``altergroup``/``alter`` statements split
the run into segments — analyses after an alter see the altered parameters
(the reference re-emits and re-elaborates, src/spectre.jl:1773-1829; here
each segment re-elaborates with the altergroup bodies spliced in).
"""

from __future__ import annotations

from cedarsim_tpu.core.compile import (compile_circuit, default_ctx,
                                        ensure_dynamic)
from cedarsim_tpu.core.context import SimSpec
from cedarsim_tpu.frontend.elaborate import load_spice, elaborate
from cedarsim_tpu.frontend.parser import parse_spice
from cedarsim_tpu.frontend.spectre import parse_mixed
from cedarsim_tpu.analysis.dc import solve_dc
from cedarsim_tpu.analysis.tran import tran, TranOptions
from cedarsim_tpu.analysis import ac as ac_mod


def find_tran_directive(circuit):
    """(tstep, tstop, tstart, hmax) from the netlist ``.tran`` or None."""
    for cmd, args, kw in circuit.directives:
        if cmd == "tran":
            nums = [a for a in args if isinstance(a, (int, float))]
            uic = any(isinstance(a, str) and a.lower() == "uic" for a in args)
            tstep = nums[0] if len(nums) > 0 else None
            tstop = nums[1] if len(nums) > 1 else (nums[0] if nums else None)
            tstart = nums[2] if len(nums) > 2 else 0.0
            hmax = nums[3] if len(nums) > 3 else None
            return dict(tstep=tstep, tstop=tstop, tstart=tstart, hmax=hmax,
                        uic=uic)
    return None


def find_ac_directive(circuit):
    for cmd, args, kw in circuit.directives:
        if cmd == "ac":
            mode = args[0] if args and isinstance(args[0], str) else "dec"
            nums = [a for a in args if isinstance(a, (int, float))]
            n, f1, f2 = int(nums[0]), nums[1], nums[2]
            return dict(mode=mode.lower(), n=n, fstart=f1, fstop=f2)
    return None


_ANALYSIS_CMDS = ("op", "tran", "dc", "ac", "noise")


def _as_name(v):
    if isinstance(v, tuple) and len(v) == 2 and v[0] == "ref":
        return str(v[1])
    return str(v)


def _alter_segments(stmts):
    """Split a statement list at altergroup/alter statements.  Returns None
    when there are no alters, else a list of (stmt_list, label): segment k
    contains every non-analysis statement, the bodies of alters 0..k-1
    spliced at their original positions (sequential param/model collection
    makes later definitions win), and only segment k's analyses."""
    from cedarsim_tpu.frontend import parser as P

    def is_alter(st):
        return isinstance(st, P.Control) and st.cmd in ("altergroup",
                                                        "alterstmt")

    alters = [i for i, st in enumerate(stmts) if is_alter(st)]
    if not alters:
        return None
    bounds = [-1] + alters + [len(stmts) + 1]
    segs = []
    for k in range(len(alters) + 1):
        lo, hi = bounds[k], bounds[k + 1]
        seg = []
        for i, st in enumerate(stmts):
            if is_alter(st):
                if i <= lo:
                    if st.cmd == "altergroup":
                        seg.extend(st.args[1])
                    else:
                        seg.append(st)   # device alter: applied post-elab
                continue
            if isinstance(st, P.Control) and st.cmd in _ANALYSIS_CMDS:
                if lo < i < hi:
                    seg.append(st)
                continue
            seg.append(st)
        label = _as_name(stmts[alters[k - 1]].args[0]) if k else None
        segs.append((seg, label))
    return segs


def simulate(text_or_circuit, include_paths=(), params=None, temp=None,
             tran_opts: TranOptions = None, file="<netlist>", mc_seed=None,
             dialect=None):
    """Run the analyses requested by the netlist's directives.

    ``dialect``: "spice", "spectre", or None to auto-detect (``simulator
    lang=`` or a .scs filename selects Spectre).
    Returns a dict: ``{"op": DCResult, "tran": TranSolution, "ac": ACSolution}``
    with only the requested entries; analyses after an ``altergroup``/
    ``alter`` statement appear under suffixed keys (``"tran@<name>"``).
    """
    if isinstance(text_or_circuit, str):
        text = text_or_circuit
        if dialect is None:
            dialect = ("spectre" if "simulator lang" in text.lower()
                       or str(file).endswith(".scs") else "spice")
        if dialect == "spectre" or "simulator lang" in text.lower():
            start = "spectre" if dialect == "spectre" else "spice"
            nl = parse_mixed(text, file=file, start_lang=start)
        else:
            nl = parse_spice(text, file=file)
        segs = _alter_segments(nl.statements)
        if segs is not None:
            from cedarsim_tpu.frontend.parser import SpiceNetlist
            out = {}
            for k, (stmts, label) in enumerate(segs):
                nl_k = SpiceNetlist(nl.title, stmts, nl.path)
                circuit = elaborate(nl_k, include_paths=include_paths,
                                    params=params, mc_seed=mc_seed)
                res = _run_circuit(circuit, temp, tran_opts)
                if k == 0:
                    out.update(res)
                else:
                    sfx = label or f"alter{k}"
                    out.update({f"{key}@{sfx}": v for key, v in res.items()})
            return out
        circuit = elaborate(nl, include_paths=include_paths,
                            params=params, mc_seed=mc_seed)
    else:
        circuit = text_or_circuit
    return _run_circuit(circuit, temp, tran_opts)


def _run_circuit(circuit, temp=None, tran_opts=None):
    compiled = compile_circuit(circuit)
    run_params = None
    # device-targeted alter statements (a1 alter dev=r1 param=r value=2k)
    for cmd, args, kw in circuit.directives:
        if cmd == "alterstmt" and "dev" in kw and "param" in kw:
            dotted = f"{_as_name(kw['dev'])}.{_as_name(kw['param'])}".lower()
            compiled = ensure_dynamic(compiled, [dotted])
            run_params = compiled.set_param(
                run_params if run_params is not None else compiled.params0,
                dotted, float(kw.get("value", 0.0)))
    ctx = default_ctx(compiled, temp_c=temp)
    out = {"circuit": circuit, "compiled": compiled}
    ran_any = False
    for cmd, args, kw in circuit.directives:
        if cmd == "op" and "op" not in out:
            out["op"] = solve_dc(compiled, params=run_params, ctx=ctx)
            ran_any = True
        elif cmd == "tran" and "tran" not in out:
            d = find_tran_directive(circuit)
            opts = tran_opts
            if opts is None:
                okw = {}
                span = max(d["tstop"] - (d["tstart"] or 0.0), 1e-30)
                if d["hmax"]:
                    okw["hmax_frac"] = d["hmax"] / span
                elif d.get("tstep"):
                    # ngspice caps the internal step near tstep; without a
                    # bound, circuits driven only by smooth (breakpoint-
                    # free) sources can leap whole cycles
                    okw["hmax_frac"] = min(0.04, 5.0 * d["tstep"] / span)
                if d["uic"]:
                    okw["uic"] = True
                # ngspice `.options method=gear|trap maxord=N`: gear is
                # BDF — maxord 2 (the ngspice default) maps to the bdf2
                # ladder, 3 to bdf3, 4+ to the order-5 ladder
                o = getattr(circuit, "options", {}) or {}
                m = str(o.get("method", "")).lower()
                if m in ("trap", "trapezoidal"):
                    okw["method"] = "trap"
                elif m == "gear":
                    mo = int(o.get("maxord", 2))
                    okw["method"] = ("bdf2" if mo <= 2
                                     else "bdf3" if mo == 3 else "bdf5")
                # .save/.probe cards project the stored waveforms
                # (ngspice semantics: only saved vectors are kept —
                # O(steps·len(save)) memory instead of O(steps·n_x));
                # "all" or a current probe (.save i(v1), not a state
                # column) keeps the full buffers
                saved = []
                full = False
                for c2, a2, _ in circuit.directives:
                    if c2 == "save":
                        for t in a2:
                            if t == "all" or t.endswith(".i"):
                                full = True
                            else:
                                saved.append(t)
                if saved and not full:
                    okw["store_vars"] = tuple(dict.fromkeys(saved))
                opts = TranOptions(**okw)
            out["tran"] = tran(compiled, (0.0, d["tstop"]), params=run_params,
                               ctx=ctx, opts=opts)
            ran_any = True
        elif cmd == "dc" and "dc" not in out and args:
            # .dc src start stop step [src2 ...] — batched sweep
            import numpy as np
            from cedarsim_tpu.analysis.sweeps import (Sweep, ProductSweep,
                                                      dc_sweep)
            sweeps = []
            i = 0
            while i + 3 < len(args) + 1 and i < len(args):
                if not isinstance(args[i], str):
                    break
                src = args[i].lower()
                nums = args[i + 1:i + 4]
                if len(nums) < 3 or any(isinstance(a, str) for a in nums):
                    break
                start, stop, step = nums
                vals = np.arange(start, stop + step * 0.5, step)
                pname = src + ".dc" if not src.endswith(".dc") else src
                sweeps.append(Sweep(pname, vals))
                i += 4
            if sweeps:
                sw = sweeps[0] if len(sweeps) == 1 else ProductSweep(*sweeps)
                out["dc"] = dc_sweep(compiled, sw, params=run_params, ctx=ctx)
                out["dc_sweep"] = sw
                ran_any = True
        elif cmd == "noise" and "noise" not in out:
            # .noise v(out) src dec n f1 f2
            words = [a for a in args if isinstance(a, str)]
            nums = [a for a in args if isinstance(a, (int, float))]
            outname = words[0].lower() if words else None
            if outname in ("v",) and len(words) > 1:
                outname = words[1].lower()
            n_, f1, f2 = ((int(nums[0]), nums[1], nums[2])
                          if len(nums) >= 3 else (10, 1.0, 1e9))
            freqs = ac_mod.acdec(n_, f1, f2)
            from cedarsim_tpu.analysis.ac import noise as _noise
            out["noise"] = _noise(compiled, outname, freqs, ctx=ctx,
                                  params=run_params)
            ran_any = True
        elif cmd == "ac" and "ac" not in out:
            d = find_ac_directive(circuit)
            if d["mode"] == "dec":
                freqs = ac_mod.acdec(d["n"], d["fstart"], d["fstop"])
            else:
                import numpy as np
                freqs = np.linspace(d["fstart"], d["fstop"], d["n"])
            out["ac"] = ac_mod.ac(compiled, freqs, ctx=ctx, params=run_params)
            ran_any = True
    if not ran_any:
        out["op"] = solve_dc(compiled, params=run_params, ctx=ctx)
    # .measure evaluates against whichever analyses ran (tran/ac/dc —
    # the reference parses MEAS forms under every analysis)
    from cedarsim_tpu.analysis.measure import evaluate_all, fourier
    meas = evaluate_all(out, circuit)
    if meas:
        out["measures"] = meas
    if "tran" in out:
        for cmd, args, kw in circuit.directives:
            if cmd == "four" and args:
                freq = args[0]
                names = []
                rest = [str(a) for a in args[1:]]
                i = 0
                while i < len(rest):
                    if rest[i].lower() in ("v", "i") and i + 1 < len(rest):
                        names.append(f"{rest[i]}({rest[i+1]})")
                        i += 2
                    else:
                        names.append(rest[i])
                        i += 1
                out.setdefault("fourier", {}).update(
                    fourier(out["tran"], float(freq), names))
    return out
