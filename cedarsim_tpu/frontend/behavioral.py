"""Behavioral (B-element / ngspice ``bsource``) arbitrary-expression sources.

Reference support: behavioral sources dispatch-on-kwargs in
SpectreEnvironment (/root/reference/src/spectre_env.jl:127-140) and the
``Behavioral`` SPICE CST form (SPICE/parse/forms.jl).  Here the expression
AST (frontend.expr) is interpreted at trace time with JAX ops; ``V(a[,b])``
and ``I(Vsrc)`` probes become control-variable gathers resolved by the
compiler, so behavioral sources participate in the Jacobian exactly like
native devices.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from cedarsim_tpu.devices.base import DeviceModel
from cedarsim_tpu.frontend.expr import expr_refs

_J_FUNCS1 = {
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan, "asin": jnp.arcsin,
    "acos": jnp.arccos, "atan": jnp.arctan, "arctan": jnp.arctan,
    "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
    "exp": jnp.exp, "ln": jnp.log, "log": jnp.log, "log10": jnp.log10,
    "sqrt": jnp.sqrt, "abs": jnp.abs, "int": jnp.trunc, "floor": jnp.floor,
    "ceil": jnp.ceil, "sgn": jnp.sign,
    "nint": jnp.round,
}
_J_FUNCS2 = {
    "pow": jnp.power, "pwr": lambda a, b: jnp.sign(a) * jnp.abs(a) ** b,
    "min": jnp.minimum, "max": jnp.maximum, "atan2": jnp.arctan2,
}


def collect_probes(ast):
    """Ordered unique probe list [("v", a, b|None) | ("i", name)] from a
    behavioral expression AST."""
    probes = []

    def walk(e):
        if not isinstance(e, tuple):
            return
        k = e[0]
        if k == "call":
            name = e[1].lower()
            if name == "v" and e[2]:
                args = []
                for a in e[2]:
                    if a[0] != "ref":
                        raise ValueError("V() probe arguments must be node "
                                         "names")
                    args.append(a[1].lower())
                key = ("v", args[0], args[1] if len(args) > 1 else None)
                if key not in probes:
                    probes.append(key)
                return
            if name == "i" and e[2]:
                a = e[2][0]
                if a[0] != "ref":
                    raise ValueError("I() probe argument must be a source "
                                     "name")
                key = ("i", a[1].lower())
                if key not in probes:
                    probes.append(key)
                return
            for a in e[2]:
                walk(a)
        elif k in ("bin",):
            walk(e[2]); walk(e[3])
        elif k in ("neg", "not"):
            walk(e[1])
        elif k == "cond":
            walk(e[1]); walk(e[2]); walk(e[3])

    walk(ast)
    return probes


def _eval_jax(ast, probe_vals, env, ctx):
    """Trace-time evaluation of a behavioral expression with jnp ops."""

    def ev(e):
        k = e[0]
        if k == "num":
            return e[1]
        if k == "ref":
            n = e[1].lower()
            if n in env:
                return env[n]
            if n == "time":
                return ctx.time
            if n in ("temper", "temp"):
                return ctx.temp - 273.15
            if n in ("pi", "m_pi"):
                return math.pi
            raise ValueError(f"behavioral expression: undefined {e[1]!r}")
        if k == "neg":
            return -ev(e[1])
        if k == "not":
            return jnp.where(ev(e[1]) != 0, 0.0, 1.0)
        if k == "bin":
            op = e[1]
            a, b = ev(e[2]), ev(e[3])
            if op == "+": return a + b
            if op == "-": return a - b
            if op == "*": return a * b
            if op == "/": return a / b
            if op == "%": return jnp.fmod(a, b)
            if op in ("**", "^"): return jnp.power(a, b)
            table = {"==": lambda: a == b, "!=": lambda: a != b,
                     "<": lambda: a < b, "<=": lambda: a <= b,
                     ">": lambda: a > b, ">=": lambda: a >= b,
                     "&&": lambda: (a != 0) & (b != 0),
                     "||": lambda: (a != 0) | (b != 0)}
            return jnp.asarray(table[op]()).astype(jnp.result_type(a, b, 1.0))
        if k == "cond":
            return jnp.where(ev(e[1]) != 0, ev(e[2]), ev(e[3]))
        if k == "call":
            name = e[1].lower()
            if name == "v":
                args = [a[1].lower() for a in e[2]]
                key = ("v", args[0], args[1] if len(args) > 1 else None)
                return probe_vals[key]
            if name == "i":
                return probe_vals[("i", e[2][0][1].lower())]
            vals = [ev(a) for a in e[2]]
            if name in _J_FUNCS1:
                return _J_FUNCS1[name](*vals)
            if name in _J_FUNCS2:
                return _J_FUNCS2[name](*vals)
            raise ValueError(f"behavioral expression: unknown function "
                             f"{e[1]!r}")
        raise ValueError(f"bad behavioral AST node {e!r}")

    return ev(ast)


def make_bsource(kind: str, ast, probes, const_env: dict, label: str):
    """Build a DeviceModel class for one behavioral source.

    ``kind``: 'v' or 'i'.  ``probes``: from collect_probes (its order defines
    the control-slot layout).  ``const_env``: parameter name -> float values
    resolved at elaboration.
    """
    n_ctrl = sum(2 if p[0] == "v" and p[2] is not None else 1
                 for p in probes)
    is_v = kind == "v"

    class BSource(DeviceModel):
        terminals = ("p", "n")
        n_branch = 1 if is_v else 0
        n_control = n_ctrl
        params = {}

        @classmethod
        def group_key(cls, inst_params):
            return f"BSource[{label}]"

        @staticmethod
        def eval(lv, p, ctx, eps):
            base = 2 + (1 if is_v else 0)
            probe_vals = {}
            off = base
            for pr in probes:
                if pr[0] == "v":
                    if pr[2] is None:
                        probe_vals[pr] = lv[off]
                        off += 1
                    else:
                        probe_vals[pr] = lv[off] - lv[off + 1]
                        off += 2
                else:
                    probe_vals[pr] = lv[off]
                    off += 1
            val = _eval_jax(ast, probe_vals, const_env, ctx)
            val = val * ctx.sourcefac
            if is_v:
                vp, vn, ib = lv[0], lv[1], lv[2]
                static = jnp.stack([ib, -ib, vp - vn - val])
            else:
                zval = val + jnp.zeros((), lv.dtype)
                static = jnp.stack([zval, -zval])
            return static, jnp.zeros_like(static)

    BSource.__name__ = f"BSource_{label}"
    return BSource


def probe_extras(probes, net_fn, prefix):
    """Convert probes to compiler control refs using the elaborator's net
    resolver."""
    extras = []
    for p in probes:
        if p[0] == "v":
            extras.append(("net", net_fn(p[1])))
            if p[2] is not None:
                extras.append(("net", net_fn(p[2])))
        else:
            extras.append(("branch", prefix + p[1]))
    return extras
