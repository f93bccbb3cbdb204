"""MOSFET level 1 (Shichman–Hodges) — the built-in MOS model for ``.model
... nmos/pmos level=1`` until compiled Verilog-A BSIM4/BSIM-CMG takes over
(the reference maps level 14/54 → BSIM4, 17/72 → BSIM-CMG via
``spice_select_device``, /root/reference/src/spectre.jl:589-630).

Symmetric drain/source formulation (branchless swap on vds sign), channel
length modulation, body effect, overlap + Meyer-style gate capacitances and
junction depletion charges.  PMOS is the same class with ``ptype=-1``
(polarity flip), so N and P devices of one netlist batch into two vmapped
groups.
"""

from __future__ import annotations

import jax.numpy as jnp

from cedarsim_tpu.devices.base import DeviceModel
from cedarsim_tpu.devices.simple import _limexp


class Mos1(DeviceModel):
    terminals = ("d", "g", "s", "b")
    params = dict(
        ptype=1.0,      # +1 NMOS, -1 PMOS (set by elaborator from model type)
        vto=0.0, kp=2e-5, gamma=0.0, phi=0.6, lam=0.0,
        w=100e-6, l=100e-6, ld=0.0,
        cgso=0.0, cgdo=0.0, cgbo=0.0,
        cbd=0.0, cbs=0.0, pb=0.8, mj=0.5, fc=0.5,
        **{"is": 1e-14},
        tox=0.0, nsub=0.0, u0=0.0,   # accepted, only used if kp not given
        rd=0.0, rs=0.0,              # accepted, currently ignored
    )
    given_params = ("kp",)

    @staticmethod
    def eval(lv, p, ctx, eps):
        vd, vg, vs, vb = lv[0], lv[1], lv[2], lv[3]
        sgn = p["ptype"]
        # polarity flip: PMOS analyzed as NMOS in flipped coordinates
        vd_, vg_, vs_, vb_ = sgn * vd, sgn * vg, sgn * vs, sgn * vb

        # symmetric swap so vds >= 0
        rev = vd_ < vs_
        vhi = jnp.maximum(vd_, vs_)
        vlo = jnp.minimum(vd_, vs_)
        vds = vhi - vlo
        vgs = vg_ - vlo
        vbs = vb_ - vlo

        kp = jnp.where(p["kp$given"] > 0, p["kp"], 2e-5)
        leff = jnp.maximum(p["l"] - 2.0 * p["ld"], 1e-9)
        beta = kp * p["w"] / leff
        phi = jnp.maximum(p["phi"], 1e-3)
        # body effect (sqrt clamped for forward body bias)
        sqarg = jnp.sqrt(jnp.maximum(phi - vbs, 1e-6))
        # SPICE sign convention: PMOS vto is negative; in the flipped
        # (NMOS-equivalent) frame the threshold is sgn·vto
        vth = sgn * p["vto"] + p["gamma"] * (sqarg - jnp.sqrt(phi))
        vgst = vgs - vth
        clm = 1.0 + p["lam"] * vds
        id_tri = beta * (vgst - 0.5 * vds) * vds * clm
        id_sat = 0.5 * beta * vgst * vgst * clm
        ido = jnp.where(vgst <= 0.0, 0.0,
                        jnp.where(vds < vgst, id_tri, id_sat))
        # un-swap and un-flip; add gmin for convergence
        ids = sgn * jnp.where(rev, -ido, ido) + ctx.gmin * (vd - vs)

        # gate overlap charges (linear) — Meyer intrinsic caps omitted at
        # level-1 fidelity; overlaps dominate switching for digital circuits
        w = p["w"]
        qgs = p["cgso"] * w * (vg - vs)
        qgd = p["cgdo"] * w * (vg - vd)
        qgb = p["cgbo"] * leff * (vg - vb)
        # junction depletion (simple linearized depletion charge)
        def qjunc(v, cj):
            # charge for C(v) = cj/(1-v/pb)^mj, linearized past fc·pb
            pb, mjj, fc = p["pb"], p["mj"], p["fc"]
            below = cj * pb / (1 - mjj) * (
                1.0 - jnp.power(jnp.maximum(1.0 - v / pb, 1e-6), 1 - mjj))
            f1 = pb / (1 - mjj) * (1.0 - jnp.power(1 - fc, 1 - mjj))
            f2 = jnp.power(1 - fc, -(1 + mjj))
            above = cj * (f1 + f2 * ((1 - fc * (1 + mjj)) * (v - fc * pb)
                                     + 0.5 * mjj / pb * (v * v - fc * fc * pb * pb)))
            return jnp.where(v < fc * pb, below, above)

        # bulk junctions (reverse-biased in normal operation); polarity flip.
        # charge on the bulk plate: q_b = +qjunc so ∂q_b/∂vb = +C
        qbd = sgn * qjunc(sgn * (vb - vd), p["cbd"])
        qbs = sgn * qjunc(sgn * (vb - vs), p["cbs"])
        # junction leakage diodes b-d, b-s
        vt = ctx.vt
        ibd = sgn * (p["is"] * (_limexp(sgn * (vb - vd) / vt) - 1.0)) \
            + ctx.gmin * (vb - vd)
        ibs = sgn * (p["is"] * (_limexp(sgn * (vb - vs) / vt) - 1.0)) \
            + ctx.gmin * (vb - vs)

        i_d = ids - ibd
        i_g = jnp.zeros_like(ids)
        i_s = -ids - ibs
        i_b = ibd + ibs
        q_d = -qgd - qbd
        q_g = qgs + qgd + qgb
        q_s = -qgs - qbs
        q_b = -qgb + qbd + qbs
        return (jnp.stack([i_d, i_g, i_s, i_b]),
                jnp.stack([q_d, q_g, q_s, q_b]))
