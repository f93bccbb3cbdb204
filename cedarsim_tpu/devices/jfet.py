"""JFET (SPICE level-1 Shichman–Hodges) and MESFET (Statz) — the J and Z
element letters.  The reference parses both card types
(/root/reference/SpectreNetlistParser.jl/src/SPICE/parse/forms.jl JFET /
MESFET forms) but implements neither device (unknown models fall to
``UnimplementedDevice``, /root/reference/src/spectre.jl:606-630) — working
J/Z devices are capability beyond parity.

Both are 3-terminal (d, g, s) with symmetric drain/source swap, gate
junction diodes + depletion charges, and a polarity flag so N and P devices
batch into vmapped groups exactly like :class:`~cedarsim_tpu.devices.mos.Mos1`.
"""

from __future__ import annotations

import jax.numpy as jnp

from cedarsim_tpu.devices.base import DeviceModel
from cedarsim_tpu.devices.simple import _limexp


def _qjunc(v, cj, pb, mj, fc):
    """Depletion charge for C(v) = cj/(1-v/pb)^mj, linearized past fc*pb
    (same construction as Mos1's junction charge)."""
    below = cj * pb / (1 - mj) * (
        1.0 - jnp.power(jnp.maximum(1.0 - v / pb, 1e-6), 1 - mj))
    f1 = pb / (1 - mj) * (1.0 - jnp.power(1 - fc, 1 - mj))
    f2 = jnp.power(1 - fc, -(1 + mj))
    above = cj * (f1 + f2 * ((1 - fc * (1 + mj)) * (v - fc * pb)
                             + 0.5 * mj / pb * (v * v - fc * fc * pb * pb)))
    return jnp.where(v < fc * pb, below, above)


class Jfet(DeviceModel):
    """SPICE JFET (NJF/PJF, Shichman–Hodges): square-law channel with
    channel-length modulation, gate-source/gate-drain junction diodes and
    0.5-graded depletion capacitances.  ``area`` scales beta/is/caps
    (applied by the elaborator from the card's area factor)."""
    terminals = ("d", "g", "s")
    params = dict(
        ptype=1.0,          # +1 NJF, -1 PJF
        vto=-2.0, beta=1e-4, lam=0.0,
        cgs=0.0, cgd=0.0, pb=1.0, fc=0.5,
        **{"is": 1e-14},
        n=1.0,
        rd=0.0, rs=0.0,     # accepted, currently ignored (like Mos1)
    )

    @staticmethod
    def eval(lv, p, ctx, eps):
        vd, vg, vs = lv[0], lv[1], lv[2]
        sgn = p["ptype"]
        vd_, vg_, vs_ = sgn * vd, sgn * vg, sgn * vs

        rev = vd_ < vs_
        vhi = jnp.maximum(vd_, vs_)
        vlo = jnp.minimum(vd_, vs_)
        vds = vhi - vlo
        vgs = vg_ - vlo

        # depletion-mode threshold: vto keeps its sign for both polarities
        # (ngspice jfetload convention)
        vgst = vgs - p["vto"]
        clm = 1.0 + p["lam"] * vds
        id_tri = p["beta"] * vds * (2.0 * vgst - vds) * clm
        id_sat = p["beta"] * vgst * vgst * clm
        ido = jnp.where(vgst <= 0.0, 0.0,
                        jnp.where(vds < vgst, id_tri, id_sat))
        ids = sgn * jnp.where(rev, -ido, ido) + ctx.gmin * (vd - vs)

        # gate junctions (diode current + depletion charge), in device
        # coordinates then flipped back
        vt = ctx.vt * p["n"]
        vgs_j = sgn * (vg - vs)
        vgd_j = sgn * (vg - vd)
        igs = sgn * (p["is"] * (_limexp(vgs_j / vt) - 1.0)) \
            + ctx.gmin * (vg - vs)
        igd = sgn * (p["is"] * (_limexp(vgd_j / vt) - 1.0)) \
            + ctx.gmin * (vg - vd)
        qgs = sgn * _qjunc(vgs_j, p["cgs"], p["pb"], 0.5, p["fc"])
        qgd = sgn * _qjunc(vgd_j, p["cgd"], p["pb"], 0.5, p["fc"])

        i_d = ids - igd
        i_g = igs + igd
        i_s = -ids - igs
        return (jnp.stack([i_d, i_g, i_s]),
                jnp.stack([-qgd, qgs + qgd, -qgs]))


class Mesfet(DeviceModel):
    """SPICE MESFET (NMF/PMF, Statz et al. 1987): ids =
    beta·vgst²/(1+b·vgst) · (1−(1−alpha·vds/3)³)·(1+lambda·vds) for
    vds < 3/alpha, saturating beyond; same gate junctions as the JFET."""
    terminals = ("d", "g", "s")
    params = dict(
        ptype=1.0,
        vto=-2.0, beta=2.5e-3, b=0.3, alpha=2.0, lam=0.0,
        cgs=0.0, cgd=0.0, pb=1.0, fc=0.5,
        **{"is": 1e-14},
        n=1.0,
        rd=0.0, rs=0.0,
    )

    @staticmethod
    def eval(lv, p, ctx, eps):
        vd, vg, vs = lv[0], lv[1], lv[2]
        sgn = p["ptype"]
        vd_, vg_, vs_ = sgn * vd, sgn * vg, sgn * vs

        rev = vd_ < vs_
        vhi = jnp.maximum(vd_, vs_)
        vlo = jnp.minimum(vd_, vs_)
        vds = vhi - vlo
        vgs = vg_ - vlo

        vgst = vgs - p["vto"]
        kq = p["beta"] * vgst * vgst / (1.0 + p["b"] * vgst)
        cut = 1.0 - p["alpha"] * vds / 3.0
        shape = jnp.where(cut > 0.0, 1.0 - cut * cut * cut, 1.0)
        ido = jnp.where(vgst <= 0.0, 0.0,
                        kq * shape * (1.0 + p["lam"] * vds))
        ids = sgn * jnp.where(rev, -ido, ido) + ctx.gmin * (vd - vs)

        vt = ctx.vt * p["n"]
        vgs_j = sgn * (vg - vs)
        vgd_j = sgn * (vg - vd)
        igs = sgn * (p["is"] * (_limexp(vgs_j / vt) - 1.0)) \
            + ctx.gmin * (vg - vs)
        igd = sgn * (p["is"] * (_limexp(vgd_j / vt) - 1.0)) \
            + ctx.gmin * (vg - vd)
        qgs = sgn * _qjunc(vgs_j, p["cgs"], p["pb"], 0.5, p["fc"])
        qgd = sgn * _qjunc(vgd_j, p["cgd"], p["pb"], 0.5, p["fc"])

        i_d = ids - igd
        i_g = igs + igd
        i_s = -ids - igs
        return (jnp.stack([i_d, i_g, i_s]),
                jnp.stack([-qgd, qgs + qgd, -qgs]))
