"""Bipolar junction transistor — Gummel-Poon (SPICE ``.model ... npn/pnp``).

Standard GP large-signal model: ideal + leakage junction diodes, Early and
high-injection base-charge modulation (q1/q2/qb), depletion (cje/cjc/cjs) and
diffusion (tf/tr) charges.  PNP handled by polarity flip so NPN and PNP batch
as two vmapped groups.  Needed for the bipolar-amplifier benchmark config
(/root/reference/scratch/bipolar_amplifier.cir, BASELINE.md).
"""

from __future__ import annotations

import jax.numpy as jnp

from cedarsim_tpu.devices.base import DeviceModel
from cedarsim_tpu.devices.simple import _limexp


def _qdep(v, cj, vj, mj, fc):
    below = cj * vj / (1 - mj) * (
        1.0 - jnp.power(jnp.maximum(1.0 - v / vj, 1e-6), 1 - mj))
    f1 = vj / (1 - mj) * (1.0 - jnp.power(1 - fc, 1 - mj))
    f2 = jnp.power(1 - fc, -(1 + mj))
    above = cj * (f1 + f2 * ((1 - fc * (1 + mj)) * (v - fc * vj)
                             + 0.5 * mj / vj * (v * v - fc * fc * vj * vj)))
    return jnp.where(v < fc * vj, below, above)


class Bjt(DeviceModel):
    terminals = ("c", "b", "e", "s")
    n_noise = 2   # collector + base shot noise
    params = dict(
        ptype=1.0,   # +1 NPN, -1 PNP
        **{"is": 1e-16}, bf=100.0, br=1.0, nf=1.0, nr=1.0,
        vaf=0.0, var=0.0, ikf=0.0, ikr=0.0,       # 0 = infinite (not given)
        ise=0.0, isc=0.0, ne=1.5, nc=2.0,
        cje=0.0, vje=0.75, mje=0.33,
        cjc=0.0, vjc=0.75, mjc=0.33,
        cjs=0.0, vjs=0.75, mjs=0.0,
        tf=0.0, tr=0.0, fc=0.5, area=1.0,
    )

    @staticmethod
    def eval(lv, p, ctx, eps):
        vc, vb, ve, vs = lv[0], lv[1], lv[2], lv[3]
        sgn = p["ptype"]
        vbe = sgn * (vb - ve)
        vbc = sgn * (vb - vc)
        vsc = sgn * (vs - vc)
        vt = ctx.vt
        a = p["area"]
        isat = p["is"] * a

        ibe1 = isat * (_limexp(vbe / (p["nf"] * vt)) - 1.0)
        ibc1 = isat * (_limexp(vbc / (p["nr"] * vt)) - 1.0)
        iben = p["ise"] * a * (_limexp(vbe / (p["ne"] * vt)) - 1.0)
        ibcn = p["isc"] * a * (_limexp(vbc / (p["nc"] * vt)) - 1.0)

        # base charge qb (Early + high injection); 0-valued vaf/ikf = infinite
        inv_vaf = jnp.where(p["vaf"] > 0, 1.0 / jnp.maximum(p["vaf"], 1e-30), 0.0)
        inv_var = jnp.where(p["var"] > 0, 1.0 / jnp.maximum(p["var"], 1e-30), 0.0)
        inv_ikf = jnp.where(p["ikf"] > 0, 1.0 / jnp.maximum(p["ikf"] * a, 1e-30), 0.0)
        inv_ikr = jnp.where(p["ikr"] > 0, 1.0 / jnp.maximum(p["ikr"] * a, 1e-30), 0.0)
        q1 = 1.0 / jnp.maximum(1.0 - vbc * inv_vaf - vbe * inv_var, 1e-4)
        q2 = ibe1 * inv_ikf + ibc1 * inv_ikr
        qb = 0.5 * q1 * (1.0 + jnp.sqrt(1.0 + 4.0 * jnp.maximum(q2, 0.0)))

        ict = (ibe1 - ibc1) / qb
        ib = ibe1 / p["bf"] + iben + ibc1 / p["br"] + ibcn \
            + ctx.gmin * (vbe + vbc) + eps[1]
        ic = ict - ibc1 / p["br"] - ibcn - ctx.gmin * vbc + eps[0]
        ie = -(ic + ib) - eps[0] - eps[1]   # eps sources flow c->e and b->e

        # charges
        qbe = _qdep(vbe, p["cje"] * a, p["vje"], p["mje"], p["fc"]) \
            + p["tf"] * ibe1 / qb
        qbc = _qdep(vbc, p["cjc"] * a, p["vjc"], p["mjc"], p["fc"]) \
            + p["tr"] * ibc1
        qsc = _qdep(vsc, p["cjs"] * a, p["vjs"], jnp.maximum(p["mjs"], 1e-3),
                    p["fc"]) * jnp.where(p["cjs"] > 0, 1.0, 0.0)

        i_c = sgn * ic
        i_b = sgn * ib
        i_e = sgn * ie
        i_s = jnp.zeros_like(ic)
        q_c = sgn * (-qbc - qsc)
        q_b = sgn * (qbe + qbc)
        q_e = sgn * (-qbe)
        q_s = sgn * qsc
        return (jnp.stack([i_c, i_b, i_e, i_s]),
                jnp.stack([q_c, q_b, q_e, q_s]))

    @classmethod
    def noise(cls, lv, p, ctx):
        from cedarsim_tpu import config
        vc, vb, ve = lv[0], lv[1], lv[2]
        sgn = p["ptype"]
        vbe = sgn * (vb - ve)
        vbc = sgn * (vb - vc)
        vt = ctx.vt
        isat = p["is"] * p["area"]
        ibe1 = isat * (_limexp(vbe / (p["nf"] * vt)) - 1.0)
        ibc1 = isat * (_limexp(vbc / (p["nr"] * vt)) - 1.0)
        ic = jnp.abs((ibe1 - ibc1))
        ibv = jnp.abs(ibe1 / p["bf"])
        return (jnp.stack([2.0 * config.Q_CHARGE * ic,
                           2.0 * config.Q_CHARGE * ibv]),
                jnp.zeros((2,)))
