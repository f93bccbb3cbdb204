"""AC small-signal and noise analyses as batched complex solves.

Reference math: ``ac!``/``noise!`` build a descriptor state space from the DC
operating point's Jacobians and evaluate C(iωE−A)⁻¹B per frequency via
LAPACK (/root/reference/src/ac.jl:75-165,198-284; derivation
doc/devdocs/ac.typ).  Here the same linear algebra is explicit and batched
over the frequency grid with ``vmap``: solve (G + jωC)·v = b where G,C are
the MNA Jacobians at the operating point and b is the AC source vector.

Noise: per-source PSD weights ``pwr·f^(−exp)`` (the reference's
``<eps>pwr``/``<eps>exp`` observables) combined with transfer functions from
each noise ε-input to the output, computed with ONE adjoint solve per
frequency: (G + jωC)ᴴ y = e_out, H = yᴴ·(∂F/∂ε).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cedarsim_tpu import config
from cedarsim_tpu.core.compile import CompiledCircuit
from cedarsim_tpu.core.context import SimSpec, Modes
from cedarsim_tpu.ops import linalg
from cedarsim_tpu.analysis.dc import solve_dc, NewtonOptions


def _freq_stamps(compiled):
    """Frequency-dependent admittance stamps: (a) S-parameter tables from
    the circuit's touchstone blocks (frontend/touchstone.py) as (node
    indices [p] with −1 for ground, f grid [m], Y [m,p,p]); (b) analytic
    device stamps from model classes exposing ``ac_admittance(params) ->
    yfun(f) -> Y`` (e.g. the exact lossless-transmission-line two-port) as
    (node indices, yfun)."""
    tables = []
    for _name, nets, fgrid, Y in compiled.circuit.sparam_blocks:
        idx = np.asarray([(-1 if n.is_ground else n.index) for n in nets],
                         np.int32)
        tables.append((idx, jnp.asarray(fgrid, compiled.dtype),
                       jnp.asarray(Y, config.complex_dtype)))
    funs = []
    for key in compiled.group_order:
        g = compiled.groups[key]
        mk = getattr(g.model, "ac_admittance", None)
        if mk is None:
            continue
        nt = g.model.n_terms()
        for j, inst in enumerate(g.instances):
            # NOTE: analytic stamps bake the elaboration-time parameter
            # values — a dynamically swept z0/td reaches DC/transient but
            # not Y(f); m parallel copies scale the admittance
            funs.append((g.var_idx[j, :nt].astype(np.int64),
                         mk(inst.params), float(inst.mult)))
    return tables, funs


def _zi_site_meta(compiled):
    """Static per-instance zi_* site layout: [(y slot, nb, n_yh,
    uh0 slot or None)] in global aux indices.  ``lat_sites`` entries are
    (kind, offset, n_slots) with layout [y_held, t_next, u_hist(nb−1),
    y_hist(na−2)]; ``zi_meta`` maps a site offset to its (nb, na)."""
    meta = []
    for key in compiled.group_order:
        g = compiled.groups[key]
        nd = getattr(g.model, "n_delay", 0)
        sites = getattr(g.model, "lat_sites", ())
        zim = getattr(g.model, "zi_meta", {})
        if not sites:
            continue
        for j in range(len(g.instances)):
            for (kind, loff, nsl) in sites:
                if not kind.startswith("zi"):
                    continue
                nb, _na = zim[loff]
                base = int(g.dly_idx[j, nd + loff])
                n_yh = nsl - 2 - (nb - 1)
                meta.append((base, nb, n_yh,
                             base + 2 if nb > 1 else None))
    return meta


def _delay_ac(compiled, x, ctx_ac, params):
    """Frequency-dependent small-signal stamps for the aux-channel
    operators:

    - exact-history ``absdelay`` (delay_mode="history"): the delayed
      value's small-signal relation is exactly δd = e^{−jωtd}·(∂u/∂x)·δx,
      so A(ω) += (∂S/∂d + jω·∂Q/∂d)·e^{−jωtd}·∂u/∂x — the exact delay
      transfer, not a Padé approximation;
    - ``zi_nd/np/zd/zp`` sampled IIR filters: the latched output's
      small-signal transfer is the z-domain response at z = e^{jωT},
      δy = H(e^{jωT})·(∂u/∂x)·δx, with H's coefficients extracted
      NUMERICALLY from the latch-update map's Jacobians (∂y_new/∂u_hist
      = numerator taps, −∂y_new/∂y_hist = denominator taps, ∂u_hist0/∂x
      = the sampled-input gradient) — no symbolic coefficient plumbing.

    Returns None when the circuit has neither (and on the sparse path,
    which owns large circuits).  Beyond the reference, which has no
    runtime for either operator family."""
    n_ring = getattr(compiled, "n_ring", 0)
    zi_meta = _zi_site_meta(compiled)
    if n_ring == 0 and not zi_meta:
        return None
    from cedarsim_tpu.core.compile import use_sparse_solver
    if use_sparse_solver(compiled):
        return None
    # aux at the operating point: latches settled, ring slots at u0 — the
    # (G, C) linearization and the ∂/∂aux jacobian both evaluate here
    dly0 = compiled.latch_init(x, ctx_ac, params)
    ring = None
    if n_ring:
        u0, td0 = compiled.delay_sources(x, ctx_ac, params)
        rs = jnp.asarray(np.asarray(compiled.ring_slots, np.int32))
        dly0 = dly0.at[rs].set(u0.astype(compiled.dtype))
    JdS, JdQ = jax.jacfwd(
        lambda d: compiled.residuals(x, ctx_ac, params, dly=d))(dly0)
    if n_ring:
        Ux = jax.jacfwd(
            lambda xx: compiled.delay_sources(xx, ctx_ac, params)[0])(x)
        ring = (JdS[:, rs], JdQ[:, rs], Ux, td0)
    lat = []
    if zi_meta:
        # force every site to fire once: any t beyond every t_next (the
        # settled t_next values sit at slot base+1 and are > 0)
        tn = jnp.stack([dly0[b + 1] for b, _, _, _ in zi_meta])
        ctx_f = ctx_ac.at_time(2.0 * jnp.max(tn) + 1e-12)

        def up(w_, x_):
            return compiled.latch_update(x_, ctx_f, w_, params)

        wnew = up(dly0, x)
        Ju = jax.jacfwd(lambda w_: up(w_, x))(dly0)
        Jxl = jax.jacfwd(lambda x_: up(dly0, x_))(x)
        for base, nb, n_yh, uh0 in zi_meta:
            T = wnew[base + 1] - dly0[base + 1]
            alphas = jnp.concatenate(
                [(-Ju[base, base])[None],
                 -Ju[base, base + 2 + (nb - 1):base + 2 + (nb - 1) + n_yh]]
            ) if n_yh else (-Ju[base, base])[None]
            betas = (Ju[base, base + 2:base + 2 + (nb - 1)]
                     if nb > 1 else jnp.zeros(0, compiled.dtype))
            num0 = Jxl[base, :]                       # β0·∂u/∂x
            ux = Jxl[uh0, :] if uh0 is not None else None
            lat.append((base, T, alphas, betas, num0, ux,
                        JdS[:, base], JdQ[:, base]))
    return dict(dly0=dly0, ring=ring, lat=lat)


def _apply_delay_ac(A, wi, dstamp):
    if dstamp is None:
        return A
    cd = A.dtype
    if dstamp["ring"] is not None:
        JdS, JdQ, Ux, td0 = dstamp["ring"]
        ph = jnp.exp(-1j * wi * td0.astype(cd))
        A = A + (JdS.astype(cd) + 1j * wi * JdQ.astype(cd)) \
            @ (ph[:, None] * Ux.astype(cd))
    for base, T, alphas, betas, num0, ux, colS, colQ in dstamp["lat"]:
        zinv = jnp.exp(-1j * wi * T.astype(cd))
        den = 1.0 + jnp.sum(alphas.astype(cd)
                            * zinv ** jnp.arange(1, alphas.shape[0] + 1))
        num_row = num0.astype(cd)
        if ux is not None and betas.shape[0]:
            taps = jnp.sum(betas.astype(cd)
                           * zinv ** jnp.arange(1, betas.shape[0] + 1))
            num_row = num_row + taps * ux.astype(cd)
        r = num_row / den
        A = A + (colS.astype(cd) + 1j * wi * colQ.astype(cd))[:, None] \
            * r[None, :]
    return A


def _apply_freq_stamps(A, f_hz, stamps, n):
    """A + Σ Y_k(f) stamped at the port nodes (ground rows/cols dropped via
    a pad slot).  Tables interpolate linearly on their grid (clamped at the
    ends); analytic stamps evaluate their yfun at f."""
    tables, funs = stamps
    if not tables and not funs:
        return A
    Ap = jnp.zeros((n + 1, n + 1), A.dtype).at[:n, :n].set(A)
    for idx, fg, Yg in tables:
        i = jnp.clip(jnp.searchsorted(fg, f_hz), 1, fg.shape[0] - 1)
        w = jnp.clip((f_hz - fg[i - 1])
                     / jnp.maximum(fg[i] - fg[i - 1], 1e-300), 0.0, 1.0)
        Yf = Yg[i - 1] * (1 - w) + Yg[i] * w
        ii = jnp.asarray(np.where(idx < 0, n, idx))
        Ap = Ap.at[jnp.ix_(ii, ii)].add(Yf)
    for idx, yfun, mult in funs:
        # the device var_idx already maps ground terminals to a pad slot
        # >= n; clamp onto the stamp pad row
        ii = jnp.asarray(np.minimum(idx, n))
        Ap = Ap.at[jnp.ix_(ii, ii)].add(mult * yfun(f_hz).astype(Ap.dtype))
    return Ap[:n, :n]


def acdec(n_per_decade, fstart, fstop):
    """Log frequency grid ≡ ``.ac dec`` (/root/reference/src/ac.jl:296-301)."""
    ndec = np.log10(fstop / fstart)
    n = int(np.ceil(n_per_decade * ndec)) + 1
    return np.logspace(np.log10(fstart), np.log10(fstop), n)


@dataclasses.dataclass
class ACSolution:
    freqs: np.ndarray
    v: jax.Array              # [nf, n_x] complex small-signal solution
    op_x: jax.Array
    compiled: CompiledCircuit
    ctx: SimSpec
    params: dict

    def __getitem__(self, name):
        """Complex small-signal value of an observable across frequencies.
        Uses linearity: δobs = (∂obs/∂x)·v + (∂obs/∂ẋ)·(jω·v)."""
        fn = self.compiled.observe(name)
        x = self.op_x
        xd0 = jnp.zeros_like(x)
        w = 2.0 * np.pi * jnp.asarray(self.freqs, x.dtype)

        def one(vv, wi):
            def f(xx, xxd):
                return fn(xx, xxd, self.ctx, self.params)
            _, d_re = jax.jvp(f, (x, xd0), (vv.real, -wi * vv.imag))
            _, d_im = jax.jvp(f, (x, xd0), (vv.imag, wi * vv.real))
            return d_re + 1j * d_im

        return np.asarray(jax.jit(jax.vmap(one))(self.v, w))


def ac(compiled: CompiledCircuit, freqs, params=None, ctx: SimSpec = None,
       dc_opts: NewtonOptions = None) -> ACSolution:
    """AC analysis over ``freqs`` (Hz)."""
    params = compiled.params0 if params is None else params
    if ctx is None:
        from cedarsim_tpu.core.compile import default_ctx
        ctx = default_ctx(compiled)
    # the bias point solves in DCOP mode (SPICE: the AC op IS the DC op) —
    # devices whose AC-mode eval defers to the frequency-dependent stamp
    # path (TLine pins its small-signal branch rows there) still bias
    # correctly; the linearization below evaluates in AC mode
    op = solve_dc(compiled, params, ctx, opts=dc_opts, mode=Modes.DCOP)
    freqs = np.atleast_1d(np.asarray(freqs, np.float64))

    stamps = _freq_stamps(compiled)

    @jax.jit
    def run(x, params):
        c = ctx.with_mode(Modes.AC)
        dstamp = _delay_ac(compiled, x, c, params)
        if dstamp is None:
            G, C = compiled.jacobians(x, c, params)
        else:
            # linearize holding the delayed aux fixed at its op value; the
            # delay path re-enters through the exact e^{−jωtd} stamp below
            _, _, G, C = compiled.res_jacs_fwd(x, c, params,
                                               dly=dstamp["dly0"])
        b = compiled.ac_rhs(params)
        Gc = G.astype(config.complex_dtype)
        Cc = C.astype(config.complex_dtype)
        w = 2.0 * np.pi * jnp.asarray(freqs, compiled.dtype)
        fz = jnp.asarray(freqs, compiled.dtype)

        def solve_one(wi, fi):
            A = _apply_delay_ac(Gc + 1j * wi * Cc, wi, dstamp)
            A = _apply_freq_stamps(A, fi, stamps, compiled.n_x)
            return linalg.solve(A, b)

        return jax.vmap(solve_one)(w, fz)

    v = run(op.x, params)
    return ACSolution(freqs=freqs, v=v, op_x=op.x, compiled=compiled,
                      ctx=ctx.with_mode(Modes.AC), params=params)


@dataclasses.dataclass
class NoiseSolution:
    freqs: np.ndarray
    psd: np.ndarray            # [nf] output noise PSD (V²/Hz at output node)
    per_source: np.ndarray     # [nf, n_eps]
    eps_names: list
    compiled: CompiledCircuit
    #: |H(f)|² of the AC drive (the circuit's ac= sources) to the output —
    #: the ngspice ``.noise V(out) VSRC`` input-referral gain
    gain2: np.ndarray = None

    def __getitem__(self, _name="out"):
        return self.psd

    def inoise(self):
        """Input-referred PSD [nf]: output PSD / |H(f)|² of the AC drive
        (ngspice ``inoise_spectrum`` role)."""
        if self.gain2 is None or float(np.max(self.gain2)) <= 0.0:
            raise ValueError(
                "input-referred noise needs an AC drive: no source in the "
                "circuit has a nonzero ac= value, so |H(f)| = 0 and "
                "onoise/|H|^2 is undefined")
        return self.psd / np.maximum(self.gain2, 1e-300)

    def total(self, f1=None, f2=None, input_referred=False):
        """RMS integrated noise over [f1, f2] (defaults: the full grid) by
        trapezoid on the computed grid — ngspice ``onoise_total`` /
        ``inoise_total``.  Use a dense-enough (log) grid for the bandwidth
        of interest; the classic check is kT/C for an RC lowpass."""
        f = self.freqs
        s = self.inoise() if input_referred else self.psd
        lo = f[0] if f1 is None else f1
        hi = f[-1] if f2 is None else f2
        m = (f >= lo) & (f <= hi)
        tz = getattr(np, "trapezoid", None) or np.trapz
        return float(np.sqrt(tz(s[m], f[m])))

    def source(self, name):
        """PSD contribution [nf] of one noise source — by its full eps name
        (``"x1.m1#n0"``) or by instance name (summing its sources); the
        reference's ``noiseparams`` per-contributor breakdown role."""
        if name in self.eps_names:
            return self.per_source[:, self.eps_names.index(name)]
        cols = [k for k, n in enumerate(self.eps_names)
                if n.rsplit("#", 1)[0] == name]
        if not cols:
            raise KeyError(f"no noise source {name!r}; have {self.eps_names}")
        return self.per_source[:, cols].sum(axis=1)

    def by_source(self):
        """{eps name: PSD [nf]} for every contributor."""
        return {n: self.per_source[:, k]
                for k, n in enumerate(self.eps_names)}


def noise(compiled: CompiledCircuit, out: str, freqs, params=None,
          ctx: SimSpec = None, dc_opts: NewtonOptions = None) -> NoiseSolution:
    """Output-referred noise PSD at observable ``out`` over ``freqs``.
    Matches the reference ``noise!`` math: PSD(f) = Σₖ |Hₖ(f)|²·pwrₖ·f^(−expₖ)
    (/root/reference/src/ac.jl:267-284)."""
    params = compiled.params0 if params is None else params
    if ctx is None:
        from cedarsim_tpu.core.compile import default_ctx
        ctx = default_ctx(compiled)
    if compiled.n_eps == 0:
        f = np.atleast_1d(np.asarray(freqs))
        # gain2=ones: a noiseless circuit's input-referred noise is zero
        # (not an error), without paying the AC solves for it
        return NoiseSolution(f, np.zeros_like(f), np.zeros((len(f), 0)), [],
                             compiled, gain2=np.ones_like(f))
    # DCOP bias (see ac()); AC-mode linearization below
    op = solve_dc(compiled, params, ctx, opts=dc_opts, mode=Modes.DCOP)
    freqs = np.atleast_1d(np.asarray(freqs, np.float64))
    obs = compiled.observe(out)
    stamps = _freq_stamps(compiled)

    @jax.jit
    def run(x, params):
        c = ctx.with_mode(Modes.AC)
        dstamp = _delay_ac(compiled, x, c, params)
        if dstamp is None:
            G, C = compiled.jacobians(x, c, params)
            dly0 = None
        else:
            dly0 = dstamp["dly0"]
            _, _, G, C = compiled.res_jacs_fwd(x, c, params, dly=dly0)
        # ∂F/∂ε at the operating point (noise enters the static part)
        Jeps = jax.jacfwd(
            lambda e: compiled.residuals(x, c, params, eps=e,
                                         dly=dly0)[0]
        )(jnp.zeros(compiled.n_eps, compiled.dtype))
        pwr, ex = compiled.noise_sources(x, c, params)
        # output selection vector e_out = ∂obs/∂x (linear at op)
        e_out = jax.grad(
            lambda xx: obs(xx, jnp.zeros_like(xx), c, params))(x)
        Gc = G.astype(config.complex_dtype)
        Cc = C.astype(config.complex_dtype)
        w = 2.0 * np.pi * jnp.asarray(freqs, compiled.dtype)

        b_ac = compiled.ac_rhs(params)

        def one(wi, f):
            A = _apply_delay_ac(Gc + 1j * wi * Cc, wi, dstamp)
            A = _apply_freq_stamps(A, f, stamps, compiled.n_x)
            y = linalg.solve(A.conj().T, e_out.astype(config.complex_dtype))
            H = y.conj() @ Jeps.astype(config.complex_dtype)   # [n_eps]
            s = pwr * jnp.power(f, -ex)
            per = (jnp.abs(H) ** 2) * s
            # drive→output transfer from the SAME adjoint solve: the
            # input-referral gain (e_out·A⁻¹·b = (A⁻ᴴe_out)ᴴ·b)
            g2 = jnp.abs(y.conj() @ b_ac) ** 2
            return per, g2

        per, g2 = jax.vmap(one)(w, jnp.asarray(freqs, compiled.dtype))
        return per, g2

    per, g2 = run(op.x, params)
    per = np.asarray(per)
    g2 = np.asarray(g2)
    eps_names = []
    for key in compiled.group_order:
        g = compiled.groups[key]
        for inst in g.instances:
            for k in range(g.model.n_noise):
                eps_names.append(f"{inst.name}#n{k}")
    return NoiseSolution(freqs=freqs, psd=per.sum(axis=1), per_source=per,
                         eps_names=eps_names, compiled=compiled, gain2=g2)
