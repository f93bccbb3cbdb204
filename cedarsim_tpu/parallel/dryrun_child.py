"""Subprocess child for ``__graft_entry__.dryrun_multichip``.

Runs the flagship sharded DC sweep on an n-device *virtual CPU* mesh.  This
must execute in a fresh interpreter because:

- ``--xla_force_host_platform_device_count`` is only honored if it is in
  ``XLA_FLAGS`` before JAX initializes its backends (the parent sets it on
  our env), and
- the axon TPU plugin prepends itself to ``JAX_PLATFORMS``, so the env var
  alone cannot force CPU; we pin it via the config API immediately after
  import, before any backend initialization.  Without this, r01's driver run
  crashed in ``device_put`` on an AOT libtpu version mismatch.

Sharding semantics being validated: a sweep is a stacked parameter pytree
whose leading batch axis is sharded over a ``jax.sharding.Mesh`` — per-point
Newton solves are embarrassingly parallel, the only collective is the result
gather (SURVEY.md §2.11; replaces the reference's serial remake loop,
/root/reference/src/sweeps.jl:471-502).
"""

import os
import sys


def main(n_devices: int) -> None:
    # Never load persistent-cache AOT blobs compiled on/for another machine
    # (XLA:CPU AOT results are host-feature-specific and can SIGILL).
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", None)

    import numpy as np
    from cedarsim_tpu import Sweep, parse_spice, elaborate, compile_circuit
    from cedarsim_tpu.parallel.mesh import make_mesh, dc_sweep_sharded
    from cedarsim_tpu.analysis.dc import NewtonOptions

    devs = jax.devices()
    assert devs[0].platform == "cpu", devs
    assert len(devs) >= n_devices, (
        f"wanted {n_devices} virtual CPU devices, got {len(devs)} "
        f"(XLA_FLAGS={os.environ.get('XLA_FLAGS')!r})")

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    dff_dir = os.path.join(repo, "benchmarks", "gf180_dff")
    with open(os.path.join(dff_dir, "dff_tb.cir")) as f:
        nl = parse_spice(f.read(), file="dff_tb.cir")
    compiled = compile_circuit(elaborate(nl, include_paths=[dff_dir]))

    mesh = make_mesh(n_devices)
    # 2 points per device, sweeping the NMOS threshold (PVT-style axis)
    vtos = np.linspace(0.75, 0.85, 2 * n_devices)
    res = dc_sweep_sharded(
        compiled, Sweep("vto", vtos), mesh,
        opts=NewtonOptions(gmin_steps=3, src_steps=2, restarts=1))
    ok = np.asarray(res.converged)
    assert ok.shape == (len(vtos),), ok.shape
    assert ok.all(), f"sharded sweep failed to converge: {ok}"

    # the FULL step: per-lane operating point + adaptive implicit time loop
    # (Newton + LU + LTE control in lax.while_loop), vmapped over the sweep
    # and sharded over the mesh — one short window on tiny shapes
    from cedarsim_tpu.parallel.mesh import tran_sweep_sharded
    from cedarsim_tpu.analysis.tran import TranOptions
    tres = tran_sweep_sharded(
        compiled, Sweep("vto", vtos[:n_devices]), (0.0, 2e-9), mesh,
        opts=TranOptions(max_steps=256, chunk_size=32),
        dc_opts=NewtonOptions(gmin_steps=3, src_steps=2, restarts=1))
    tok = np.asarray(tres.finished)
    assert tok.all(), f"sharded transient sweep failed: {tok}"

    # Closed-form per-lane physics gate (VERDICT r3 weak #6: completion
    # alone is a weak certificate — a sharding bug that permutes or
    # clobbers lanes would still "finish").  Same gate as
    # tests/test_mesh.py::test_tran_sweep_sharded_rc_physics: an RC charge
    # with a DISTINCT tau per lane, every lane checked against its own
    # analytic waveform, so the artifact certifies that lane k's result is
    # lane k's physics.
    from cedarsim_tpu import (Circuit, Resistor, Capacitor, VSourcePULSE,
                              compile_circuit)
    ckt = Circuit()
    vin, vout = ckt.net("vin"), ckt.net("vout")
    ckt.add(VSourcePULSE, "V1", (vin, ckt.gnd),
            dict(v1=0.0, v2=2.0, td=1e-6, tr=1e-9, tf=1e-9, pw=8e-6,
                 per=20e-6))
    ckt.add(Resistor, "R1", (vin, vout), dict(r=1000.0))
    ckt.add(Capacitor, "C1", (vout, ckt.gnd), dict(c=1e-9))
    rc = compile_circuit(ckt, dynamic_params=["r"])
    rs = np.linspace(500.0, 2200.0, 2 * n_devices)
    rres = tran_sweep_sharded(rc, Sweep("R1.r", rs), (0.0, 6e-6), mesh)
    assert np.asarray(rres.finished).all(), "RC physics-gate lanes unfinished"
    iv = rc.node_names.index("vout")
    ts = np.asarray(rres.ts)
    vs = np.asarray(rres.xs)[:, :, iv]
    t_probe = 3e-6
    worst = 0.0
    for lane, r in enumerate(rs):
        got = np.interp(t_probe, ts[lane], vs[lane])
        want = 2.0 * (1 - np.exp(-(t_probe - 1e-6 - 0.5e-9) / (r * 1e-9)))
        worst = max(worst, abs(got - want))
    assert worst < 5e-3, f"per-lane closed-form error {worst}"
    spread = abs(np.interp(t_probe, ts[0], vs[0])
                 - np.interp(t_probe, ts[-1], vs[-1]))
    assert spread > 0.05, "lanes identical — sweep not actually applied"

    print(f"dryrun_multichip({n_devices}): {len(vtos)} DFF operating points "
          f"converged and {len(tok)} sharded transients finished "
          f"({int(np.asarray(tres.n_accepted).sum())} steps) on mesh "
          f"{dict(mesh.shape)}; closed-form RC gate over {len(rs)} "
          f"distinct-tau lanes: worst lane error {worst:.2e} V "
          f"(bound 5e-3), lane spread {spread:.3f} V")


if __name__ == "__main__":
    main(int(sys.argv[1]))
