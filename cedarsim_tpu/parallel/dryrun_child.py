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
    print(f"dryrun_multichip({n_devices}): {len(vtos)} DFF operating points "
          f"converged and {len(tok)} sharded transients finished "
          f"({int(np.asarray(tres.n_accepted).sum())} steps) on mesh "
          f"{dict(mesh.shape)}")


if __name__ == "__main__":
    main(int(sys.argv[1]))
