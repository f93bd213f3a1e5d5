"""Multi-host (DCN-axis) dryrun: two OS processes under jax.distributed.

SURVEY §4(d)/§5.8 claim the scenario-ensemble dp axis scales "across hosts
over DCN". This is that claim's first end-to-end evidence (VERDICT r4 #4):

* launcher mode (default): spawns 2 worker processes of this script, each
  `jax.distributed.initialize`'d against a local coordinator with 4 virtual
  CPU devices (8 global devices, 2 processes — the minimal multi-host
  topology, no pod needed);
* worker mode: builds the tiny xzu ensemble scene, makes a GLOBAL
  (dp=2, elem=4) mesh spanning both processes, assembles the dp-sharded
  scene batch with `jax.make_array_from_callback` (each process owns the
  replicas whose shards live on its devices), runs ONE fused accelerated
  step, and asserts each locally-addressable replica's trajectory equals
  the single-process unsharded reference (computed independently in-process
  — the scene is deterministic) to f64 roundoff.

Process 0 writes MULTIHOST_r05.json. Exercised by
tests/test_multihost.py (gated: AAADMM_SLOW_TESTS=1).
"""

import json
import os
import subprocess
import sys

COORD = "127.0.0.1:9762"
N_PROC = 2
LOCAL_DEVICES = 4


def worker(pid: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=N_PROC, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from aa_admm_tpu.parallel.ensemble import (build_tiny_scene,
                                               ensemble_step, shard_system)

    assert jax.process_count() == N_PROC
    devs = np.asarray(jax.devices()).reshape(N_PROC, LOCAL_DEVICES)
    mesh = Mesh(devs, ("dp", "elem"))   # dp spans PROCESSES (the DCN axis)
    dp = N_PROC

    solver, s = build_tiny_scene("xzu", dtype="float64")
    system = shard_system(solver.system, mesh)

    # dp-sharded scene batch: replica r gets a distinct initial velocity, so
    # cross-replica mixups cannot cancel out.
    x_h = np.broadcast_to(solver.x, (dp,) + solver.x.shape).copy()
    v_h = np.zeros_like(x_h)
    v_h[:, :, 1] = np.linspace(0.0, -0.1, dp)[:, None]
    pp_h = np.broadcast_to(solver.pin_pos,
                           (dp,) + solver.pin_pos.shape).copy()

    def gmake(h):
        return jax.make_array_from_callback(
            h.shape, NamedSharding(mesh, P("dp", *([None] * (h.ndim - 1)))),
            lambda idx: h[idx])

    xs, vs, pps = gmake(x_h), gmake(v_h), gmake(pp_h)

    step = ensemble_step("xzu")
    with mesh:
        x_new, v_new, trace = step(system, xs, vs, pps)
        jax.block_until_ready(x_new)

    # Independent single-process reference (unsharded, same determinism).
    from aa_admm_tpu.solver.physics import step_xzu
    errs = []
    for r in range(dp):
        xr, vr, tr = jax.jit(step_xzu)(
            solver.system, jnp.asarray(x_h[r]), jnp.asarray(v_h[r]),
            jnp.asarray(pp_h[r]))
        # Compare only the locally-addressable shard rows of replica r.
        for shard in x_new.addressable_shards:
            sl = shard.index
            if not (sl[0].start <= r < sl[0].stop):
                continue
            local = np.asarray(shard.data)[r - sl[0].start]
            ref = np.asarray(xr)[sl[1] if len(sl) > 1 else slice(None)]
            errs.append(float(np.max(np.abs(local - ref))))
    max_dx = max(errs) if errs else 0.0
    if max_dx > 1e-10:
        raise RuntimeError(
            f"process {pid}: multi-host replica trajectory diverged from "
            f"the single-process reference: max|dx|={max_dx:.3e}")

    # Aggregate across processes so the artifact reports the global max.
    from jax.experimental import multihost_utils
    all_dx = multihost_utils.process_allgather(jnp.asarray([max_dx]))
    if pid == 0:
        out = {"multihost": "ok", "n_processes": N_PROC,
               "devices_per_process": LOCAL_DEVICES,
               "mesh": "dp(across processes) x elem",
               "max_dx_vs_single_process": float(np.max(np.asarray(all_dx))),
               "checked_shards_per_process": len(errs)}
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MULTIHOST_r05.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out), flush=True)
    jax.distributed.shutdown()


def launcher() -> int:
    procs = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    for pid in range(N_PROC):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(pid)],
            env=env))
    rc = 0
    for p in procs:
        try:
            rc |= p.wait(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        sys.exit(launcher())
