"""Multi-chip scaling via jax.sharding — a new capability over the reference
(which is OpenMP shared-memory only; SURVEY.md section 2.4).

Two sharding axes, mapped to how this workload actually scales:

* ``dp`` — scenario-ensemble data parallelism: a batch of independent scenes
  (same topology, different states) vmapped over the leading axis and sharded
  across devices. Zero inner-loop communication.
* ``elem`` — element-axis model parallelism (the domain analogue of
  tensor/sequence parallelism): per-type element batches are sharded along
  their element axis, so the local prox sweep is device-parallel; the
  gather/segment_sum into replicated vertex arrays and the residual norms
  become XLA-inserted collectives (psum) over ICI.

GSPMD propagates shardings from the annotated inputs through the whole
scanned ADMM loop — no manual collectives in the step function itself.
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int, prefer_dp: int = 2):
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    devs = jax.devices()[:n_devices]
    dp = prefer_dp if n_devices % prefer_dp == 0 and n_devices > 1 else 1
    mp = n_devices // dp
    mesh_devs = np.asarray(devs).reshape(dp, mp)
    return Mesh(mesh_devs, ("dp", "elem"))


def shard_system(system, mesh):
    """Place element-batch arrays with their element axis sharded over
    'elem'; everything else replicated."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def place_batch(b):
        import dataclasses
        updates = {}
        for f in dataclasses.fields(b):
            if f.metadata.get("static"):
                continue
            v = getattr(b, f.name)
            if isinstance(v, jnp.ndarray) and v.ndim >= 1 and \
                    v.shape[0] == getattr(b, "w").shape[0]:
                spec = P("elem", *([None] * (v.ndim - 1)))
                updates[f.name] = jax.device_put(v, NamedSharding(mesh, spec))
            elif isinstance(v, jnp.ndarray):
                updates[f.name] = jax.device_put(v, repl)
            else:
                updates[f.name] = v
        return dataclasses.replace(b, **updates)

    import dataclasses
    batches = tuple(place_batch(b) for b in system.batches)
    others = {}
    for f in dataclasses.fields(system):
        if f.name == "batches" or f.metadata.get("static"):
            continue
        v = getattr(system, f.name)
        others[f.name] = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, repl), v) if v is not None else None
    return dataclasses.replace(system, batches=batches, **others)


def ensemble_step(order: str = "xzu"):
    """vmapped fused step over a scene-ensemble batch axis."""
    import jax
    from ..solver.physics import step_xzu, step_zxu

    base = step_xzu if order == "xzu" else step_zxu
    return jax.jit(jax.vmap(base, in_axes=(None, 0, 0, 0)))


def dryrun(n_devices: int) -> None:
    """Compile + execute one full (accelerated) training step over an
    n-device mesh with real dp x elem shardings, on tiny shapes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.config import AccelType, Lame, Settings
    from ..core.factory import make_tet_blocks
    from ..solver.physics import PhysicsSolver, UpdateOrder

    mesh = make_mesh(n_devices)
    dp = mesh.shape["dp"]

    # Tiny beam: 8x1x1 blocks -> 40 tets (divisible by any elem-axis size
    # up to 8 when paired with dp=2).
    mesh_data = make_tet_blocks(8, 1, 1)
    lo, hi = mesh_data.bounds()
    mesh_data.verts = (mesh_data.verts - 0.5 * (lo + hi)) / (hi - lo)[1]

    s = Settings()
    s.admm_iters = 3
    s.verbose = 0
    s.acceleration_type = AccelType.ANDERSON
    s.anderson_m = 3
    s.dtype = np.dtype("float32")
    solver = PhysicsSolver(order=UpdateOrder.XZU)
    solver.add_tetmesh(mesh_data.verts, mesh_data.tets,
                       Lame.from_young_poisson(1e6, 0.35))
    min_x = mesh_data.verts[:, 0].min() + 1e-3
    solver.set_pins([i for i, v in enumerate(mesh_data.verts)
                     if v[0] < min_x])
    solver.initialize(s)

    system = shard_system(solver.system, mesh)

    # Scene ensemble: dp copies with slightly different velocities.
    xs = np.broadcast_to(solver.x, (dp,) + solver.x.shape).copy()
    vs = np.zeros_like(xs)
    vs[:, :, 1] = np.linspace(0.0, -0.1, dp)[:, None]
    pps = np.broadcast_to(solver.pin_pos, (dp,) + solver.pin_pos.shape).copy()

    batch_sharding = NamedSharding(mesh, P("dp", None, None))
    xs = jax.device_put(jnp.asarray(xs, s.dtype), batch_sharding)
    vs = jax.device_put(jnp.asarray(vs, s.dtype), batch_sharding)
    pps = jax.device_put(jnp.asarray(pps, s.dtype), batch_sharding)

    step = ensemble_step("xzu")
    with mesh:
        x_new, v_new, trace = step(system, xs, vs, pps)
        x_new.block_until_ready()

    assert x_new.shape == xs.shape
    assert bool(jnp.all(jnp.isfinite(x_new)))
    assert bool(jnp.all(jnp.isfinite(trace.prim)))
