"""Multi-chip sharding validated on a virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest


def test_dryrun_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from aa_admm_tpu.parallel.ensemble import dryrun
    dryrun(8)


def test_ensemble_matches_single():
    """A dp-sharded ensemble step must produce the same result per scene as
    unsharded single-scene steps."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ devices")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aa_admm_tpu.core.config import AccelType, Lame, Settings
    from aa_admm_tpu.core.factory import make_tet_blocks
    from aa_admm_tpu.parallel.ensemble import ensemble_step, make_mesh
    from aa_admm_tpu.solver.physics import PhysicsSolver, UpdateOrder, step_xzu

    mesh_data = make_tet_blocks(4, 1, 1)
    lo, hi = mesh_data.bounds()
    mesh_data.verts = (mesh_data.verts - 0.5 * (lo + hi)) / (hi - lo)[1]
    s = Settings()
    s.admm_iters = 5
    s.verbose = 0
    solver = PhysicsSolver(order=UpdateOrder.XZU)
    solver.add_tetmesh(mesh_data.verts, mesh_data.tets,
                       Lame.from_young_poisson(1e6, 0.35))
    solver.set_pins([0])
    solver.initialize(s)

    B = 2
    xs = np.broadcast_to(solver.x, (B,) + solver.x.shape).copy()
    vs = np.zeros_like(xs)
    vs[1, :, 1] = -0.05
    pps = np.broadcast_to(solver.pin_pos, (B,) + solver.pin_pos.shape).copy()

    mesh = make_mesh(2, prefer_dp=2)
    sh = NamedSharding(mesh, P("dp", None, None))
    step = ensemble_step("xzu")
    with mesh:
        xb, vb, _ = step(solver.system,
                         jax.device_put(jnp.asarray(xs), sh),
                         jax.device_put(jnp.asarray(vs), sh),
                         jax.device_put(jnp.asarray(pps), sh))

    for b in range(B):
        x1, v1, _ = step_xzu(solver.system, jnp.asarray(xs[b]),
                             jnp.asarray(vs[b]), jnp.asarray(pps[b]))
        assert np.allclose(np.asarray(xb[b]), np.asarray(x1),
                           rtol=1e-10, atol=1e-12)
