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


def _elem_mesh(n):
    from aa_admm_tpu.parallel.ensemble import make_mesh
    return make_mesh(n, prefer_dp=1)   # all devices on the element axis


def _step_fn(order):
    from aa_admm_tpu.solver.physics import step_xzu, step_zxu
    return step_xzu if order == "xzu" else step_zxu


@pytest.mark.parametrize("order", ["xzu", "zxu"])
def test_elem_sharding_parity(order):
    """elem=8 sharded step must match the unsharded step to f64 roundoff —
    the proof that in-loop sharding constraints don't change the math
    (VERDICT r1 item 1; reference capability: the OpenMP local step,
    admm_anderson_xzu/src/Solver.cpp:190-213). zxu covers CollisionBatch."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    from aa_admm_tpu.parallel.ensemble import build_tiny_scene, shard_system

    solver, s = build_tiny_scene(order, dtype="float64", admm_iters=8,
                                 anderson_m=3)
    args = (jnp.asarray(solver.x), jnp.asarray(solver.v),
            jnp.asarray(solver.pin_pos))
    step = _step_fn(order)
    x1, v1, tr1 = step(solver.system, *args)

    mesh = _elem_mesh(8)
    system = shard_system(solver.system, mesh)
    x8, v8, tr8 = jax.jit(step)(system, *args)

    assert np.allclose(np.asarray(x8), np.asarray(x1), rtol=1e-10, atol=1e-12)
    assert np.allclose(np.asarray(v8), np.asarray(v1), rtol=1e-10, atol=1e-10)
    p1, p8 = np.asarray(tr1.prim), np.asarray(tr8.prim)
    m = ~np.isnan(p1)
    assert np.allclose(p8[m], p1[m], rtol=1e-9)
    assert int(tr8.reset_count) == int(tr1.reset_count)


@pytest.mark.parametrize("order", ["xzu", "zxu"])
def test_elem_constraints_survive_compilation(order):
    """The lowered step module must contain in-loop sharding_constraint ops
    on the 'elem' axis (input annotation alone is not proof — XLA may
    replicate small operands)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    from aa_admm_tpu.parallel.ensemble import build_tiny_scene, shard_system

    solver, s = build_tiny_scene(order, dtype="float64", admm_iters=2,
                                 anderson_m=2)
    system = shard_system(solver.system, _elem_mesh(8))
    args = (jnp.asarray(solver.x), jnp.asarray(solver.v),
            jnp.asarray(solver.pin_pos))
    txt = jax.jit(_step_fn(order)).lower(system, *args).as_text()
    assert txt.count("sharding_constraint") >= 3
    assert '"elem"' in txt


def test_elem_arrays_stay_sharded():
    """Post-compile sharding inspection: the z blocks produced by the local
    sweep must come out sharded over 'elem', not replicated."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    from aa_admm_tpu.parallel.ensemble import build_tiny_scene, shard_system
    from aa_admm_tpu.solver.physics import _update_z

    solver, s = build_tiny_scene("xzu", dtype="float64")
    system = shard_system(solver.system, _elem_mesh(8))
    x = jnp.asarray(solver.x)
    u = tuple(jnp.zeros_like(zb) for zb in system.deform(x))
    z = jax.jit(_update_z)(system, x, u)
    for zb in z:
        # Plane-form blocks are (C, E): the element axis is LAST.
        spec = zb.sharding.spec
        assert len(spec) >= 2 and spec[-1] == "elem", (
            f"z block replicated: {zb.sharding}")
