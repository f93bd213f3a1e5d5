"""End-to-end physics solver tests on a small beams-like scene: ADMM residual
behavior, pin handling, energy sanity, Anderson acceleration quality, and the
zxu order with collisions."""

import numpy as np
import pytest

from aa_admm_tpu.core.config import AccelType, Lame, Settings
from aa_admm_tpu.core.factory import make_tet_blocks
from aa_admm_tpu.solver.physics import PhysicsSolver, UpdateOrder


def _small_beam_solver(order=UpdateOrder.XZU, kind="linear", accel=False,
                       m=4, iters=50, linear_solver="auto"):
    mesh = make_tet_blocks(4, 2, 2)
    lo, hi = mesh.bounds()
    mesh.verts = (mesh.verts - 0.5 * (lo + hi)) / (hi - lo)[1]

    s = Settings()
    s.admm_iters = iters
    s.verbose = 0
    s.linear_solver = linear_solver
    if accel:
        s.acceleration_type = AccelType.ANDERSON
        s.anderson_m = m

    solver = PhysicsSolver(order=order)
    solver.add_tetmesh(mesh.verts, mesh.tets,
                       Lame.from_young_poisson(1e6, 0.35), kind=kind)
    min_x = mesh.verts[:, 0].min() + 1e-3
    pins = [i for i, v in enumerate(mesh.verts) if v[0] < min_x]
    solver.set_pins(pins)
    solver.initialize(s)
    return solver, pins


def test_pins_hold_and_dynamics_sane():
    solver, pins = _small_beam_solver()
    x0 = solver.x.copy()
    for _ in range(3):
        solver.step()
    # Pinned vertices unchanged
    assert np.allclose(solver.x[pins], x0[pins], atol=1e-12)
    # Free vertices fell under gravity
    free = np.setdiff1d(np.arange(len(x0)), pins)
    assert solver.x[free, 1].mean() < x0[free, 1].mean()
    assert np.all(np.isfinite(solver.x))
    assert np.all(np.isfinite(solver.v))


def test_residual_decreases_within_step():
    solver, _ = _small_beam_solver(iters=60)
    trace = solver.step()
    prim = np.asarray(trace.prim)
    assert np.all(np.isfinite(prim))
    # ADMM converges: last primal residual much below the early ones
    assert prim[-1] < prim[2] * 0.9
    comb = np.asarray(trace.comb)
    assert comb[-1] < comb[2]


@pytest.mark.parametrize("kind", ["linear", "neohookean", "stvk"])
def test_materials_run(kind):
    solver, _ = _small_beam_solver(kind=kind, iters=20)
    trace = solver.step()
    assert np.all(np.isfinite(np.asarray(trace.prim)))
    assert np.all(np.isfinite(solver.x))


def test_anderson_accelerates_xzu():
    plain, _ = _small_beam_solver(accel=False, iters=60)
    accel, _ = _small_beam_solver(accel=True, m=5, iters=60)
    tp = plain.step()
    ta = accel.step()
    # Accelerated run reaches a combined residual at its last valid iteration
    # (possibly the 1e-20 early-exit) no worse than plain's final one.
    cp = np.asarray(tp.comb)
    ca = np.asarray(ta.comb)
    cp = cp[~np.isnan(cp)]
    ca = ca[~np.isnan(ca)]
    assert ca[-1] < cp[-1]
    # Early exit or equal iteration count, never more.
    assert len(ca) <= len(cp)


def test_zxu_order_runs_and_accelerates():
    plain, _ = _small_beam_solver(order=UpdateOrder.ZXU, accel=False, iters=60)
    accel, _ = _small_beam_solver(order=UpdateOrder.ZXU, accel=True, m=5,
                                  iters=60)
    tp = plain.step()
    ta = accel.step()
    cp = np.asarray(tp.comb)
    ca = np.asarray(ta.comb)
    cp = cp[~np.isnan(cp)]
    ca = ca[~np.isnan(ca)]
    assert np.isfinite(ca[-1])
    assert ca[-1] < cp[-1]


def test_cg_matches_dense():
    d, _ = _small_beam_solver(iters=25, linear_solver="dense")
    c, _ = _small_beam_solver(iters=25, linear_solver="cg")
    td = d.step()
    tc = c.step()
    assert np.allclose(d.x, c.x, rtol=1e-8, atol=1e-10)
    assert np.allclose(np.asarray(td.prim), np.asarray(tc.prim),
                       rtol=1e-6, atol=1e-10)


def test_zxu_collision_floor():
    mesh = make_tet_blocks(2, 2, 2)
    lo, hi = mesh.bounds()
    mesh.verts = (mesh.verts - 0.5 * (lo + hi))  # box centered at origin

    s = Settings()
    s.admm_iters = 15
    s.verbose = 0
    solver = PhysicsSolver(order=UpdateOrder.ZXU)
    solver.add_tetmesh(mesh.verts, mesh.tets, Lame.rubber())
    solver.add_obstacle("floor", y=-2.0)
    solver.set_collisions(list(range(len(mesh.verts))))
    solver.initialize(s)
    for _ in range(40):
        solver.step()
    # The box fell but the floor stopped it (some tolerance for softness).
    assert solver.x[:, 1].min() > -2.3
    assert solver.x[:, 1].min() < -0.5
    assert np.all(np.isfinite(solver.x))


def test_residual_file_format(tmp_path):
    solver, _ = _small_beam_solver(iters=10)
    solver.step()
    solver.save(str(tmp_path))
    f = tmp_path / "residual-no.txt"
    assert f.exists()
    rows = [line.split("\t") for line in f.read_text().strip().split("\n")]
    assert len(rows) == 10
    assert len(rows[0]) == 2 + (1 if solver.order == UpdateOrder.ZXU else 0) + 1
    times = [float(r[0]) for r in rows]
    assert all(t1 >= t0 for t0, t1 in zip(times, times[1:]))


def test_f32_no_dtype_leak_with_all_obstacle_types():
    """Under jax_enable_x64, every array in the compiled step must follow the
    requested f32 dtype — a single f64 leaf (e.g. obstacle parameters,
    regression: SdfSceneBuilder.build ignored the solver dtype) upcasts the
    scan carry and breaks the TPU path."""
    import jax.tree_util as jtu

    mesh = make_tet_blocks(2, 2, 2)
    s = Settings()
    s.admm_iters = 5
    s.verbose = 0
    s.dtype = np.dtype("float32")
    solver = PhysicsSolver(order=UpdateOrder.ZXU)
    solver.add_tetmesh(mesh.verts, mesh.tets, Lame.rubber())
    solver.add_obstacle("floor", y=-2.0)
    solver.add_obstacle("slide_floor", center=[0.0, -3.0, 0.0],
                        normal=[0.5, np.sqrt(3.0) / 2.0, 0.0])
    solver.add_obstacle("sphere", center=[0.0, -2.0, 0.0], rad=0.5)
    solver.add_obstacle("plane_half_sphere", center=[0.0, -3.0, 0.0], rad=1.0)
    solver.add_obstacle("cylinder", center=[0.0, -2.5, 0.0], rad=0.4)
    solver.set_collisions(list(range(len(mesh.verts))))
    solver.initialize(s)

    bad = [l.dtype for l in jtu.tree_leaves(solver.system)
           if hasattr(l, "dtype") and l.dtype == np.float64]
    assert not bad, f"f64 leaves in f32 system: {len(bad)}"
    solver.step()
    assert solver.x.dtype == np.float32
    assert np.all(np.isfinite(solver.x))


def test_dense_pcg_threshold_boundary():
    """The auto dense<->PCG switch (PhysicsSolver.dense_threshold) must be
    trajectory-neutral: the same scene solved just under (dense) and just
    over (CG) the boundary produces equal residual trajectories to CG
    tolerance — the exactness contract of the reference's pluggable
    LinearSolver (admm_anderson_xzu/src/LinearSolver.hpp:36-92)."""
    mesh = make_tet_blocks(4, 2, 2)
    min_x = mesh.verts[:, 0].min() + 1e-3
    pins = [i for i, v in enumerate(mesh.verts) if v[0] < min_x]
    n_free = len(mesh.verts) - len(pins)

    def build(threshold):
        s = Settings()
        s.admm_iters = 25
        s.verbose = 0
        s.linear_solver = "auto"
        s.cg_tol = 1e-12
        solver = PhysicsSolver(dense_threshold=threshold)
        solver.add_tetmesh(mesh.verts, mesh.tets,
                           Lame.from_young_poisson(1e6, 0.35))
        solver.set_pins(pins)
        solver.initialize(s)
        return solver

    dense = build(n_free)       # nf <= threshold -> dense inverse
    cg = build(n_free - 1)      # nf >  threshold -> PCG
    assert dense.system.solver is not None
    assert cg.system.solver is None
    td = dense.step()
    tc = cg.step()
    assert np.allclose(dense.x, cg.x, rtol=1e-8, atol=1e-10)
    # equal trajectories to CG tolerance: tight relative match with an
    # absolute floor ~1e-8 x initial residual for the decayed tail, where
    # the 1e-12 CG tolerance noise is amplified by the residual decay
    assert np.allclose(np.asarray(td.prim), np.asarray(tc.prim),
                       rtol=1e-6, atol=1e-8)
    assert np.allclose(np.asarray(td.comb), np.asarray(tc.comb),
                       rtol=1e-5, atol=1e-8, equal_nan=True)


def test_run_frames_matches_stepwise():
    """run(n) — the fused multi-frame rollout — must reproduce n sequential
    step() calls: same final state, same residual history (same compiled
    step body, so differences are at most fusion-level roundoff)."""
    a, _ = _small_beam_solver(order=UpdateOrder.ZXU, accel=True, iters=10)
    b, _ = _small_beam_solver(order=UpdateOrder.ZXU, accel=True, iters=10)
    for _ in range(4):
        a.step()
    b.run(4)
    a.flush_traces()
    b.flush_traces()
    np.testing.assert_allclose(b.x, a.x, rtol=0, atol=1e-12)
    np.testing.assert_allclose(b.v, a.v, rtol=0, atol=1e-12)
    np.testing.assert_allclose(b.step_prim, a.step_prim, rtol=1e-12)
    np.testing.assert_allclose(b.step_comb, a.step_comb, rtol=1e-12)
    assert b.step_reject == a.step_reject
    # and it composes with step(): continue stepwise after a fused rollout
    a.step()
    b.step()
    np.testing.assert_allclose(b.x, a.x, rtol=0, atol=1e-12)


def test_run_frames_moving_pins_matches_stepwise():
    """run(n, pin_vel) must equal n x [stretch(dt); step()] on the beams
    scene (constant-velocity pin motion carried inside the fused scan)."""
    from aa_admm_tpu.apps.beams import build_scene
    s = Settings()
    s.admm_iters = 8
    s.verbose = 0
    s.dtype = np.dtype("float64")
    a, stretch_a = build_scene(s)
    b, stretch_b = build_scene(s)
    for _ in range(3):
        stretch_a(s.timestep_s)
        a.step()
    b.run(3, pin_vel=stretch_b.pin_velocity)
    a.flush_traces()
    b.flush_traces()
    np.testing.assert_allclose(b.x, a.x, rtol=0, atol=1e-12)
    np.testing.assert_allclose(b.pin_pos, a.pin_pos, rtol=0, atol=1e-12)
    np.testing.assert_allclose(b.step_prim, a.step_prim, rtol=1e-12)
    # composes with the stepwise driver afterwards
    stretch_a(s.timestep_s)
    a.step()
    stretch_b(s.timestep_s)
    b.step()
    np.testing.assert_allclose(b.x, a.x, rtol=0, atol=1e-12)


def test_plane_form_deform_scatter_adjoint():
    """<D x, t> == <x, D^T t> for every batch kind in the plane-form (C, E)
    convention — pins the hand-unrolled deform/scatter pairs in
    ops/elements.py against each other (they are built independently)."""
    import jax.numpy as jnp
    from aa_admm_tpu.ops import elements as EL

    rng = np.random.default_rng(3)
    mesh = make_tet_blocks(4, 2, 2)
    n = len(mesh.verts)
    x = jnp.asarray(rng.standard_normal((n, 3)))
    lame = Lame.from_young_poisson(1e6, 0.35)

    tb = EL.TetBatch.from_mesh(mesh.verts, mesh.tets, lame)
    tris = np.unique(
        np.sort(mesh.tets[:, [0, 1, 2]], axis=1), axis=0)[:40]
    trb = EL.TriBatch.from_mesh(mesh.verts, tris, Lame.rubber())
    pb = EL.PinBatch.create(np.arange(0, n, 7), mesh.verts[::7])

    for b, ne in ((tb, len(mesh.tets)), (trb, len(tris)),
                  (pb, len(range(0, n, 7)))):
        F = b.deform(x)
        assert F.ndim == 2 and F.shape[-1] == ne, (type(b), F.shape)
        t = jnp.asarray(rng.standard_normal(F.shape))
        lhs = float(jnp.sum(F * t))
        rhs = float(jnp.sum(x * b.scatter(t, n)))
        assert abs(lhs - rhs) < 1e-9 * max(1.0, abs(lhs)), (type(b), lhs, rhs)


def test_plane_roundtrip():
    from aa_admm_tpu.ops.elements import m2p, p2m
    rng = np.random.default_rng(0)
    a = rng.standard_normal((17, 3, 3))
    assert np.allclose(p2m(m2p(a), (3, 3)), a)
    b = rng.standard_normal((11, 3, 2))
    assert np.allclose(p2m(m2p(b), (3, 2)), b)
