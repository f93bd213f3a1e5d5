"""Instrumented (per-phase) step must reproduce the fused scan exactly."""

import numpy as np

from aa_admm_tpu.core.config import AccelType, Lame, Settings
from aa_admm_tpu.core.factory import make_tet_blocks
from aa_admm_tpu.solver.physics import PhysicsSolver, UpdateOrder


def _mk(accel):
    mesh = make_tet_blocks(3, 2, 2)
    lo, hi = mesh.bounds()
    mesh.verts = (mesh.verts - 0.5 * (lo + hi)) / (hi - lo)[1]
    s = Settings()
    s.admm_iters = 25
    s.verbose = 0
    if accel:
        s.acceleration_type = AccelType.ANDERSON
        s.anderson_m = 4
    solver = PhysicsSolver(order=UpdateOrder.XZU)
    solver.add_tetmesh(mesh.verts, mesh.tets,
                       Lame.from_young_poisson(1e6, 0.3))
    solver.set_pins([0, 1])
    solver.initialize(s)
    return solver


def test_instrumented_matches_fused_noacc():
    a, b = _mk(False), _mk(False)
    tr = a.step()
    prims_i, combs_i = b.step_instrumented()
    prims_f = np.asarray(tr.prim)
    assert np.allclose(prims_f[: len(prims_i)], prims_i, rtol=1e-10)
    assert np.allclose(np.asarray(tr.comb)[: len(combs_i)], combs_i,
                       rtol=1e-10)
    assert np.allclose(a.x, b.x, rtol=1e-12, atol=1e-14)
    # Phase buckets were populated.
    assert b.runtime.global_ms > 0 and b.runtime.local_ms > 0


def test_instrumented_matches_fused_accel():
    a, b = _mk(True), _mk(True)
    tr = a.step()
    prims_i, combs_i = b.step_instrumented()
    prims_f = np.asarray(tr.prim)
    prims_f = prims_f[~np.isnan(prims_f)]
    n = min(len(prims_f), len(prims_i))
    assert np.allclose(prims_f[:n], prims_i[:n], rtol=1e-9)
    assert np.allclose(a.x, b.x, rtol=1e-9, atol=1e-12)
    assert b.runtime.acceleration_ms > 0


def _mk_zxu(accel, collisions=False):
    mesh = make_tet_blocks(3, 2, 2)
    lo, hi = mesh.bounds()
    mesh.verts = (mesh.verts - 0.5 * (lo + hi)) / (hi - lo)[1]
    s = Settings()
    s.admm_iters = 25
    s.verbose = 0
    if accel:
        s.acceleration_type = AccelType.ANDERSON
        s.anderson_m = 4
    solver = PhysicsSolver(order=UpdateOrder.ZXU)
    solver.add_tetmesh(mesh.verts, mesh.tets,
                       Lame.from_young_poisson(1e6, 0.3))
    if collisions:
        # Floor cuts through the block: collision prox active from step 1.
        solver.add_obstacle("floor", y=float(mesh.verts[:, 1].min() + 0.2))
        solver.set_collisions(list(range(len(mesh.verts))))
    else:
        solver.set_pins([0, 1])
    solver.initialize(s)
    return solver


def test_zxu_instrumented_matches_fused_noacc():
    a, b = _mk_zxu(False), _mk_zxu(False)
    tr = a.step()
    prims_i, combs_i = b.step_instrumented()
    prims_f = np.asarray(tr.prim)
    prims_f = prims_f[~np.isnan(prims_f)]
    assert len(prims_i) == len(prims_f)
    assert np.allclose(prims_f, prims_i, rtol=1e-10)
    combs_f = np.asarray(tr.comb)
    combs_f = combs_f[~np.isnan(combs_f)]
    assert np.allclose(combs_f, combs_i, rtol=1e-10)
    assert np.allclose(a.x, b.x, rtol=1e-12, atol=1e-14)
    assert b.runtime.global_ms > 0 and b.runtime.local_ms > 0


def test_zxu_instrumented_matches_fused_accel_collisions():
    a, b = _mk_zxu(True, collisions=True), _mk_zxu(True, collisions=True)
    tr = a.step()
    prims_i, combs_i = b.step_instrumented()
    prims_f = np.asarray(tr.prim)
    prims_f = prims_f[~np.isnan(prims_f)]
    n = min(len(prims_f), len(prims_i))
    assert n > 0
    assert np.allclose(prims_f[:n], prims_i[:n], rtol=1e-9)
    assert np.allclose(a.x, b.x, rtol=1e-9, atol=1e-12)
    assert int(tr.reset_count) == b.reset_num
    assert b.runtime.acceleration_ms > 0


def test_solverlog_x_star_beams(tmp_path):
    """SolverLog wired end-to-end (VERDICT r4 #8): the beams --log-x-star
    path must produce a monotone-trending normalized error trajectory that
    starts at 1 (by construction: x0 is the first logged iterate) and ends
    well below it, plus matching runtimes, written as the reference-style
    solverlog file."""
    import os
    import numpy as np
    from aa_admm_tpu.apps.beams import log_x_star
    from aa_admm_tpu.core.config import AccelType, Settings

    s = Settings()
    s.admm_iters = 60
    s.verbose = 0
    s.acceleration_type = AccelType.ANDERSON
    s.anderson_m = 5
    log = log_x_star(s, result_dir=str(tmp_path), star_iters=800)

    assert len(log.errors) == 60
    assert len(log.runtimes) == 60
    assert abs(log.errors[0] - 1.0) < 1e-12
    assert log.errors[-1] < 0.05, log.errors[-1]

    path = os.path.join(str(tmp_path), "solverlog-5.txt")
    data = np.loadtxt(path)
    assert data.shape == (60, 2)
    np.testing.assert_allclose(data[:, 1], log.errors, rtol=1e-12)
