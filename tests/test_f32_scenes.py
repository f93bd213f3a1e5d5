"""f32 production-precision sweep over ALL six scene builders (VERDICT r2
item 1): under jax_enable_x64 a single f64 leaf poisons a scan carry or a
lax.cond branch, so every scene must (a) build a system with zero f64
leaves and (b) run a real (small) solve at f32.

The physics scenes are the real BASELINE.md builders; the geometry scenes
use a small synthetic quad grid through the same constraint/solver code
paths (PlaneBatch+RefSurface+rel-laplacian = PlanarityOpt's set;
Angle+EdgeLength+RefSurface on the PCG/ELL path = WireMeshOpt's set) so the
sweep stays fast on the 2-core CPU host. Full-size f32 runs live in
tests_tpu/ and the AAADMM_SLOW_TESTS-gated costa2k test below.
"""

import os

import jax.tree_util as jtu
import numpy as np
import pytest

from aa_admm_tpu.core.config import AccelType, Settings


def _f64_leaves(tree):
    return [l for l in jtu.tree_leaves(tree)
            if hasattr(l, "dtype") and l.dtype == np.float64]


def _settings(iters=3):
    s = Settings()
    s.admm_iters = iters
    s.verbose = 0
    s.acceleration_type = AccelType.ANDERSON
    s.anderson_m = 5
    s.collect_comb_residual = True
    s.dtype = np.dtype("float32")
    return s


DATA = "/root/reference/admm_anderson_hard_zxu/samples/data"
GEO = "/root/reference/Geometry/Geometry_model"
needs_data = pytest.mark.skipif(not os.path.exists(DATA),
                                reason="reference data not mounted")
needs_geo = pytest.mark.skipif(not os.path.exists(GEO),
                               reason="reference data not mounted")


def _check_physics(solver):
    bad = _f64_leaves(solver.system)
    assert not bad, f"f64 leaves in f32 system: {[b.shape for b in bad]}"
    tr = solver.step()
    solver.flush_traces()
    assert solver.x.dtype == np.float32
    assert np.all(np.isfinite(solver.x))
    prim = np.asarray(tr.prim)
    assert np.all(np.isfinite(prim[~np.isnan(prim)]))


def test_beams_f32():
    from aa_admm_tpu.apps.beams import build_scene
    s = _settings()
    solver, stretch = build_scene(s)
    stretch(s.timestep_s)
    _check_physics(solver)


@needs_data
def test_windyflag_f32():
    from aa_admm_tpu.apps.windyflag import build_scene
    _check_physics(build_scene(_settings()))


@needs_data
def test_plinkohit_f32():
    from aa_admm_tpu.apps.plinkohit import build_scene
    _check_physics(build_scene(_settings()))


@needs_data
def test_plinkopony_f32():
    from aa_admm_tpu.apps.plinkopony import build_scene
    _check_physics(build_scene(_settings()))


def _quad_grid(n=6, z_bump=0.15):
    """Small non-planar quad grid + a flat reference trimesh under it."""
    rng = np.random.default_rng(0)
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float64),
                         np.arange(n, dtype=np.float64))
    verts = np.stack([xs.ravel(), ys.ravel(),
                      z_bump * rng.standard_normal(n * n)], axis=1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n + 1, a + n])
    ref_verts = verts.copy()
    ref_verts[:, 2] = 0.0
    ref_faces = []
    for f in faces:
        ref_faces.append([f[0], f[1], f[2]])
        ref_faces.append([f[0], f[2], f[3]])
    return verts, np.asarray(faces), ref_verts, np.asarray(ref_faces)


def _geo_f64_leaves(solver):
    # The solve-time system (with delta anchors x0/t0/Ax0) is what the jitted
    # loop actually sees — check that, not just the setup-time system.
    return _f64_leaves(solver.system)


def test_planarity_path_f32_dense():
    """PlanarityOpt's constraint set (plane hard + ref-surface soft +
    relative laplacian) on the dense-inverse path at f32."""
    from aa_admm_tpu.ops.constraints import PlaneBatch, RefSurfaceBatch
    from aa_admm_tpu.solver.geometry import ALMGeometrySolver

    verts, faces, rv, rf = _quad_grid()
    solver = ALMGeometrySolver()
    solver.dtype = np.dtype("float32")
    solver.add_soft_constraint(RefSurfaceBatch.create(
        list(range(len(verts))), 1.0, rv, rf))
    solver.add_hard_constraint(PlaneBatch.create(
        [list(f) for f in faces], 1.0))
    for i in range(1, len(verts) - 1):
        solver.add_relative_uniform_laplacian([i, i - 1, i + 1], 0.1, verts)
    solver.setup_ADMM(len(verts), 1e5)
    tr = solver.solve_ADMM(verts, 1e-8, 5, 5)
    assert not _geo_f64_leaves(solver)
    x = np.asarray(tr.x)
    assert x.dtype == np.float32
    assert np.all(np.isfinite(x))
    fv = np.asarray(tr.function_values)
    assert np.all(np.isfinite(fv[~np.isnan(fv)]))


def test_wiremesh_path_f32_pcg():
    """WireMeshOpt's constraint set (angle + edge-length hard, ref-surface
    soft) on the PCG/ELL path at f32 (the path the 57k-vert mesh takes)."""
    from aa_admm_tpu.ops.constraints import (AngleBatch, EdgeLengthBatch,
                                             RefSurfaceBatch)
    from aa_admm_tpu.solver.geometry import ALMGeometrySolver

    verts, faces, rv, rf = _quad_grid()
    solver = ALMGeometrySolver(dense_threshold=1)  # force PCG/ELL
    solver.dtype = np.dtype("float32")
    solver.add_soft_constraint(RefSurfaceBatch.create(
        list(range(len(verts))), 1.0, rv, rf))
    corners, edges = [], set()
    for f in faces:
        k = len(f)
        for c in range(k):
            corners.append([f[c], f[(c - 1) % k], f[(c + 1) % k]])
            edges.add(tuple(sorted((int(f[c]), int(f[(c + 1) % k])))))
    solver.add_hard_constraint(AngleBatch.create(
        corners, 1.0, np.pi / 4, 3 * np.pi / 4))
    solver.add_hard_constraint(EdgeLengthBatch.create(
        sorted(edges), 1.0, target_length=1.0))
    solver.setup_ADMM(len(verts), 1000.0)
    tr = solver.solve_ADMM(verts, 1e-8, 5, 5)
    assert not _geo_f64_leaves(solver)
    x = np.asarray(tr.x)
    assert x.dtype == np.float32
    assert np.all(np.isfinite(x))


@needs_geo
@pytest.mark.skipif(os.environ.get("AAADMM_SLOW_TESTS") != "1",
                    reason="slow: full costa2k at f32 (set AAADMM_SLOW_TESTS=1)")
def test_costa2k_f32_full():
    """Full 100-iteration costa2k PlanarityOpt at f32: converged planarity
    error must land near the C++ f64 baseline (0.00408527)."""
    from aa_admm_tpu.apps.planarity_opt import (check_planarity_error,
                                                optimize_mesh)
    from aa_admm_tpu.core.meshio import load_obj, load_obj_poly
    from aa_admm_tpu.core.polymesh import PolyMesh

    verts, faces = load_obj_poly(f"{GEO}/PQMeshData/polymesh/costa2k_poly.obj")
    mesh = PolyMesh(verts=verts, faces=faces)
    ref = load_obj(f"{GEO}/PQMeshData/trimesh/costa2k_tri.obj")
    solver = optimize_mesh(mesh, ref.verts, ref.faces, 100, 5,
                           dtype=np.dtype("float32"))
    pl_after, _ = check_planarity_error(mesh, solver.get_solution())
    assert float(np.max(pl_after)) < 3.0 * 0.00408527
