"""Plain GeometrySolver (alternate formulation) + wire-mesh pipeline tests."""

import numpy as np

from aa_admm_tpu.core.polymesh import PolyMesh, quad_subdivide, \
    subdivide_and_smooth
from aa_admm_tpu.ops.constraints import ClosenessBatch, PlaneBatch
from aa_admm_tpu.solver.geometry_plain import GeometrySolver


def _noisy_quad_grid(nx=4, ny=4, noise=0.2, seed=0):
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.arange(nx + 1, dtype=float),
                         np.arange(ny + 1, dtype=float), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(),
                      noise * rng.normal(size=xs.size)], axis=1)
    faces = []
    def vid(i, j):
        return i * (ny + 1) + j
    for i in range(nx):
        for j in range(ny):
            faces.append([vid(i, j), vid(i + 1, j), vid(i + 1, j + 1),
                          vid(i, j + 1)])
    return verts, faces


def _planarity_err(verts, faces):
    errs = []
    for f in faces:
        p = verts[f]
        c = p - p.mean(0)
        s = np.linalg.svd(c, compute_uv=False)
        errs.append(s[-1])
    return np.max(errs)


def test_plain_solver_planarity():
    verts, faces = _noisy_quad_grid()
    solver = GeometrySolver()
    solver.add_hard_constraint(PlaneBatch.create(faces, weight=1.0))
    solver.add_soft_constraint(ClosenessBatch.create(
        list(range(len(verts))), weight=1.0, targets=verts))
    solver.setup_ADMM(len(verts), penalty_param=100.0)
    solver.solve_ADMM(verts, 1e-10, 100, 5)
    out = solver.get_solution()
    assert _planarity_err(out, faces) < _planarity_err(verts, faces) * 0.05
    fv = solver.function_values
    assert len(fv) == 100
    assert fv[-1] < fv[0]


def test_plain_solver_noacc_converges():
    verts, faces = _noisy_quad_grid(3, 3, 0.1, seed=2)
    solver = GeometrySolver()
    solver.add_hard_constraint(PlaneBatch.create(faces, weight=1.0))
    solver.add_soft_constraint(ClosenessBatch.create(
        list(range(len(verts))), weight=1.0, targets=verts))
    solver.setup_ADMM(len(verts), penalty_param=100.0)
    solver.solve_ADMM(verts, 1e-10, 80, 0)
    fv = solver.function_values
    # Plain (unaccelerated) ADMM converges linearly and slowly — exactly the
    # motivation for AA; just require steady decrease.
    assert fv[-1] < fv[0] * 0.05
    assert all(b <= a * 1.001 for a, b in zip(fv, fv[1:]))


def test_quad_subdivision_counts():
    verts, faces = _noisy_quad_grid(3, 2, 0.0)
    mesh = PolyMesh(verts=verts, faces=faces)
    out, is_new = quad_subdivide(mesh)
    V, E, F = mesh.n_verts(), len(mesh.edge_faces), mesh.n_faces()
    assert out.n_verts() == V + E + F
    assert out.n_faces() == 4 * F
    assert is_new.sum() == E + F
    # Edge midpoints land on edges; face points at centroids.
    lo0, hi0 = mesh.verts.min(0), mesh.verts.max(0)
    lo1, hi1 = out.verts.min(0), out.verts.max(0)
    assert np.allclose(lo0, lo1) and np.allclose(hi0, hi1)


def test_subdivide_and_smooth_keeps_originals():
    verts, faces = _noisy_quad_grid(3, 3, 0.3, seed=5)
    mesh = PolyMesh(verts=verts, faces=faces)
    out = subdivide_and_smooth(mesh)
    # Original vertices occupy the first V slots unchanged.
    assert np.allclose(out.verts[:len(verts)], verts)
    # Smoothed new vertices: interior edge midpoints moved off the straight
    # midpoint toward the Laplacian-smooth position (non-trivial smoothing).
    sub, is_new = quad_subdivide(mesh)
    moved = np.abs(out.verts[is_new] - sub.verts[is_new]).max()
    assert moved > 1e-6
    # and the result is smoother: ||L x|| decreased for new vertices
    from aa_admm_tpu.core.polymesh import uniform_laplacian_rows
    rows = uniform_laplacian_rows(out)
    def lap_norm(vv):
        total = 0.0
        for idx, coef in rows:
            total += np.sum((coef[:, None] * vv[idx]).sum(0) ** 2)
        return total
    assert lap_norm(out.verts) < lap_norm(sub.verts)
