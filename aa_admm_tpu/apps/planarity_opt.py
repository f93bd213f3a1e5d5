"""PlanarityOpt — planar-quad-mesh optimization
(Geometry/PlanarityOpt.cpp:39-332, headless CLI-compatible).

Usage: planarity_opt IN_MESH REF_MESH OPTIONS_FILE OUT_MESH
Constraints (optimize_mesh, :134-287): per-vertex PointToRefSurface soft
(closeness weight), relative-uniform-Laplacian regularizers split along quad
diagonals at valence-4 interior vertices, per-face PlaneConstraint hard;
defaults penalty=1e5, closeness=1, rel-laplacian=0.1 (:322-325).
Error metrics: planarity + diagonal error normalized by average edge length
(:67-108) and reference-surface distance (:110-131).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..core.config import Parameters
from ..core.meshio import load_obj, load_obj_poly, save_obj
from ..core.polymesh import PolyMesh
from ..ops.closest_point import closest_point_on_mesh
from ..ops.constraints import PlaneBatch, RefSurfaceBatch
from ..solver.geometry import ALMGeometrySolver


def check_planarity_error(mesh: PolyMesh, verts=None):
    """Max-deviation-from-best-fit-plane and quad diagonal error, normalized
    by average edge length (PlanarityOpt.cpp:67-108). Returns
    (planarity (F,), diag (F,))."""
    if verts is None:
        verts = mesh.verts
    F = mesh.n_faces()
    planarity = np.zeros(F)
    diag = np.zeros(F)
    for fi, f in enumerate(mesh.faces):
        p = verts[f].T  # (3, k)
        if p.shape[1] == 4:
            d1 = p[:, 2] - p[:, 0]
            d2 = p[:, 3] - p[:, 1]
            c1 = 0.5 * (p[:, 2] + p[:, 0])
            c2 = 0.5 * (p[:, 3] + p[:, 1])
            n = np.cross(d1, d2)
            n = n / max(np.linalg.norm(n), 1e-300)
            diag[fi] = abs(np.dot(n, c1 - c2))
        c = p - p.mean(axis=1, keepdims=True)
        _, s, _ = np.linalg.svd(c, full_matrices=False)
        # max |N^T c| over the face's points = projection onto least axis
        u = np.linalg.svd(c, full_matrices=True)[0][:, 2]
        planarity[fi] = np.abs(u @ c).max()
    el = PolyMesh(verts=verts, faces=mesh.faces).average_edge_length()
    planarity /= el
    diag /= el
    print(f"Diagonal error (normalized by edge length): max {diag.max()}, "
          f"average {diag.mean()}")
    print(f"Planarity error (normalized by edge length): max "
          f"{planarity.max()}, average {planarity.mean()}")
    return planarity, diag


def check_ref_surface_distance(verts, mesh: PolyMesh, ref_verts, ref_faces):
    import jax.numpy as jnp
    tri = np.asarray(ref_verts)[np.asarray(ref_faces)]
    q = np.asarray(closest_point_on_mesh(jnp.asarray(verts),
                                         jnp.asarray(tri)))
    el = PolyMesh(verts=verts, faces=mesh.faces).average_edge_length()
    dist = np.linalg.norm(verts - q, axis=1) / el
    print(f"Reference surface distance (normalized by edge length): "
          f"Max {dist.max()}, Average {dist.mean()}")
    return dist


def optimize_mesh(mesh: PolyMesh, ref_verts, ref_faces, max_iter: int,
                  anderson_m: int, penalty_parameter: float = 1e5,
                  closeness_weight: float = 1.0,
                  laplacian_weight: float = 0.0,
                  relative_laplacian_weight: float = 0.1,
                  dtype=np.float64):
    """PlanarityOpt.cpp optimize_mesh (:134-287)."""
    p = mesh.verts
    solver = ALMGeometrySolver()
    solver.dtype = np.dtype(dtype)

    if closeness_weight > 0:
        solver.add_soft_constraint(RefSurfaceBatch.create(
            list(range(mesh.n_verts())), closeness_weight,
            ref_verts, ref_faces))

    if laplacian_weight > 0 or relative_laplacian_weight > 0:
        for v in range(mesh.n_verts()):
            if not mesh.is_boundary_vertex(v):
                ring = mesh.vertex_ring(v)
                vhs = [v] + ring
                if len(vhs) == 5:
                    # Valence-4: split the ring into the two diagonals
                    # (PlanarityOpt.cpp:175-193).
                    pairs = [[vhs[0], vhs[1], vhs[3]],
                             [vhs[0], vhs[2], vhs[4]]]
                    for pr in pairs:
                        if relative_laplacian_weight > 0:
                            solver.add_relative_uniform_laplacian(
                                pr, relative_laplacian_weight, p)
                        if laplacian_weight > 0:
                            solver.add_uniform_laplacian(pr, laplacian_weight)
                else:
                    if relative_laplacian_weight > 0:
                        solver.add_relative_uniform_laplacian(
                            vhs, relative_laplacian_weight, p)
                    if laplacian_weight > 0:
                        solver.add_uniform_laplacian(vhs, laplacian_weight)
            else:
                nbrs, fids = mesh.boundary_neighbors(v)
                if len(fids) == 2 and fids[0] != fids[1]:
                    vhs = [v] + nbrs
                    if relative_laplacian_weight > 0:
                        solver.add_relative_uniform_laplacian(
                            vhs, relative_laplacian_weight, p)
                    if laplacian_weight > 0:
                        solver.add_uniform_laplacian(vhs, laplacian_weight)

    plane_faces = [f for f in mesh.faces if len(f) > 3]
    if plane_faces:
        solver.add_hard_constraint(PlaneBatch.create(plane_faces, weight=1.0))

    eps_ratio = 1e-8
    rel_residual_eps = eps_ratio * mesh.average_edge_length()
    print(f"Relative residual eps (normalized by edge length): {eps_ratio}")

    if solver.setup_ADMM(mesh.n_verts(), penalty_parameter):
        solver.solve_ADMM(p, rel_residual_eps, max_iter, anderson_m)
    return solver


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 4:
        print("Usage: planarity_opt IN_MESH REF_MESH OPTIONS OUT_MESH")
        return 1
    in_path, ref_path, opt_path, out_path = argv[:4]

    verts, faces = load_obj_poly(in_path)
    mesh = PolyMesh(verts=verts, faces=faces)
    ref = load_obj(ref_path)
    params = Parameters.load(opt_path)
    if not params.valid():
        print("Invalid options")
        return 1
    print(params.output())

    print("Before optimization:")
    pl_before, _ = check_planarity_error(mesh)
    check_ref_surface_distance(mesh.verts, mesh, ref.verts, ref.faces)

    solver = optimize_mesh(mesh, ref.verts, ref.faces,
                           params.iterations, params.anderson_m)
    out = solver.get_solution()

    print("After optimization:")
    pl_after, _ = check_planarity_error(mesh, out)
    check_ref_surface_distance(out, mesh, ref.verts, ref.faces)

    os.makedirs("result", exist_ok=True)
    np.savetxt("result/planarityErrBefore.txt", pl_before, fmt="%.16g")
    np.savetxt("result/planatityErrAfter.txt", pl_after, fmt="%.16g")
    solver.save(params.anderson_m)
    save_obj(out_path, out, mesh.faces)
    return 0


if __name__ == "__main__":
    sys.exit(main())
