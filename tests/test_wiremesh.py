"""Wire-mesh optimization pipeline (synthetic small grid)."""

import numpy as np

from aa_admm_tpu.core.polymesh import PolyMesh, subdivide_and_smooth
from aa_admm_tpu.apps.wire_mesh_opt import (check_wiremesh_error,
                                            optimize_mesh)


def _grid(nx, ny, noise, seed=0):
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
    return PolyMesh(verts=verts, faces=faces)


def test_wiremesh_pipeline(tmp_path):
    mesh = _grid(4, 4, 0.15)
    el = mesh.average_edge_length()
    sub = subdivide_and_smooth(mesh)
    ref_v = np.array([[-1.0, -1, 0], [6, -1, 0], [6, 6, 0], [-1, 6, 0]])
    ref_f = np.array([[0, 1, 2], [0, 2, 3]])

    e_b, a_b, _ = check_wiremesh_error(sub, sub.verts, el * 0.5,
                                       np.pi / 4, 3 * np.pi / 4)
    solver = optimize_mesh(sub, ref_v, ref_f, max_iter=60, anderson_m=5,
                           edge_length=el * 0.5,
                           result_dir=str(tmp_path))
    out = solver.get_solution()
    e_a, a_a, _ = check_wiremesh_error(sub, out, el * 0.5,
                                       np.pi / 4, 3 * np.pi / 4)
    assert e_a.mean() < e_b.mean() * 0.1       # edge error strongly reduced
    assert a_a.max() <= a_b.max() + 1e-9       # angles stay within limits
    assert (tmp_path / "residual-5.txt").exists()
    assert np.all(np.isfinite(out))
