"""WireMeshOpt head-of-trajectory parity against the reference C++ build.

tests/golden/wiremesh_maletorso_residual_5_cpp.txt holds the combined
residual per accepted iteration (time \t value rows) of the UNMODIFIED
Geometry/WireMeshOpt.cpp running MaleTorso -> MaleTorso_target with the
shipped Options.txt (Iterations 100, AndersonM 5). The first iterations
pin the whole large-mesh pipeline at f64: subdivision + smoothing, angle +
edge-length hard projections, the candidate-cached reference-surface soft
projection, the Morton-blocked (BsrMatrix) PCG global step, and AA(u,x)
accept/reject. Slow (~5 min host subdivision + f64 CPU solve) — gated.
"""

import os

import numpy as np
import pytest

GEO = "/root/reference/Geometry/Geometry_model"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "wiremesh_maletorso_residual_5_cpp.txt")


@pytest.mark.skipif(not os.path.exists(GEO),
                    reason="reference data not mounted")
@pytest.mark.skipif(os.environ.get("AAADMM_SLOW_TESTS") != "1",
                    reason="slow (set AAADMM_SLOW_TESTS=1)")
def test_wiremesh_trajectory_head_matches_cpp():
    from aa_admm_tpu.core.meshio import load_obj, load_obj_poly
    from aa_admm_tpu.core.polymesh import PolyMesh
    from aa_admm_tpu.apps.wire_mesh_opt import (optimize_mesh,
                                                subdivide_and_smooth)

    verts, faces = load_obj_poly(f"{GEO}/WireMeshData/MaleTorso.obj")
    mesh = PolyMesh(verts=verts, faces=faces)
    ref = load_obj(f"{GEO}/WireMeshData/MaleTorso_target.obj")
    el = mesh.average_edge_length()
    sub = subdivide_and_smooth(mesh)
    solver = optimize_mesh(sub, ref.verts, ref.faces, 6, 5,
                           edge_length=el * 0.5, dtype=np.float64,
                           chunk_iters=3)
    fv = np.asarray(solver.function_values)
    cpp = np.loadtxt(GOLDEN)[:, 1]
    n = min(len(fv), 6)
    rel = np.abs(fv[:n] - cpp[:n]) / cpp[:n]
    assert rel.max() < 1e-5, f"combined-residual rel err {rel}"
