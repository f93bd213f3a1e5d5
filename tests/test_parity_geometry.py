"""Geometry parity vs the unmodified reference PlanarityOpt build.

The headless C++ PlanarityOpt (costa2k, Iterations 100, AndersonM 5) prints
after-optimization error metrics and writes result/residual-5.txt; our run
of the same config reproduces the error metrics to ~7 significant digits
(recorded in BASELINE_local.json / tests/golden/costa2k_residual_5_cpp.txt).

The full 100-iteration costa2k run takes minutes on the 2-core CPU test
host, so this test is gated behind AAADMM_SLOW_TESTS=1; the fast windyflag
and beams parity tests cover the solver loops themselves.
"""

import os

import numpy as np
import pytest

DATA = "/root/reference/Geometry/Geometry_model"
slow = pytest.mark.skipif(os.environ.get("AAADMM_SLOW_TESTS") != "1",
                          reason="slow: set AAADMM_SLOW_TESTS=1")


@slow
@pytest.mark.skipif(not os.path.exists(DATA), reason="data not mounted")
def test_airport3k_converged_metrics_match_cpp():
    """The second named PlanarityOpt benchmark mesh (PlanarityOpt.cpp:289;
    BASELINE.md scene table). C++ after-metrics from the unmodified
    reference build on this host (BASELINE_local.json airport3k entry)."""
    from aa_admm_tpu.core.meshio import load_obj, load_obj_poly
    from aa_admm_tpu.core.polymesh import PolyMesh
    from aa_admm_tpu.apps.planarity_opt import (check_planarity_error,
                                                optimize_mesh)

    verts, faces = load_obj_poly(
        DATA + "/PQMeshData/polymesh/airport3k_poly.obj")
    mesh = PolyMesh(verts=verts, faces=faces)
    ref = load_obj(DATA + "/PQMeshData/trimesh/airport3k_tri.obj")
    solver = optimize_mesh(mesh, ref.verts, ref.faces, 100, 5)
    out = solver.get_solution()
    pl, diag = check_planarity_error(mesh, out)
    assert abs(pl.max() - 0.00281271) / 0.00281271 < 1e-3
    assert abs(pl.mean() - 0.000422131) / 0.000422131 < 1e-3
    assert abs(diag.max() - 0.00436658) / 0.00436658 < 1e-3
    assert abs(diag.mean() - 0.000771843) / 0.000771843 < 1e-3


@slow
@pytest.mark.skipif(not os.path.exists(DATA), reason="data not mounted")
def test_costa2k_converged_metrics_match_cpp():
    from aa_admm_tpu.core.meshio import load_obj, load_obj_poly
    from aa_admm_tpu.core.polymesh import PolyMesh
    from aa_admm_tpu.apps.planarity_opt import (check_planarity_error,
                                                optimize_mesh)

    verts, faces = load_obj_poly(
        DATA + "/PQMeshData/polymesh/costa2k_poly.obj")
    mesh = PolyMesh(verts=verts, faces=faces)
    ref = load_obj(DATA + "/PQMeshData/trimesh/costa2k_tri.obj")
    solver = optimize_mesh(mesh, ref.verts, ref.faces, 100, 5)
    out = solver.get_solution()
    pl, diag = check_planarity_error(mesh, out)
    # C++ reference after-metrics (BASELINE_local.json):
    assert abs(pl.max() - 0.00408527) / 0.00408527 < 1e-3
    assert abs(pl.mean() - 0.000421631) / 0.000421631 < 1e-3
    assert abs(diag.max() - 0.00692145) / 0.00692145 < 1e-3
    assert abs(diag.mean() - 0.000770586) / 0.000770586 < 1e-3
