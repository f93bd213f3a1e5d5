"""Trajectory parity against the reference C++ solver.

tests/golden/beams_step1_residual_no_cpp.txt holds the per-iteration
primal/combined residuals of ONE non-accelerated beams timestep produced by
the unmodified reference build (see tests/golden/README.md). The first
iterations must match to float32-mesh rounding (~1e-7 relative); later
iterations drift chaotically, so the comparison window is the head of the
trajectory plus an order-of-magnitude check on the tail.
"""

import os

import numpy as np

from aa_admm_tpu.core.config import Settings
from aa_admm_tpu.apps.beams import build_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "beams_step1_residual_no_cpp.txt")


def test_beams_noacc_trajectory_matches_cpp():
    cpp = np.loadtxt(GOLDEN)
    cp, cc = cpp[:, 1], cpp[:, 2]

    s = Settings()
    s.admm_iters = 100
    s.verbose = 0
    solver, stretch = build_scene(s)
    stretch(s.timestep_s)
    tr = solver.step()
    prim = np.asarray(tr.prim)
    comb = np.asarray(tr.comb)

    # Head of the trajectory: tight agreement.
    for i in range(25):
        assert abs(prim[i] - cp[i]) / cp[i] < 1e-5, \
            f"iter {i}: {prim[i]} vs {cp[i]}"
        assert abs(comb[i] - cc[i]) / cc[i] < 1e-5, \
            f"iter {i}: comb {comb[i]} vs {cc[i]}"
    # Tail: same convergence order of magnitude.
    assert 0.1 < prim[99] / cp[99] < 10.0
    assert 0.01 < comb[99] / cc[99] < 100.0


GOLDEN_WINDY = os.path.join(os.path.dirname(__file__), "golden",
                            "windy_nowind_step1_residual_no_cpp.txt")
DATA_ZXU = "/root/reference/admm_anderson_hard_zxu/samples/data"


def test_windyflag_nowind_zxu_trajectory_matches_cpp():
    """zxu-order parity: one windyflag timestep with wind zeroed (the
    reference's wind loop is schedule-dependent — see WindForce docstring).
    Residuals must track the unmodified C++ build to f32-mesh rounding."""
    import pytest
    if not os.path.exists(DATA_ZXU):
        pytest.skip("reference data not mounted")
    cpp = np.loadtxt(GOLDEN_WINDY)
    cp, cc = cpp[:, 1], cpp[:, 2]

    from aa_admm_tpu.core.config import Lame
    from aa_admm_tpu.core.meshio import load_obj
    from aa_admm_tpu.solver.physics import PhysicsSolver, UpdateOrder
    from aa_admm_tpu.apps.windyflag import get_pins

    mesh = load_obj(os.path.join(DATA_ZXU, "cloth.obj"))
    lame = Lame.from_young_poisson(50, 0.1, limit_min=0.95, limit_max=1.05)
    s = Settings()
    s.admm_iters = 100
    s.verbose = 0
    solver = PhysicsSolver(order=UpdateOrder.ZXU)
    solver.add_trimesh(mesh.verts, mesh.faces, lame)
    solver.set_pins(get_pins(mesh.verts))
    solver.initialize(s)
    tr = solver.step()
    prim = np.asarray(tr.prim)
    comb = np.asarray(tr.comb)
    for i in range(25):
        assert abs(prim[i] - cp[i]) / cp[i] < 1e-4, \
            f"iter {i}: {prim[i]} vs {cp[i]}"
        assert abs(comb[i] - cc[i]) / cc[i] < 1e-4
    assert 0.1 < prim[99] / cp[99] < 10.0
