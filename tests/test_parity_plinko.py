"""Hard-collision (zxu) trajectory parity against the reference C++ solver.

tests/golden/plinko{hit,pony}_* hold the 30th step's residual trajectory and
the frame-30 position vector produced by the UNMODIFIED reference zxu build
running the plinko scenes headlessly with `-a 1 -am 5 -it 13` (see
tests/golden/README.md). By frame 30 both scenes are in contact, so these
pin the whole pipeline: CollisionEnergyTerm prox (SDF snap), penalty
coupling, AA(u,x) accept/reject, and 30 frames of accumulated dynamics.

The scenes replicate the reference's float32 mesh transform
(plinkohit.cpp:47-50, plinkopony.cpp:39-42), so initial state matches
bit-for-bit and the f64 trajectories track to ~1e-10 relative.
"""

import os

import numpy as np
import pytest

from aa_admm_tpu.core.config import AccelType, Settings

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
DATA = "/root/reference/admm_anderson_hard_zxu/samples/data"
needs_data = pytest.mark.skipif(not os.path.exists(DATA),
                                reason="reference data not mounted")

N_FRAMES = 30


def _run(build_scene):
    s = Settings()
    s.admm_iters = 13
    s.verbose = 0
    s.acceleration_type = AccelType.ANDERSON
    s.anderson_m = 5
    solver = build_scene(s)
    for _ in range(N_FRAMES):
        tr = solver.step()
    return solver, tr


def _check(solver, tr, residual_golden, x_golden, rtol=1e-6, xtol=1e-7):
    cpp = np.loadtxt(os.path.join(GOLDEN_DIR, residual_golden))
    prim = np.asarray(tr.prim)
    comb = np.asarray(tr.comb)
    assert prim.shape[0] == cpp.shape[0] == 13
    rel_p = np.abs(prim - cpp[:, 1]) / cpp[:, 1]
    rel_c = np.abs(comb - cpp[:, 2]) / cpp[:, 2]
    assert rel_p.max() < rtol, f"primal rel err {rel_p}"
    assert rel_c.max() < rtol, f"combined rel err {rel_c}"
    # reject pattern must match the reference's is_reject column
    # (admm_anderson_hard_zxu/src/Solver.hpp:148, the 4th residual column)
    rej = np.asarray(tr.reject).astype(int)
    np.testing.assert_array_equal(rej, cpp[:, 3].astype(int))

    xref = np.loadtxt(os.path.join(GOLDEN_DIR, x_golden)).reshape(-1, 3)
    x = np.asarray(solver.x).reshape(-1, 3)
    d = np.linalg.norm(x - xref, axis=1)
    assert d.max() < xtol, f"final_x max err {d.max()}"


@needs_data
def test_plinkohit_30frames_matches_cpp():
    from aa_admm_tpu.apps.plinkohit import build_scene
    solver, tr = _run(build_scene)
    _check(solver, tr, "plinkohit_step30_residual_m5_cpp.txt",
           "plinkohit_final_x_30f_m5_cpp.txt")


@needs_data
def test_plinkopony_30frames_matches_cpp():
    from aa_admm_tpu.apps.plinkopony import build_scene
    solver, tr = _run(build_scene)
    # Pony bounces through the peg grid — contact events amplify f64
    # roundoff, so the 30-frame trajectory matches to ~1e-5 (vs hit's
    # ~1e-10, where the horse settles into the pit).
    _check(solver, tr, "plinkopony_step30_residual_m5_cpp.txt",
           "plinkopony_final_x_30f_m5_cpp.txt", rtol=1e-4, xtol=1e-5)
