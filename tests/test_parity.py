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
