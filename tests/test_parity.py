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


def _sequential_wind_replay(dt, x, v, faces, direction, alpha_n=1000.0):
    """Host-side sequential replay of the reference's wind loop
    (admm_anderson_hard_zxu/src/ExplicitForce.cpp:47-104): triangles are
    processed IN ORDER and each reads the velocity vector the previous
    triangles already modified — the deterministic single-thread execution
    of the reference's schedule-dependent OpenMP loop (which reads v while
    writing it under a critical section)."""
    v = np.array(v, np.float64, copy=True)
    x = np.asarray(x, np.float64)
    direction = np.asarray(direction, np.float64)
    for f in np.asarray(faces):
        curr_v = v[f].mean(axis=0)
        v_r = curr_v - direction
        e1, e2 = x[f[1]] - x[f[0]], x[f[2]] - x[f[0]]
        n = np.cross(e1, e2)
        n_norm = np.linalg.norm(n)
        normal = n / max(n_norm, 1e-300)
        area = 0.5 * n_norm
        v_n = float(normal @ v_r)
        force = -alpha_n * area * v_n * abs(v_n) * normal * 0.33 * dt
        v[f] += force
    return v


GOLDEN_WINDY_ON = os.path.join(os.path.dirname(__file__), "golden",
                               "windy_wind_step1_residual_no_cpp.txt")


def test_windyflag_wind_on_sequential_matches_cpp():
    """Wind-ON parity (VERDICT r4 #7). The golden is ONE non-accelerated
    windyflag timestep from the unmodified zxu reference build run with
    OMP_NUM_THREADS=1 — the deterministic sequential execution of its
    schedule-dependent wind loop (2 threads shift the same trajectory by
    ~2.3e-3, measured). Our 'sequential' wind mode (in-graph triangle
    scan) must reproduce it through the full zxu step; measured head
    error 2.1e-7, pinned at 1e-5."""
    import pytest
    if not os.path.exists(DATA_ZXU):
        pytest.skip("reference data not mounted")
    from aa_admm_tpu.apps.windyflag import build_scene

    cpp = np.loadtxt(GOLDEN_WINDY_ON)
    cp, cc = cpp[:, 1], cpp[:, 2]

    s = Settings()
    s.admm_iters = 100
    s.verbose = 0
    s.penalty = 1.0
    solver = build_scene(s, wind_mode="sequential")
    tr = solver.step()
    prim = np.asarray(tr.prim)
    comb = np.asarray(tr.comb)
    for i in range(25):
        assert abs(prim[i] - cp[i]) / cp[i] < 1e-5, \
            f"iter {i}: {prim[i]} vs {cp[i]}"
        assert abs(comb[i] - cc[i]) / cc[i] < 1e-4, \
            f"iter {i}: comb {comb[i]} vs {cc[i]}"
    assert 0.1 < prim[99] / cp[99] < 10.0


def test_wind_sequential_scan_matches_host_replay():
    """The device-side sequential wind scan must equal the host replay of
    the reference loop to f64 roundoff (same order, same live reads), and
    the Jacobi default must diverge from it by the documented macroscopic
    amount at windyflag's wind strength — the regression pin for the
    measured ~0.46 step-1 residual-head divergence that makes 'sequential'
    the parity mode (see WindForce docstring)."""
    import pytest
    if not os.path.exists(DATA_ZXU):
        pytest.skip("reference data not mounted")
    import jax.numpy as jnp
    from aa_admm_tpu.apps.windyflag import build_scene

    s = Settings()
    s.admm_iters = 2
    s.verbose = 0
    s.penalty = 1.0
    solver = build_scene(s, wind_mode="sequential")
    sysm = solver.system
    x = np.asarray(solver.x, np.float64)
    v = np.asarray(solver.v, np.float64)

    v_dev = np.asarray(sysm.wind.apply(
        sysm.dt, jnp.asarray(x), jnp.asarray(v), sysm.n_verts))
    v_host = _sequential_wind_replay(
        sysm.dt, x, v, np.asarray(sysm.wind.faces),
        np.asarray(sysm.wind.direction, np.float64))
    kick = np.abs(v_host - v).max()
    assert np.abs(v_dev - v_host).max() < 1e-9 * max(kick, 1.0)

    import dataclasses
    jac = dataclasses.replace(sysm.wind, mode="jacobi")
    v_jac = np.asarray(jac.apply(
        sysm.dt, jnp.asarray(x), jnp.asarray(v), sysm.n_verts))
    rel = np.abs(v_jac - v_host).max() / kick
    assert 0.01 < rel < 2.0, (
        f"jacobi-vs-sequential kick divergence {rel} left the documented "
        f"regime — re-measure and update WindForce's docstring")
