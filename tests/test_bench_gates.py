"""The bench's in-run golden-trajectory quality gates (bench.py) must pass
on a faithful run and FAIL on a mis-parameterized one (VERDICT r3 weak #3:
the old 'primal decreased' check could not catch a solver converging to the
wrong state)."""

import importlib.util
import os

import numpy as np

HERE = os.path.dirname(__file__)


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(HERE, "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _beams_step(gravity=-9.8):
    from aa_admm_tpu.apps.beams import build_scene
    from aa_admm_tpu.core.config import Settings
    s = Settings()
    s.admm_iters = 100
    s.verbose = 0
    s.gravity = gravity
    solver, stretch = build_scene(s)
    stretch(s.timestep_s)
    return np.asarray(solver.step().prim)


def test_golden_head_gate_passes_on_faithful_run():
    bench = _bench()
    ok, info = bench._early_phase_gate(_beams_step(),
                                       "beams_step1_residual_no_cpp.txt")
    assert ok, info


def test_golden_head_gate_fails_on_wrong_parameters():
    bench = _bench()
    ok, info = bench._early_phase_gate(_beams_step(gravity=-3.0),
                                       "beams_step1_residual_no_cpp.txt")
    assert not ok, f"gate passed a wrong-gravity run: {info}"


def test_windyflag_head_gate_fails_on_wrong_parameters():
    """The windyflag golden-head gate (wind-off, no-accel config) must
    reject a mis-parameterized run too (VERDICT r4 #6: every scene's gate
    must fail a perturbed run)."""
    bench = _bench()
    from aa_admm_tpu.apps.windyflag import build_scene
    s = bench._settings(100, accel=False)
    s.gravity = -3.0
    g = build_scene(s)
    g.wind = None
    g.initialize(s)
    prim = np.asarray(g.step().prim)
    ok, info = bench._early_phase_gate(
        prim, "windy_nowind_step1_residual_no_cpp.txt")
    assert not ok, f"gate passed a wrong-gravity run: {info}"


def _perturbed(build_scene, gravity):
    def build(s):
        s.gravity = gravity
        return build_scene(s)
    return build


def test_plinkohit_endstate_gate_pass_and_fail():
    """The tightened 2e-3 end-state bound (VERDICT r4 #6, was 1e-1 with
    300x headroom) must still pass a faithful CPU run and must fail a
    wrong-gravity one."""
    bench = _bench()
    from aa_admm_tpu.apps.plinkohit import build_scene
    # 2e-2 is the CPU-fallback bound (measured CPU-f32 drift 5.1e-3; the
    # TPU bound is 2e-3 vs its measured 3.3e-4 — see bench.py).
    ok, info = bench._endstate_gate(build_scene,
                                    "plinkohit_final_x_30f_m5_cpp.txt", 2e-3,
                                    cpu_bound=2e-2)
    assert ok, f"faithful run failed the tightened gate: {info}"
    ok, info = bench._endstate_gate(_perturbed(build_scene, -3.0),
                                    "plinkohit_final_x_30f_m5_cpp.txt", 2e-3,
                                    cpu_bound=2e-2)
    assert not ok, f"gate passed a wrong-gravity run: {info}"


def test_plinkopony_endstate_gate_fails_on_wrong_parameters():
    bench = _bench()
    from aa_admm_tpu.apps.plinkopony import build_scene
    ok, info = bench._endstate_gate(_perturbed(build_scene, -3.0),
                                    "plinkopony_final_x_30f_m5_cpp.txt", 1e-1)
    assert not ok, f"gate passed a wrong-gravity run: {info}"


def test_planarity_quality_gate_fails_on_underconverged_run():
    """The planarity scenes' quality gate (planarity_err_max <= 3x the C++
    anchor) must reject a mis-parameterized solve. (costa2k
    starts near-planar — max 9.2e-3 before optimization — so short-but-
    correctly-parameterized runs already sit inside the 3x gate; the
    perturbation here is a WRONG PENALTY (1.0 vs 1e5), which leaves the
    hard planarity constraints unenforced: measured 5.1e-2 after 10
    iterations, 4x outside the gate.)"""
    bench = _bench()
    from aa_admm_tpu.apps.planarity_opt import (check_planarity_error,
                                                optimize_mesh)
    from aa_admm_tpu.core.meshio import load_obj, load_obj_poly
    from aa_admm_tpu.core.polymesh import PolyMesh
    verts, faces = load_obj_poly(
        f"{bench.REF}/PQMeshData/polymesh/costa2k_poly.obj")
    mesh = PolyMesh(verts=verts, faces=faces)
    ref = load_obj(f"{bench.REF}/PQMeshData/trimesh/costa2k_tri.obj")
    solver = optimize_mesh(mesh, ref.verts, ref.faces, 10, 5,
                           penalty_parameter=1.0, dtype=np.float32)
    pl_after, _ = check_planarity_error(mesh, solver.get_solution())
    pl_max = float(np.max(pl_after))
    assert pl_max > bench._QUALITY_LOOSE * bench._COSTA2K_PLANARITY_MAX, (
        f"wrong-penalty planarity error {pl_max} inside the gate — "
        f"the gate would not catch a mis-parameterized run")
