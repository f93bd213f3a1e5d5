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
