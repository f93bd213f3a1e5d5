"""TPU/f32 golden-parity tests — run on the REAL accelerator.

Unlike tests/ (which forces CPU + f64), this directory exercises the
framework's production precision policy (SURVEY §7.1: f32 bulk kernels,
f64-free TPU path) against the reference C++ golden trajectories.

Run explicitly (claims the TPU — do not run concurrently with bench.py):

    AAADMM_TPU_TESTS=1 python -m pytest tests_tpu/ -q

Kept out of pytest.ini testpaths so the default CPU suite never touches
the accelerator.
"""

import os

import pytest

if os.environ.get("AAADMM_TPU_FORCE_CPU") == "1":
    # Smoke-test the suite's logic without claiming the accelerator
    # (bounds are calibrated for f32 — platform-independent).
    import jax
    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("AAADMM_TPU_TESTS") != "1":
        marker = pytest.mark.skip(
            reason="set AAADMM_TPU_TESTS=1 to run (claims the TPU)")
        for item in items:
            item.add_marker(marker)
