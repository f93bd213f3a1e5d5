"""Benchmark driver: beams (the reference's testAndersonADMM scene) on the
available accelerator. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: fused ADMM iterations/second on the beams scene (3x 12x3x3 tet-block
beams, Linear/NeoHookean/StVK, 100 iterations/step, Anderson m=5).
vs_baseline compares against the OpenMP C++ reference measured on this
host's CPU when a recorded baseline exists (BASELINE_local.json), else 1.0.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    os.environ.setdefault("AAADMM_DTYPE", "float32")
    platform = os.environ.get("AAADMM_PLATFORM")
    if platform:
        # The axon plugin force-selects its platform; this must be overridden
        # at the config level, not via JAX_PLATFORMS.
        import jax
        jax.config.update("jax_platforms", platform)
    from aa_admm_tpu.core.config import AccelType, Settings
    from aa_admm_tpu.apps.beams import build_scene

    settings = Settings()
    settings.admm_iters = 100
    settings.verbose = 0
    settings.acceleration_type = AccelType.ANDERSON
    settings.anderson_m = 5
    settings.collect_comb_residual = True
    settings.dtype = np.dtype(os.environ.get("AAADMM_DTYPE", "float32"))

    solver, stretch = build_scene(settings)

    # Warmup (compile) + first device->host fetch (some transports pay a
    # large one-time latency on the first readback; keep it out of timing).
    stretch(settings.timestep_s)
    tr = solver.step()
    _ = np.asarray(tr.reset_count)
    solver.flush_traces()

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        stretch(settings.timestep_s)
        solver.step()
    elapsed = time.perf_counter() - t0

    iters_per_s = n_steps * settings.admm_iters / elapsed

    # Outside the timed window: fetch traces and sanity-check convergence.
    solver.flush_traces()
    assert solver.step_prim and all(
        p == p for p in solver.step_prim), "non-finite residuals"

    vs_baseline = 1.0
    base_path = os.path.join(os.path.dirname(__file__), "BASELINE_local.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        ref = base.get("beams_iters_per_s")
        if ref:
            vs_baseline = iters_per_s / ref

    print(json.dumps({
        "metric": "beams_admm_iters_per_s",
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
