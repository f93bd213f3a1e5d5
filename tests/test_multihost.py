"""Multi-host (jax.distributed) dryrun test — SURVEY §4(d)/§5.8's DCN-axis
claim, exercised end to end with two OS processes (VERDICT r4 #4).

Gated behind AAADMM_SLOW_TESTS: spawns two fresh interpreters (each pays
its own jax init + compile, ~1 min on the 2-core host)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("AAADMM_SLOW_TESTS") != "1",
                    reason="slow: spawns 2 jax.distributed processes "
                           "(AAADMM_SLOW_TESTS=1)")
def test_two_process_ensemble_parity(tmp_path):
    script = os.path.join(REPO, "tools", "multihost_dryrun.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, script], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=700)
    assert out.returncode == 0, out.stderr[-2000:]
    art = json.load(open(os.path.join(REPO, "MULTIHOST_r05.json")))
    assert art["multihost"] == "ok"
    assert art["n_processes"] == 2
    assert art["max_dx_vs_single_process"] < 1e-10
