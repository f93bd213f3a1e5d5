"""On-chip bench: fused Pallas Ericson sweep vs the XLA op chain.

Shapes: costa2k flat-cache fast path (Q=2944, K=48, T=5886) and a
wiremesh fast-path tile (Q=32768, K=96 gathered candidates). Each variant
runs the gather + sweep NITER times inside one jitted fori_loop (in-graph,
like the solver), timed with value-fetch syncing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import sys as _s2
_s2.setrecursionlimit(100000)
import jax
import jax.numpy as jnp

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from aa_admm_tpu.ops.closest_point import _closest_point_candidates
from aa_admm_tpu.ops.pallas_kernels import ericson_candidates

NITER = 20
rng = np.random.default_rng(0)


def fetch(x):
    return float(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(x)[0])))


def bench_case(name, Q, K, T, q_tile):
    tri = jnp.asarray(rng.standard_normal((T, 3, 3)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((Q, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, T, (Q, K)), jnp.int32)

    @jax.jit
    def run_xla(p):
        def body(i, carry):
            q, _ = _closest_point_candidates(carry, tri[idx])
            return carry * 0.999 + q * 0.001
        return jax.lax.fori_loop(0, NITER, body, p)

    @jax.jit
    def run_pal(p):
        def body(i, carry):
            q, _ = ericson_candidates(carry, tri[idx], q_tile=q_tile)
            return carry * 0.999 + q * 0.001
        return jax.lax.fori_loop(0, NITER, body, p)

    @jax.jit
    def run_gather_only(p):
        def body(i, carry):
            cand = tri[idx]
            return carry * 0.999 + cand[:, 0, 0] * 0.001
        return jax.lax.fori_loop(0, NITER, body, p)

    # parity first
    q1, d1 = _closest_point_candidates(p, tri[idx])
    q2, d2 = ericson_candidates(p, tri[idx], q_tile=q_tile)
    err = float(jnp.max(jnp.abs(q1 - q2)))
    derr = float(jnp.max(jnp.abs(d1 - d2)))
    print(f"{name}: parity max|dq|={err:.2e} max|dd|={derr:.2e}", flush=True)

    for label, fn in [("xla", run_xla), ("pallas", run_pal),
                      ("gather", run_gather_only)]:
        out = fn(p)
        fetch(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(p)
        fetch(out)
        dt = (time.perf_counter() - t0) / reps / NITER
        print(f"  {name}/{label:7s} {dt*1000:7.3f} ms/sweep", flush=True)


if __name__ == "__main__":
    bench_case("costa2k", 2944, 48, 5886, 4096)
    bench_case("wiretile", 32768, 96, 40000, 8192)
