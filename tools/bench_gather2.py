"""Follow-up: unchunked (no lax.map) cp fast-path variants on the TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def tsync(x):
    return jax.device_get(jnp.ravel(x)[0])


def timeit(fn, *args, n=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    tsync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    tsync(out)
    return (time.perf_counter() - t0) / n


def main():
    print("backend:", jax.default_backend(), flush=True)
    from aa_admm_tpu.ops.closest_point import _closest_point_candidates

    rng = np.random.default_rng(0)
    Q = 56 * 4096
    T = 40756
    K = 64
    tris = rng.standard_normal((T, 3, 3)).astype(np.float32)
    p = jnp.asarray(rng.standard_normal((Q, 3)).astype(np.float32))
    dense = jnp.asarray(
        rng.standard_normal((Q, K, 3, 3)).astype(np.float32))

    @jax.jit
    def ericson_flat(p, dense):
        q, _ = _closest_point_candidates(p, dense)
        return q

    dt = timeit(ericson_flat, p, dense)
    print(f"ericson-only UNCHUNKED (resident {Q}x{K}): {dt*1e3:.1f} ms",
          flush=True)

    for sub in [8, 16, 32]:
        ng = K // sub
        Tsub = T // sub
        tri_sub = jnp.asarray(tris[: Tsub * sub].reshape(Tsub, sub, 3, 3))
        gidx = jnp.asarray(
            rng.integers(0, Tsub, size=(Q, ng)).astype(np.int32))

        @jax.jit
        def fast(p, gidx):
            cand = tri_sub[gidx].reshape(Q, ng * sub, 3, 3)
            q, _ = _closest_point_candidates(p, cand)
            return q

        dt_r = timeit(fast, p, gidx)
        vol = Q * K * 36 / 1e9
        print(f"UNCHUNKED sub={sub:3d} ng={ng}: {dt_r*1e3:7.1f} ms "
              f"({vol/dt_r:.1f} GB/s equivalent)", flush=True)

    # gather alone (no ericson), sub=8
    sub, ng = 8, 8
    Tsub = T // sub
    tri_sub = jnp.asarray(tris[: Tsub * sub].reshape(Tsub, sub, 3, 3))
    gidx = jnp.asarray(rng.integers(0, Tsub, size=(Q, ng)).astype(np.int32))

    @jax.jit
    def gather_only(gidx):
        return jnp.sum(tri_sub[gidx], axis=(1, 2, 3))

    dt = timeit(gather_only, gidx)
    print(f"gather-only sub=8 ng=8: {dt*1e3:.1f} ms "
          f"({Q*K*36/1e9/dt:.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
