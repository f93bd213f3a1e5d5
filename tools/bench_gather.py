"""Gather-bandwidth microbench on the real TPU: candidate-block gathers
for the cp-cache fast path, by subgroup row size, plus the Ericson-only
floor on resident data. Picks (sub_size, NG) for RefSurfaceBatch."""

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
    Q = 56 * 4096              # ~230k queries, divisible by the chunk size
    T = 40756
    K = 64                      # candidate triangles per query
    tris = rng.standard_normal((T, 3, 3)).astype(np.float32)
    p = jnp.asarray(rng.standard_normal((Q, 3)).astype(np.float32))

    # Ericson floor: resident dense (qt, K, 3, 3) per chunk via lax.map.
    qt = 4096
    nq = Q // qt
    pq = jnp.asarray(np.asarray(p).reshape(nq, qt, 3))
    dense = jnp.asarray(
        rng.standard_normal((nq, qt, K, 3, 3)).astype(np.float32))

    @jax.jit
    def ericson_only(pq, dense):
        def chunk(args):
            pc, cnd = args
            q, _ = _closest_point_candidates(pc, cnd)
            return q
        return jax.lax.map(chunk, (pq, dense))

    dt = timeit(ericson_only, pq, dense)
    print(f"ericson-only (resident, {Q}x{K}): {dt*1e3:.1f} ms", flush=True)

    for sub in [8, 16, 32, 64]:
        ng = K // sub
        Tsub = T // sub
        tri_sub = jnp.asarray(tris[: Tsub * sub].reshape(Tsub, sub, 3, 3))
        gidx = jnp.asarray(
            rng.integers(0, Tsub, size=(nq, qt, ng)).astype(np.int32))
        # spatially-coherent variant: neighboring queries share subgroups
        base = (np.arange(Q) * Tsub // Q)[:, None]
        gidx_coh = jnp.asarray(((base + rng.integers(0, ng + 1,
                                                     size=(Q, ng)))
                                % Tsub).astype(np.int32)
                               .reshape(nq, qt, ng))

        @jax.jit
        def fast(pq, gidx):
            def chunk(args):
                pc, gc = args
                cand = tri_sub[gc].reshape(qt, ng * sub, 3, 3)
                q, _ = _closest_point_candidates(pc, cand)
                return q
            return jax.lax.map(chunk, (pq, gidx))

        dt_r = timeit(fast, pq, gidx)
        dt_c = timeit(fast, pq, gidx_coh)
        vol = Q * K * 36 / 1e9
        print(f"sub={sub:3d} ng={ng}: random {dt_r*1e3:7.1f} ms "
              f"({vol/dt_r:.1f} GB/s)  coherent {dt_c*1e3:7.1f} ms "
              f"({vol/dt_c:.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
