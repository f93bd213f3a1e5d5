"""Microbench: segment_sum layouts for the physics D^T scatter on the chip.

Compares, at plinkohit tet scale and windyflag tri scale:
  a) segment_sum((R,3) rows, ids)        — the (·,3) scatter-add in use
  b) 3x segment_sum((R,) planes, ids)    — per-coordinate 1-D scatters
  c) one-hot matmul (R,3)^T @ P(R,n)     — MXU segment sum (dense one-hot)
Each timed over a lax.fori of 50 applications to amortize dispatch
(~1.5 ms/dispatch on the tunneled backend, see CLAUDE.md).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50):
    f = jax.jit(lambda *a: jax.lax.fori_loop(
        0, iters, lambda i, acc: acc + fn(*a).sum(), jnp.float32(0.0)))
    f(*args)
    _ = jax.device_get(f(*args))
    t0 = time.perf_counter()
    _ = jax.device_get(f(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt


def main():
    rng = np.random.default_rng(0)
    for name, E, n, vpe in (("plinko-tets", 3221, 962, 4),
                            ("windy-tris", 6624, 3450, 3),
                            ("beams-tets", 8000, 3000, 4)):
        R = E * vpe
        ids = jnp.asarray(rng.integers(0, n, size=R).astype(np.int32))
        rows = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
        planes = rows.T.copy()

        a = timeit(lambda r: jax.ops.segment_sum(r, ids, num_segments=n), rows)
        b = timeit(lambda p: jnp.stack(
            [jax.ops.segment_sum(p[i], ids, num_segments=n)
             for i in range(3)], -1), planes)
        # one-hot matmul variant: segment matrix as f32 one-hot (R, n)
        onehot = (ids[:, None] == jnp.arange(n)[None, :]).astype(jnp.float32)
        c = timeit(lambda r, o: r.T @ o, rows, onehot)
        print(f"{name}: rows(a)={a:.3f} ms  planes(b)={b:.3f} ms  "
              f"matmul(c)={c:.3f} ms   (R={R}, n={n})")


if __name__ == "__main__":
    main()
