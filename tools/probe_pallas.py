"""Probe: does Pallas compile + run on the tunneled axon TPU backend?

Runs three probes of increasing complexity:
  1. trivial elementwise kernel
  2. a fused axpy+dot kernel (the CG-iteration shape)
  3. a multi-step fori_loop kernel (megakernel shape)
Prints timings with value-fetch syncing (block_until_ready does not sync
on axon).
"""
import time
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

print("devices:", jax.devices())


def fetch(x):
    return float(jax.device_get(jnp.sum(x)))


# ---- probe 1: trivial ----
def k1(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0


@jax.jit
def p1(x):
    return pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


x = jnp.ones((1024, 128), jnp.float32)
t0 = time.time()
try:
    r = p1(x)
    s = fetch(r)
    print(f"probe1 trivial: OK sum={s} compile+run {time.time()-t0:.1f}s")
except Exception as e:
    print(f"probe1 trivial: FAIL {type(e).__name__}: {e}")
    sys.exit(1)


# ---- probe 2: fused CG-ish vector ops (axpy + dots in one kernel) ----
def k2(x_ref, r_ref, p_ref, ap_ref, alpha_ref, out_x, out_r, out_rr):
    a = alpha_ref[0]
    xx = x_ref[:] + a * p_ref[:]
    rr = r_ref[:] - a * ap_ref[:]
    out_x[:] = xx
    out_r[:] = rr
    out_rr[0, 0] = jnp.sum(rr * rr)


@jax.jit
def p2(x, r, p, ap, alpha):
    return pl.pallas_call(
        k2,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, 1), x.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )(x, r, p, ap, alpha)


n = 230400  # wiremesh vertex count
big = jnp.ones((n, 3), jnp.float32)
alpha = jnp.ones((1,), jnp.float32) * 0.5
t0 = time.time()
try:
    xo, ro, rro = p2(big, big, big, big, alpha)
    s = fetch(xo) + fetch(rro)
    print(f"probe2 fused-axpy (230400,3): OK {time.time()-t0:.1f}s")
    # timing loop
    t0 = time.time()
    N = 20
    for _ in range(N):
        xo, ro, rro = p2(xo, ro, big, big, alpha)
    fetch(rro)
    print(f"probe2 timing: {(time.time()-t0)/N*1000:.2f} ms/call")
except Exception as e:
    print(f"probe2 fused-axpy: FAIL {type(e).__name__}: {e}")


# ---- probe 3: fori_loop inside a kernel (megakernel shape) ----
def k3(x_ref, o_ref):
    def body(i, acc):
        return acc * 1.0001 + x_ref[:] * 0.001

    o_ref[:] = jax.lax.fori_loop(0, 50, body, x_ref[:])


@jax.jit
def p3(x):
    return pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


t0 = time.time()
try:
    r3 = p3(jnp.ones((2944, 128), jnp.float32))  # costa2k-ish size
    fetch(r3)
    print(f"probe3 fori-megakernel: OK {time.time()-t0:.1f}s")
except Exception as e:
    print(f"probe3 fori-megakernel: FAIL {type(e).__name__}: {e}")


# ---- probe 4: MXU matmul inside kernel ----
def k4(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)


@jax.jit
def p4(a, b):
    return pl.pallas_call(
        k4,
        out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[1]), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


t0 = time.time()
try:
    r4 = p4(jnp.ones((256, 512), jnp.float32), jnp.ones((512, 256), jnp.float32))
    fetch(r4)
    print(f"probe4 mxu-dot: OK {time.time()-t0:.1f}s")
except Exception as e:
    print(f"probe4 mxu-dot: FAIL {type(e).__name__}: {e}")

print("probe complete")
