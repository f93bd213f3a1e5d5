"""On-chip measurement for the Pallas CG fusion design (VERDICT r5 task 1a).

Synthetic arrays at exact wiremesh shapes (n_pad=230400, B=16, deg=9,
c=3, nc=6000). Variants, each a jitted fori_loop of NITER CG iterations,
timed with value-fetch syncing:

  xla        — the current pcg body (BSR matvec + 2-level precond + XLA
               vector ops)
  mvp        — matvec+precond only (the known-at-roof part)
  pallas     — same CG body with the vector ops fused into two Pallas
               kernels operating on band-layout (24, 28800) carries,
               transposes at the operator boundaries
  transpose  — cost of 2 transposes per iteration alone
  spill      — cost of the spill gather+scatter alone
"""
import os
import time
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB, B, DEG, C, NC = 14400, 16, 9, 3, 6000
N = NB * B          # 230400
NITER = 15
BANDS = (C * 8, N // 8)   # (24, 691200/24=28800)

rng = np.random.default_rng(0)

# Pallas has no compiled CPU backend — tests/CPU runs use interpret mode.
INTERPRET = jax.default_backend() == "cpu"



def fetch(x):
    return float(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(x)[0])))


def make_problem():
    nbr = rng.integers(0, NB, (NB, DEG)).astype(np.int32)
    nbr[:, 0] = np.arange(NB)
    a_loc = rng.standard_normal((NB, B, DEG * B)).astype(np.float32) * 0.01
    a_loc[:, :, :B] += np.eye(B, dtype=np.float32)[None] * 4.0
    E = 60000
    spill_rows = rng.integers(0, N, E).astype(np.int32)
    spill_cols = rng.integers(0, N, E).astype(np.int32)
    spill_vals = rng.standard_normal(E).astype(np.float32) * 0.001
    agg = np.sort(rng.integers(0, NC, N)).astype(np.int32)
    Ac_inv = rng.standard_normal((NC, NC)).astype(np.float32) * 0.001
    inv_diag = (1.0 / (4.0 + rng.random(N))).astype(np.float32)
    rhs = rng.standard_normal((N, C)).astype(np.float32)
    return dict(nbr=jnp.asarray(nbr), a_loc=jnp.asarray(a_loc),
                spill_rows=jnp.asarray(spill_rows),
                spill_cols=jnp.asarray(spill_cols),
                spill_vals=jnp.asarray(spill_vals),
                agg=jnp.asarray(agg), Ac_inv=jnp.asarray(Ac_inv),
                inv_diag=jnp.asarray(inv_diag), rhs=jnp.asarray(rhs))


def matvec(P, vp):
    vb = vp.reshape(NB, B, C)
    neigh = vb[P["nbr"]].reshape(NB, -1, C)
    out = jnp.einsum("nbd,ndc->nbc", P["a_loc"], neigh).reshape(NB * B, C)
    return out.at[P["spill_rows"]].add(
        P["spill_vals"][:, None] * vp[P["spill_cols"]])


def matvec_nospill(P, vp):
    vb = vp.reshape(NB, B, C)
    neigh = vb[P["nbr"]].reshape(NB, -1, C)
    return jnp.einsum("nbd,ndc->nbc", P["a_loc"], neigh).reshape(NB * B, C)


def precond(P, r):
    rc = jax.ops.segment_sum(r, P["agg"], num_segments=NC)
    yc = P["Ac_inv"] @ rc
    return P["inv_diag"][:, None] * r + yc[P["agg"]]


# ---------------- current XLA body ----------------
@partial(jax.jit, static_argnames=("spill",))
def run_xla(P, spill=True):
    mv = matvec if spill else matvec_nospill
    rhs = P["rhs"]
    x = jnp.zeros_like(rhs)
    r = rhs
    z = precond(P, r)
    p = z
    s = jnp.sum(jnp.stack([r * z, r * r]), axis=1)
    rz, rr = s[0], s[1]

    def body(i, carry):
        x, r, p, rz, rr = carry
        Ap = mv(P, p)
        pAp = jnp.sum(p * Ap, axis=0)
        alpha = rz / pAp
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * Ap
        z = precond(P, r)
        s = jnp.sum(jnp.stack([r * z, r * r]), axis=1)
        rz_new, rr_new = s[0], s[1]
        beta = rz_new / rz
        p = z + beta[None, :] * p
        return x, r, p, rz_new, rr_new

    x, r, p, rz, rr = jax.lax.fori_loop(0, NITER, body,
                                        (x, r, p, rz, rr))
    return x, rr


# ---------------- matvec+precond only ----------------
@jax.jit
def run_mvp(P):
    rhs = P["rhs"]

    def body(i, v):
        return precond(P, matvec(P, v)) * 0.25

    return jax.lax.fori_loop(0, NITER, body, rhs)


# ---------------- transpose cost ----------------
@jax.jit
def run_transpose(P):
    rhs = P["rhs"]

    def body(i, v):
        b = v.T.reshape(BANDS)                  # (n,3) -> band
        v2 = b.reshape(C, N).T                  # band -> (n,3)
        return v2 * 0.999 + 1e-6

    return jax.lax.fori_loop(0, NITER, body, rhs)


# ---------------- spill cost ----------------
@jax.jit
def run_spill(P):
    rhs = P["rhs"]

    def body(i, v):
        out = v.at[P["spill_rows"]].add(
            P["spill_vals"][:, None] * v[P["spill_cols"]])
        return out * 0.999

    return jax.lax.fori_loop(0, NITER, body, rhs)


# ---------------- pallas kernels (library) ----------------
from aa_admm_tpu.ops.pallas_kernels import cg_update1 as pallas_k1_lib, \
    cg_update2 as pallas_k2_lib


def pallas_k1(rz, p, ap, x, r):
    return pallas_k1_lib(rz, p, ap, x, r)


def pallas_k2(rz, r, z, p):
    return pallas_k2_lib(rz, r, z, p)


def to_band(v):        # (n, 3) -> (24, 28800)
    return v.T.reshape(BANDS)


def from_band(b):      # (24, 28800) -> (n, 3)
    return b.reshape(C, N).T


@jax.jit
def run_pallas(P):
    rhs = P["rhs"]
    x = jnp.zeros_like(rhs)
    r = rhs
    z = precond(P, r)
    p = z
    s = jnp.sum(jnp.stack([r * z, r * r]), axis=1)
    rz = s[0]
    xb, rb, pb = to_band(x), to_band(r), to_band(p)

    def body(i, carry):
        xb, rb, pb, rz = carry
        Ap = matvec(P, from_band(pb))
        xb, rb, rr = pallas_k1(rz, pb, to_band(Ap), xb, rb)
        z = precond(P, from_band(rb))
        pb, rz_new = pallas_k2(rz, rb, to_band(z), pb)
        return xb, rb, pb, rz_new

    xb, rb, pb, rz = jax.lax.fori_loop(0, NITER, body, (xb, rb, pb, rz))
    return from_band(xb), rz


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:12s} {dt*1000:8.2f} ms/loop  "
          f"{dt*1000/NITER:6.3f} ms/CG-iter", flush=True)
    return dt


if __name__ == "__main__":
    P = make_problem()
    print(f"n={N} nb={NB} deg={DEG} nc={NC} NITER={NITER}", flush=True)
    # numeric cross-check pallas vs xla
    x1, rr1 = run_xla(P)
    x2, rr2 = run_pallas(P)
    err = float(jnp.max(jnp.abs(x1 - x2)) / jnp.max(jnp.abs(x1)))
    print("pallas-vs-xla rel err:", err, flush=True)
    t_xla = timeit("xla", run_xla, P)
    t_mvp = timeit("mvp-only", run_mvp, P)
    t_pal = timeit("pallas", run_pallas, P)
    t_tr = timeit("transpose", run_transpose, P)
    t_sp = timeit("spill", run_spill, P)
    t_xla_ns = timeit("xla-nospill", lambda P: run_xla(P, spill=False), P)
    print(f"vector-op cost (xla - mvp): "
          f"{(t_xla-t_mvp)*1000/NITER:.3f} ms/iter", flush=True)
    print(f"vector-op cost (pallas - mvp): "
          f"{(t_pal-t_mvp)*1000/NITER:.3f} ms/iter", flush=True)
