"""Pallas TPU kernels for the profiled per-kernel-overhead limiters
(SURVEY §7.2 step 2; VERDICT r4 #1 — the round-4 device traces showed the
small planarity scenes and ~40% of the wiremesh CG iteration bounded by
per-op overhead, not bandwidth or FLOPs).

Two kernel families:

* ``ericson_candidates`` — the candidate-set closest-point evaluation
  (Ericson, Real-Time Collision Detection 5.1.5; the reference's analogue
  is igl::AABB::squared_distance + its hand-fused SVD kernel precedent,
  Geometry/external/igl/Singular_Value_Decomposition_Main_Kernel_Body.hpp).
  The XLA version lowers to ~30 small fusions over (Q, K) temporaries;
  at costa2k scale that is ~2.3 ms of pure per-op overhead per ALM trial
  (PERF.md). Here the whole sweep is ONE kernel: candidates live in VMEM
  as (9, K, Q) coordinate planes (K candidates on sublanes, Q queries on
  lanes), every intermediate stays on-chip, and the first-minimum
  selection uses a cumulative-mask instead of a per-lane gather.

* ``cg_update1`` / ``cg_update2`` — the CG vector updates of the blocked
  global step (solver/linear.py pcg) fused into two kernels operating on
  "band layout": a (n, 3) CG vector viewed as (24, n/8) — a free reshape
  of its (3, n) transpose — which tiles VMEM exactly (24 = 3 x 8
  sublanes) and turns per-column dot products into 8-sublane band sums.

Pallas has no compiled CPU path, so on CPU every kernel runs in
interpreter mode — bit-accurate, used by the parity tests; the TPU build
is exercised by tools/bench_cg_pallas.py and the on-chip suite."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Ericson candidate closest point
# ---------------------------------------------------------------------------

def _ericson_kernel(p_ref, cand_ref, q_ref, d_ref):
    """cand_ref: (9, K, Qt) coordinate planes [ax ay az bx by bz cx cy cz];
    p_ref: (3, Qt); q_ref: (3, Qt) closest points; d_ref: (1, Qt) sq dist."""
    a = [cand_ref[j] for j in range(3)]          # each (K, Qt)
    b = [cand_ref[3 + j] for j in range(3)]
    c = [cand_ref[6 + j] for j in range(3)]
    p = [p_ref[j][None, :] for j in range(3)]    # (1, Qt) broadcast over K

    ab = [b[j] - a[j] for j in range(3)]
    ac = [c[j] - a[j] for j in range(3)]
    ap = [p[j] - a[j] for j in range(3)]
    bp = [p[j] - b[j] for j in range(3)]
    cp = [p[j] - c[j] for j in range(3)]

    def dot(u, v):
        return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

    d1 = dot(ab, ap)
    d2 = dot(ac, ap)
    d3 = dot(ab, bp)
    d4 = dot(ac, bp)
    d5 = dot(ab, cp)
    d6 = dot(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    def safe_div(n, d):
        return n / jnp.where(d == 0, 1.0, d)

    v_ab = jnp.clip(safe_div(d1, d1 - d3), 0.0, 1.0)
    w_ac = jnp.clip(safe_div(d2, d2 - d6), 0.0, 1.0)
    w_bc = jnp.clip(safe_div(d4 - d3, (d4 - d3) + (d5 - d6)), 0.0, 1.0)
    denom = jnp.where(va + vb + vc == 0, 1.0, va + vb + vc)
    v_in = vb / denom
    w_in = vc / denom

    q = []
    for j in range(3):
        qj = a[j] + v_in * ab[j] + w_in * ac[j]
        qj = jnp.where(on_bc, b[j] + w_bc * (c[j] - b[j]), qj)
        qj = jnp.where(on_ac, a[j] + w_ac * ac[j], qj)
        qj = jnp.where(on_ab, a[j] + v_ab * ab[j], qj)
        qj = jnp.where(in_c, c[j], qj)
        qj = jnp.where(in_b, b[j], qj)
        qj = jnp.where(in_a, a[j], qj)
        q.append(qj)

    sqd = ((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
           + (p[2] - q[2]) ** 2)                  # (K, Qt)

    dmin = jnp.min(sqd, axis=0, keepdims=True)    # (1, Qt)
    # First minimum along K (argmin parity with the XLA path). cumsum is
    # not lowerable in Pallas TPU, so the first-tie index comes from a
    # min over an iota masked to the minima.
    K = sqd.shape[0]
    # int32 iota cast to float: float iota and int min-reductions both hit
    # Mosaic legalization gaps; the float compare is exact for K < 2^24.
    kio = jax.lax.broadcasted_iota(jnp.int32, sqd.shape, 0).astype(sqd.dtype)
    kbig = jnp.full(sqd.shape, float(K), sqd.dtype)
    kmin = jnp.min(jnp.where(sqd == dmin, kio, kbig), axis=0,
                   keepdims=True)                 # (1, Qt)
    w = (kio == kmin).astype(sqd.dtype)
    for j in range(3):
        q_ref[j] = jnp.sum(q[j] * w, axis=0)
    d_ref[0] = dmin[0]


def ericson_tile(K: int, q_tile: int = 4096) -> int:
    """Query-tile width for the Ericson kernel: Mosaic stack-allocates
    every live (K, qt) temporary in VMEM (~25-30 of them) — cap K*qt so
    the scoped allocation stays well under the 16 MB limit (measured:
    K*qt=141k OOM'd at 18.5 MB)."""
    return max(128, min(q_tile, (49152 // max(K, 1)) // 128 * 128))


@functools.partial(jax.jit, static_argnames=("q_tile",))
def ericson_candidates(p, cand, q_tile: int = 4096):
    """Exact closest point over per-query candidate triangles, one fused
    kernel. Drop-in for ops.closest_point._closest_point_candidates:
    p (Q, 3), cand (Q, K, 3, 3) -> (points (Q, 3), sqdist (Q,))."""
    Q, K = cand.shape[0], cand.shape[1]
    qt = min(ericson_tile(K, q_tile), max((Q + 127) // 128 * 128, 128))
    pad = (-Q) % qt
    # (9, K, Q): coordinate planes on the major axis, candidates on
    # sublanes, queries on lanes. One XLA relayout feeding one kernel.
    candT = jnp.transpose(cand.reshape(Q, K, 9), (2, 1, 0))
    candT = jnp.pad(candT, ((0, 0), (0, 0), (0, pad)))
    pT = jnp.pad(p.T, ((0, 0), (0, pad)))
    qv, dv = ericson_candidates_T(pT, candT, qt)
    return qv[:, :Q].T, dv[0, :Q]


@functools.partial(jax.jit, static_argnames=("qt",))
def ericson_candidates_T(pT, candT, qt: int):
    """The kernel on PRE-TRANSPOSED inputs: pT (3, Qp), candT (9, K, Qp)
    with Qp a multiple of qt (see ericson_tile). Returns
    (qv (3, Qp), dv (1, Qp)). Exposed so callers that CACHE candT across
    iterations (the flat cp-cache fast path — candidates are constant
    while the cache is valid) skip the per-iteration gather + relayout
    entirely."""
    K = candT.shape[1]
    Qp = candT.shape[2]
    dt = pT.dtype

    grid = Qp // qt
    # Index maps may not capture tracers and python-int constants lowered
    # to i64 fail Mosaic legalization on this backend — derive the zero
    # from the (i32) grid index instead.
    qv, dv = pl.pallas_call(
        _ericson_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, qt), lambda i: (jnp.zeros_like(i), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, K, qt),
                         lambda i: (jnp.zeros_like(i), jnp.zeros_like(i), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, qt), lambda i: (jnp.zeros_like(i), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt), lambda i: (jnp.zeros_like(i), i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((3, Qp), dt),
                   jax.ShapeDtypeStruct((1, Qp), dt)),
        interpret=_interpret(),
    )(pT, candT)
    return qv, dv


# ---------------------------------------------------------------------------
# Fused CG vector updates (band layout)
# ---------------------------------------------------------------------------

def band_shape(n: int, c: int = 3):
    assert n % 8 == 0
    return (c * 8, n // 8)


def to_band(v):
    """(n, c) -> (c*8, n/8): the free reshape of v.T; per-column data
    occupies an 8-sublane band, so column dots become band sums."""
    n, c = v.shape
    return v.T.reshape(c * 8, n // 8)


def from_band(b, n: int, c: int = 3):
    return b.reshape(c, n).T


def _cg_k1(rz_ref, rrp_ref, th_ref, p_ref, ap_ref, x_ref, r_ref,
           xo_ref, ro_ref, stat_ref, *, c):
    # SMEM refs are scalar-access-only: rz/rrp/th/stat go per element.
    # Column i is ACTIVE while rr_prev[i] > thresh[i] (pcg freezes
    # converged columns by zeroing alpha/beta — same semantics here).
    p = p_ref[:]
    ap = ap_ref[:]
    prod = p * ap
    alphas = []
    for i in range(c):
        pAp = jnp.sum(prod[i * 8:(i + 1) * 8])
        a = rz_ref[i] / jnp.where(pAp == 0, 1.0, pAp)
        alphas.append(jnp.where(rrp_ref[i] > th_ref[i], a, 0.0))
    abro = jnp.concatenate(
        [jnp.full((8, 1), alphas[i], p.dtype) for i in range(c)], axis=0)
    xo_ref[:] = x_ref[:] + abro * p
    rn = r_ref[:] - abro * ap
    ro_ref[:] = rn
    rr = rn * rn
    for i in range(c):
        stat_ref[i] = jnp.sum(rr[i * 8:(i + 1) * 8])


def _cg_k2(rz_ref, rrp_ref, th_ref, r_ref, z_ref, p_ref, po_ref, rzo_ref,
           *, c):
    r = r_ref[:]
    z = z_ref[:]
    prod = r * z
    betas = []
    for i in range(c):
        rz_new = jnp.sum(prod[i * 8:(i + 1) * 8])
        rzo_ref[i] = rz_new
        rz_old = rz_ref[i]
        b = rz_new / jnp.where(rz_old == 0, 1.0, rz_old)
        betas.append(jnp.where(rrp_ref[i] > th_ref[i], b, 0.0))
    bbro = jnp.concatenate(
        [jnp.full((8, 1), betas[i], z.dtype) for i in range(c)], axis=0)
    po_ref[:] = z + bbro * p_ref[:]


def cg_update1(rz, p_b, ap_b, x_b, r_b, rr_prev=None, thresh=None):
    """One kernel for the post-matvec half of a CG iteration on band-layout
    vectors: pAp = p.Ap (per column), alpha = rz/pAp (0 for frozen
    columns: rr_prev <= thresh), x += alpha p, r -= alpha Ap, rr = r.r.
    Returns (x_b', r_b', rr). x/r are aliased in-place."""
    c = p_b.shape[0] // 8
    if rr_prev is None:
        rr_prev = jnp.ones((c,), x_b.dtype)
    if thresh is None:
        thresh = jnp.zeros((c,), x_b.dtype)
    return pl.pallas_call(
        functools.partial(_cg_k1, c=c),
        out_shape=(jax.ShapeDtypeStruct(x_b.shape, x_b.dtype),
                   jax.ShapeDtypeStruct(r_b.shape, r_b.dtype),
                   jax.ShapeDtypeStruct((c,), x_b.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3 +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        input_output_aliases={5: 0, 6: 1},
        interpret=_interpret(),
    )(rz, rr_prev, thresh, p_b, ap_b, x_b, r_b)


def cg_update2(rz_old, r_b, z_b, p_b, rr_prev=None, thresh=None):
    """One kernel for the post-preconditioner half: rz = r.z (per column),
    beta = rz/rz_old (0 for frozen columns), p = z + beta p.
    Returns (p_b', rz). p is aliased."""
    c = p_b.shape[0] // 8
    if rr_prev is None:
        rr_prev = jnp.ones((c,), p_b.dtype)
    if thresh is None:
        thresh = jnp.zeros((c,), p_b.dtype)
    return pl.pallas_call(
        functools.partial(_cg_k2, c=c),
        out_shape=(jax.ShapeDtypeStruct(p_b.shape, p_b.dtype),
                   jax.ShapeDtypeStruct((c,), p_b.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3 +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        input_output_aliases={5: 0},
        interpret=_interpret(),
    )(rz_old, rr_prev, thresh, r_b, z_b, p_b)
