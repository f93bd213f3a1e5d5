"""Batched point-to-triangle-mesh closest-point queries on device.

Replaces the reference's igl::AABB tree traversals
(Geometry/TriMeshAABB.h:38-77; igl::AABB::squared_distance used by
ReferenceSurfceConstraint, Geometry/Constraint.h:377-383) with a tiled
brute-force distance computation: every (point, triangle) pair is evaluated
with the classic Ericson closest-point-on-triangle algorithm expressed
branch-free, tiled over triangles to bound memory. On TPU this turns an
irregular tree traversal into dense VPU arithmetic; for the reference's scene
sizes (<=60k queries x ~100k triangles) this is well within budget.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def closest_point_on_triangles(p, tri_verts):
    """Closest point on each triangle to each query point.

    p: (P, 3) query points. tri_verts: (T, 3, 3) triangle corners.
    Returns (points (P, T, 3), sqdist (P, T)).
    """
    a = tri_verts[:, 0][None]  # (1, T, 3)
    b = tri_verts[:, 1][None]
    c = tri_verts[:, 2][None]
    pq = p[:, None, :]         # (P, 1, 3)

    ab = b - a
    ac = c - a
    ap = pq - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = pq - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = pq - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # Region tests (Ericson, Real-Time Collision Detection 5.1.5), branch-free.
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

    q_in = a + v_in[..., None] * ab + w_in[..., None] * ac
    q_a = jnp.broadcast_to(a, q_in.shape)
    q_b = jnp.broadcast_to(b, q_in.shape)
    q_c = jnp.broadcast_to(c, q_in.shape)
    q_ab = a + v_ab[..., None] * ab
    q_ac = a + w_ac[..., None] * ac
    q_bc = b + w_bc[..., None] * (c - b)

    q = q_in
    q = jnp.where(on_bc[..., None], q_bc, q)
    q = jnp.where(on_ac[..., None], q_ac, q)
    q = jnp.where(on_ab[..., None], q_ab, q)
    q = jnp.where(in_c[..., None], q_c, q)
    q = jnp.where(in_b[..., None], q_b, q)
    q = jnp.where(in_a[..., None], q_a, q)

    sqd = jnp.sum((pq - q) ** 2, -1)
    return q, sqd


@partial(jax.jit, static_argnames=("tile", "query_tile"))
def closest_point_on_mesh(p, tri_verts, tile: int = 1024,
                          query_tile: int = 8192):
    """Closest surface point for each query: (P, 3), (T, 3, 3) -> (P, 3).

    Doubly tiled: an outer ``lax.map`` over query chunks and an inner scan
    over triangle chunks bound peak memory at O(query_tile * tile) while the
    full P x T sweep stays dense VPU arithmetic."""
    tri_verts = tri_verts.astype(p.dtype)
    T = tri_verts.shape[0]
    P = p.shape[0]
    pad_t = (-T) % tile
    tv = jnp.pad(tri_verts, ((0, pad_t), (0, 0), (0, 0)),
                 constant_values=jnp.inf)
    tv = tv.reshape(-1, tile, 3, 3)

    qt = min(query_tile, max(P, 1))
    pad_q = (-P) % qt
    pq = jnp.pad(p, ((0, pad_q), (0, 0)))
    pq = pq.reshape(-1, qt, 3)

    def per_query_chunk(pc):
        def body(carry, chunk):
            best_d, best_q = carry
            # inf-padded triangles produce inf distances; sanitize coords
            chunk_ok = jnp.isfinite(chunk[:, 0, 0])
            chunk_s = jnp.where(jnp.isfinite(chunk), chunk, 0.0)
            q, sqd = closest_point_on_triangles(pc, chunk_s)
            sqd = jnp.where(chunk_ok[None, :], sqd, jnp.inf)
            i = jnp.argmin(sqd, axis=1)
            d = jnp.take_along_axis(sqd, i[:, None], axis=1)[:, 0]
            qi = jnp.take_along_axis(q, i[:, None, None], axis=1)[:, 0]
            better = d < best_d
            return (jnp.where(better, d, best_d),
                    jnp.where(better[:, None], qi, best_q)), None

        init = (jnp.full((pc.shape[0],), jnp.inf, pc.dtype),
                jnp.zeros_like(pc))
        (_, best_q), _ = jax.lax.scan(body, init, tv)
        return best_q

    out = jax.lax.map(per_query_chunk, pq)
    return out.reshape(-1, 3)[:P]


@partial(jax.jit, static_argnames=("k", "query_tile"))
def closest_point_on_mesh_2stage(p, tri_verts, k: int = 48,
                                 query_tile: int = 4096):
    """Coarse-to-fine closest point for LARGE reference meshes.

    Stage 1 rides the MXU: squared distances to all triangle *centroids* via
    one (Q,3)x(3,T) matmul per query chunk, turned into a conservative lower
    bound ``max(0, |p-c| - r)`` with r the triangle circumradius-from-
    centroid; ``lax.top_k`` keeps the k best candidates. Stage 2 runs the
    exact Ericson test on only Q*k triangle pairs. With k ~ 48 this is exact
    for reasonably uniform meshes (validated against brute force in tests)
    and turns an O(Q*T) VPU sweep into an O(Q*T/3) MXU matmul + O(Q*k) VPU
    work — the difference between ~minutes and ~100ms per projection at the
    WireMeshOpt scale (230k queries x 40k triangles)."""
    tri_verts = tri_verts.astype(p.dtype)
    T = tri_verts.shape[0]
    P = p.shape[0]
    cent = jnp.mean(tri_verts, axis=1)                      # (T, 3)
    rad = jnp.sqrt(jnp.max(jnp.sum(
        (tri_verts - cent[:, None, :]) ** 2, axis=-1), axis=1))  # (T,)
    # Center the coarse phase: the |p|^2 - 2 p.c + |c|^2 expansion loses
    # ~eps * max|coord|^2 absolutely, so meshes with coordinates ~1e2-1e3
    # (MaleTorso spans +-650) would corrupt the candidate ranking in f32.
    # After centering the error is ~eps * extent^2, far below the rad slack.
    c0 = jnp.mean(cent, axis=0)
    cent = cent - c0
    c2 = jnp.sum(cent * cent, axis=-1)                      # (T,)

    qt = min(query_tile, max(P, 1))
    pad_q = (-P) % qt
    pq = jnp.pad(p, ((0, pad_q), (0, 0)))
    pq = pq.reshape(-1, qt, 3)

    def per_chunk(pc):
        pcc = pc - c0
        d2c = (jnp.sum(pcc * pcc, axis=-1, keepdims=True)
               - 2.0 * pcc @ cent.T + c2[None, :])          # (q, T) MXU
        dist_c = jnp.sqrt(jnp.maximum(d2c, 0.0))
        lower = jnp.maximum(dist_c - rad[None, :], 0.0)
        # approx_min_k is the TPU-native ANN primitive (PartialReduce,
        # arXiv:2206.14286) — a full sort-based top_k over T~40k columns
        # costs seconds per call at this scale. Recall loss affects
        # borderline ranks near k, not the smallest bounds, and stage 2
        # takes the exact argmin over the k candidates. recall_target=0.9999
        # guards the tied-at-zero case where a query sits inside many
        # bounding spheres. Residual approximation, measured on the real
        # chip (tests_tpu/test_closest_point_tpu.py; the CPU lowering is an
        # exact sort and cannot catch recall misses): queries NEAR the
        # surface — the solver regime, vertices converging onto the
        # reference — are exact vs brute force; for far-field queries
        # (tens of edge lengths off-surface, where many clamped-zero
        # bounds tie) ~1% of queries can land on a triangle up to a few
        # percent farther than the true nearest.
        _, idx = jax.lax.approx_min_k(lower, k, recall_target=0.9999)  # (q, k)
        cand = tri_verts[idx]                               # (q, k, 3, 3)
        q, sqd = _closest_point_candidates(pc, cand)
        return q

    out = jax.lax.map(per_chunk, pq)
    return out.reshape(-1, 3)[:P]


def build_tri_groups(tri_verts_np, group_size: int = 64):
    """Host-side spatial grouping of a static triangle soup (Morton order)
    for the hierarchical refresh: triangles sorted by the Z-order code of
    their centroid and cut into contiguous groups of `group_size`, each
    with an enclosing (center, radius) bound.

    Returns (tri_perm (Tp,3,3), tri_cent (Tp,3), tri_rad (Tp,),
    gcenter (G,3), gradius (G,)) with Tp = G*group_size; padded slots hold
    far-away dummies (1e15) so distance tests exclude them naturally."""
    import numpy as np
    tv = np.asarray(tri_verts_np, np.float64)
    T = tv.shape[0]
    cent = tv.mean(1)
    rad = np.sqrt(((tv - cent[:, None, :]) ** 2).sum(-1).max(1))
    lo, hi = cent.min(0), cent.max(0)
    q = np.clip((cent - lo) / np.maximum(hi - lo, 1e-30) * 1023.0,
                0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 32)) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << 16)) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << 8)) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << 4)) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << 2)) & np.uint64(0x1249249249249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    perm = np.argsort(code, kind="stable")
    G = -(-T // group_size)
    Tp = G * group_size
    FAR = 1e15
    tri_p = np.full((Tp, 3, 3), FAR, tv.dtype)
    cent_p = np.full((Tp, 3), FAR, tv.dtype)
    rad_p = np.zeros((Tp,), tv.dtype)
    tri_p[:T] = tv[perm]
    cent_p[:T] = cent[perm]
    rad_p[:T] = rad[perm]
    cg = cent_p.reshape(G, group_size, 3)
    valid = np.zeros((Tp,), bool)
    valid[:T] = True
    vg = valid.reshape(G, group_size)
    nval = np.maximum(vg.sum(1), 1)[:, None]
    gcenter = np.where(vg[..., None], cg, 0.0).sum(1) / nval
    d = np.sqrt(((cg - gcenter[:, None, :]) ** 2).sum(-1)) \
        + rad_p.reshape(G, group_size)
    gradius = np.where(vg, d, 0.0).max(1)
    # Empty-pad groups: push their center far out so stage 0 never picks them.
    gcenter = np.where(vg.any(1)[:, None], gcenter, FAR)
    return tri_p, cent_p, rad_p, gcenter, gradius


class CPCache(NamedTuple):
    """Movement-bounded candidate cache for iterative closest-point queries.

    Queried repeatedly with slowly-moving points (the ADMM z-update asks for
    the same vertices' projections every iteration), the expensive part of
    the 2-stage query — the (Q, T) lower-bound matrix + top-k, ~20ms/iter at
    costa2k scale and HBM-prohibitive at wiremesh scale — can be hoisted out
    of the loop: candidates chosen at p0 remain provably exact while
    ``2 * |p - p0| < slack`` with ``slack = (smallest lower bound among
    EXCLUDED candidates at p0) - (true nearest distance at p0)``: any
    excluded triangle is at least ``bound - |p-p0|`` away while the cached
    best is at most ``best + |p-p0|`` away. When any query violates its
    bound, the whole batch refreshes in-loop via lax.cond."""

    idx: jnp.ndarray     # (Q, K) int32 candidate triangle ids
    p0: jnp.ndarray      # (Q, 3)  query positions at cache time
    slack: jnp.ndarray   # (Q,)    validity margin (-inf forces refresh)
    # Optional pre-transposed candidate COORDINATES (9, K, Qp) for the
    # Pallas fast path: while the cache is valid the candidates are
    # constant, so caching them in kernel layout removes the
    # per-iteration gather + relayout (the two largest remaining items
    # of the small-scene trace, ~0.9 ms/trial at costa2k — PERF.md r5).
    # Only armed for small flat caches (Q*K bounded; the wiremesh-scale
    # equivalent was the r4 compile-OOM'd coordinate cache).
    candT: Optional[jnp.ndarray] = None


class CPCacheGroup(NamedTuple):
    """Group-granular candidate cache (large reference meshes).

    Candidates are whole Morton groups of S triangles: the fast path then
    gathers (NG, S, 3, 3) blocks — S*36-byte rows, the measured sweet spot
    of this backend's gather unit (~75 GB/s vs ~3 GB/s for per-triangle
    36-byte rows; CLAUDE.md) — instead of Q*K scattered triangles. The
    cache itself is (Q, NG) int32 (tiny), so the solver's while_loop carry
    stays small (a cached-coordinates variant was compile-time OOM at
    wiremesh scale: 400 MB buffers copy-amplified across the accept/reject
    cond). Exactness: the true nearest triangle lies in the selected groups
    while ``2 * |p - p0| < slack``, with slack = (lower bound of the best
    EXCLUDED group at p0) - (nearest distance at p0) — both from an exact
    top-k over the group bounds."""

    gidx: jnp.ndarray    # (Q, NG) int32 candidate group ids
    p0: jnp.ndarray      # (Q, 3)
    slack: jnp.ndarray   # (Q,)


def cp_cache_init(n_queries: int, k: int, dtype,
                  with_candT: bool = False) -> CPCache:
    candT = None
    if with_candT:
        from .pallas_kernels import ericson_tile
        qt = min(ericson_tile(k), max(-(-n_queries // 128) * 128, 128))
        qp = n_queries + (-n_queries) % qt
        candT = jnp.zeros((9, k, qp), dtype)
    return CPCache(idx=jnp.zeros((n_queries, k), jnp.int32),
                   p0=jnp.zeros((n_queries, 3), dtype),
                   slack=jnp.full((n_queries,), -jnp.inf, dtype),
                   candT=candT)


def cp_cache_group_init(n_queries: int, n_groups: int, dtype) -> CPCacheGroup:
    return CPCacheGroup(gidx=jnp.zeros((n_queries, n_groups), jnp.int32),
                        p0=jnp.zeros((n_queries, 3), dtype),
                        slack=jnp.full((n_queries,), -jnp.inf, dtype))


def _cp_refresh(p, tri_verts, k: int, query_tile: int,
                with_candT: bool = False):
    """Full 2-stage query + fresh cache (idx, p0=p, slack).

    The cache keeps the k nearest candidates by EXACT distance out of a
    2k lower-bound prefilter, and the slack is
    ``min((k+1)-th exact distance, 2k-th lower bound) - d_true`` — both
    terms bound the best possible excluded triangle. Using exact
    distances here matters: a bound-only slack goes to ZERO for
    on-surface queries (dozens of triangle bounding spheres contain the
    point), and one chronically-zero query forces the whole batch to
    refresh every iteration (measured: airport3k at 22 ms/iter vs 5 ms
    — its vertices start on the reference surface)."""
    T = tri_verts.shape[0]
    P = p.shape[0]
    k2 = min(2 * k, T)
    cent = jnp.mean(tri_verts, axis=1)
    rad = jnp.sqrt(jnp.max(jnp.sum(
        (tri_verts - cent[:, None, :]) ** 2, axis=-1), axis=1))
    c0 = jnp.mean(cent, axis=0)
    cent = cent - c0
    c2 = jnp.sum(cent * cent, axis=-1)

    qt = min(query_tile, max(P, 1))
    pad_q = (-P) % qt
    pq = jnp.pad(p, ((0, pad_q), (0, 0)))
    pq = pq.reshape(-1, qt, 3)

    def per_chunk(pc):
        pcc = pc - c0
        d2c = (jnp.sum(pcc * pcc, axis=-1, keepdims=True)
               - 2.0 * pcc @ cent.T + c2[None, :])
        dist_c = jnp.sqrt(jnp.maximum(d2c, 0.0))
        lower = jnp.maximum(dist_c - rad[None, :], 0.0)
        # approx_min_k recall misses can overstate the rest-of-mesh bound
        # marginally — same approximation the plain 2-stage path carries,
        # pinned by the accuracy tests (incl. the TPU-gated run).
        vals, idx2 = jax.lax.approx_min_k(lower, k2, recall_target=0.9999)
        cand = tri_verts[idx2]
        qk, sqd = _closest_point_candidates_all(pc, cand)   # (q, k2, ...)
        d = jnp.sqrt(sqd)
        negd, j = jax.lax.top_k(-d, k + 1)                  # ascending dist
        idx = jnp.take_along_axis(idx2, j[:, :k], axis=1)   # exact top-k
        q = jnp.take_along_axis(qk, j[:, :1, None], axis=1)[:, 0]
        d_best = -negd[:, 0]
        excl = jnp.minimum(-negd[:, k], jnp.max(vals, axis=1))
        return q, idx, excl - d_best

    if pq.shape[0] == 1:
        q, idx, slack = per_chunk(pq[0])
        q, idx, slack = q[None], idx[None], slack[None]
    else:
        q, idx, slack = jax.lax.map(per_chunk, pq)
    q = q.reshape(-1, 3)[:P]
    idx = idx.reshape(P + pad_q, k)[:P]
    slack = slack.reshape(-1)[:P]
    candT = None
    if with_candT:
        from .pallas_kernels import ericson_tile
        qt2 = min(ericson_tile(k), max(-(-P // 128) * 128, 128))
        padT = (-P) % qt2
        cand = tri_verts[idx]                    # one gather per REFRESH
        candT = jnp.pad(
            jnp.transpose(cand.reshape(P, k, 9), (2, 1, 0)),
            ((0, 0), (0, 0), (0, padT)))
    return q, CPCache(idx=idx.astype(jnp.int32), p0=p, slack=slack,
                      candT=candT)


def _gather_sub_tris(tri_sub, gidx):
    """(Tsub, s, 3, 3) subgroup triangle blocks gathered per query:
    gidx (q, NG) -> candidates (q, NG*s, 3, 3). s*36-byte block rows ride
    the gather unit's fast regime (CLAUDE.md: ~75 GB/s at 256B+ rows vs
    ~3 GB/s at 36B rows)."""
    qn, ng = gidx.shape
    s = tri_sub.shape[1]
    return tri_sub[gidx].reshape(qn, ng * s, 3, 3)


def _cp_refresh_group(p, tri_blk, cent_blk, rad_blk, gcenter, gradius,
                      n_sub: int, sub_size: int, query_tile: int,
                      prefilter: int = 32, k: int = 48):
    """Group-cache refresh. The VALUE comes from the hierarchical 2-stage
    query (group bounds -> per-triangle bounds on the g0 surviving groups ->
    exact Ericson on the top-k) — the same pipeline the accuracy tests pin
    against brute force. The CACHE keeps the NG best SUBGROUPS (sub_size
    consecutive Morton triangles each, scored by their members' best
    per-triangle bound), with a tight sound slack: the best excluded
    candidate is no closer than ``min(per-triangle bound over surviving
    triangles OUTSIDE the cached subgroups, (g0+1)-th group bound)``. If
    the true nearest ever sat outside the cached subgroups, that excluded
    bound <= d_true makes the slack non-positive, forcing a refresh
    instead of a wrong fast path."""
    P = p.shape[0]
    G = gcenter.shape[0]
    S = tri_blk.shape[1]
    n_per_g = S // sub_size
    qt = min(query_tile, max(P, 1))
    pad_q = (-P) % qt
    pq = jnp.pad(p, ((0, pad_q), (0, 0))).reshape(-1, qt, 3)
    g0 = min(prefilter, G - 1)
    # The caller's cache width must survive unclamped: a clamped ng would
    # change the refresh branch's gidx width vs cache.gidx and fail the
    # enclosing lax.cond with an opaque trace-time shape error; and the
    # (ng+1)-th-best exclusion margin needs at least ng+1 scored subgroups
    # (ADVICE r4).
    if n_sub + 1 > g0 * n_per_g:
        raise ValueError(
            f"cp_groups={n_sub} needs at least cp_groups+1 candidate "
            f"subgroups after prefilter, but prefilter={g0} groups x "
            f"{n_per_g} subgroups/group = {g0 * n_per_g}; lower cp_groups "
            f"or raise prefilter/group_size")
    ng = n_sub

    def per_chunk(pc):
        qn = pc.shape[0]
        # Stage 0: (q, G) group lower bounds, direct norm (no cancellation).
        dg = jnp.sqrt(jnp.sum(
            (pc[:, None, :] - gcenter[None]) ** 2, -1))         # (q, G)
        lower_g = jnp.maximum(dg - gradius[None, :], 0.0)
        negg, gsel = jax.lax.top_k(-lower_g, g0 + 1)            # (q, g0+1)
        excl_group = -negg[:, g0]       # best bound OUTSIDE the g0 groups
        gsel = gsel[:, :g0]
        # Stage 1: per-triangle bounds on the survivors (block gathers).
        cc = cent_blk[gsel].reshape(qn, g0 * S, 3)
        rr = rad_blk[gsel].reshape(qn, g0 * S)
        slots = (gsel[..., None] * S
                 + jnp.arange(S, dtype=gsel.dtype)).reshape(qn, -1)
        dt_ = jnp.sqrt(jnp.sum((pc[:, None, :] - cc) ** 2, -1))
        lower = jnp.maximum(dt_ - rr, 0.0)                      # (q, g0*S)
        _, j = jax.lax.top_k(-lower, k)                         # (q, k)
        idx = jnp.take_along_axis(slots, j, axis=1)
        q, sqd = _closest_point_candidates(
            pc, tri_blk.reshape(-1, 3, 3)[idx])
        # Cache-subgroup selection: score = best member per-triangle bound.
        # The excluded-set margin is then exactly the (NG+1)-th best score:
        # min over triangles outside the cached subgroups (within the g0
        # groups) = min over non-selected subgroups of their best member.
        sub_score = lower.reshape(qn, -1, sub_size).min(-1)     # (q, g0*n)
        sslots = (gsel[..., None] * n_per_g
                  + jnp.arange(n_per_g, dtype=gsel.dtype)).reshape(qn, -1)
        negs, js = jax.lax.top_k(-sub_score, ng + 1)
        gidx = jnp.take_along_axis(sslots, js[:, :ng], axis=1)  # (q, NG)
        excl = jnp.minimum(-negs[:, ng], excl_group)
        slack = excl - jnp.sqrt(sqd)
        return q, gidx, slack

    q, gidx, slack = jax.lax.map(per_chunk, pq)
    return (q.reshape(-1, 3)[:P],
            CPCacheGroup(gidx=gidx.reshape(P + pad_q, ng)[:P]
                         .astype(jnp.int32),
                         p0=p, slack=slack.reshape(-1)[:P]))


@partial(jax.jit, static_argnames=("sub_size", "query_tile", "fast_tile"))
def closest_point_cached_group(p, tri_blk, cent_blk, rad_blk, gcenter,
                               gradius, cache: CPCacheGroup,
                               sub_size: int = 16, query_tile: int = 8192,
                               fast_tile: int = 65536):
    """Exact closest point via the subgroup-granular candidate cache;
    self-refreshing (see CPCacheGroup). tri_blk is the Morton-grouped
    (G, S, 3, 3) triangle array from build_tri_groups (far-padded slots
    exclude themselves by distance); cent_blk/rad_blk the matching
    per-triangle bound data used by the refresh.

    Tile sizes matter enormously here: a sequential ``lax.map`` over many
    small chunks costs ~10x over the same math in one fused kernel
    (measured 190ms vs 19ms for the 230k x 64 Ericson sweep —
    tools/bench_gather*.py), while fully unchunked intermediates blow the
    compile-time memory budget. The fast path uses a few LARGE tiles
    (fast_tile); the (rare) refresh keeps moderate tiles because its
    (q, g0*S) bound matrices and block gathers are much wider."""
    ng = int(cache.gidx.shape[1])
    tri_blk = tri_blk.astype(p.dtype)
    tri_sub = tri_blk.reshape(-1, sub_size, 3, 3)
    moved = jnp.sqrt(jnp.sum((p - cache.p0) ** 2, axis=-1))
    need = jnp.any(2.0 * moved >= cache.slack)

    def refresh(_):
        return _cp_refresh_group(p, tri_blk, cent_blk.astype(p.dtype),
                                 rad_blk.astype(p.dtype),
                                 gcenter.astype(p.dtype),
                                 gradius.astype(p.dtype), ng, sub_size,
                                 query_tile)

    def fast(_):
        P = p.shape[0]
        qt = min(fast_tile, max(P, 1))
        pad_q = (-P) % qt
        pq = jnp.pad(p, ((0, pad_q), (0, 0))).reshape(-1, qt, 3)
        gi = jnp.pad(cache.gidx, ((0, pad_q), (0, 0))).reshape(-1, qt, ng)

        def per_chunk(args):
            pc, gc = args
            q, _ = _closest_point_candidates(pc,
                                             _gather_sub_tris(tri_sub, gc))
            return q

        q = jax.lax.map(per_chunk, (pq, gi)).reshape(-1, 3)[:P]
        return q, cache

    return jax.lax.cond(need, refresh, fast, None)


@partial(jax.jit, static_argnames=("query_tile",))
def closest_point_cached(p, tri_verts, cache: CPCache,
                         query_tile: int = 4096):
    """Exact closest point using the candidate cache; self-refreshing.

    Fast path (valid cache): one gather + Ericson over (Q, K) — no (Q, T)
    intermediate touches HBM. Refresh path (any query moved past its
    slack): the full 2-stage query, amortized over many iterations because
    the ADMM iterates move slowly. Returns (points (Q, 3), new cache).
    K is taken from the cache (the lax.cond branches must agree on it)."""
    k = int(cache.idx.shape[1])
    tri_verts = tri_verts.astype(p.dtype)
    moved = jnp.sqrt(jnp.sum((p - cache.p0) ** 2, axis=-1))
    need = jnp.any(2.0 * moved >= cache.slack)
    with_candT = cache.candT is not None

    def refresh(_):
        return _cp_refresh(p, tri_verts, k, query_tile,
                           with_candT=with_candT)

    def fast(_):
        if with_candT:
            # Candidates cached in kernel layout: the fast path is the
            # fused Ericson kernel alone — no gather, no relayout.
            from .pallas_kernels import ericson_candidates_T, ericson_tile
            P = p.shape[0]
            Qp = cache.candT.shape[2]
            qt = min(ericson_tile(k), max(-(-P // 128) * 128, 128))
            pT = jnp.pad(p.T, ((0, 0), (0, Qp - P)))
            qv, _ = ericson_candidates_T(pT, cache.candT, qt)
            return qv[:, :P].T, cache
        return _fast_gather(_)

    def _fast_gather(_):
        # Tiled like the refresh: at wiremesh scale the unchunked candidate
        # gather would materialize (Q, K, 3, 3) = tens of GB at once.
        P = p.shape[0]
        qt = min(query_tile, max(P, 1))
        pad_q = (-P) % qt
        pq = jnp.pad(p, ((0, pad_q), (0, 0))).reshape(-1, qt, 3)
        idx = jnp.pad(cache.idx, ((0, pad_q), (0, 0))).reshape(-1, qt, k)

        def per_chunk(args):
            pc, ic = args
            q, _ = _closest_point_candidates(pc, tri_verts[ic])
            return q

        # Single-tile batches skip lax.map entirely: even a 1-iteration
        # map compiles to a while loop with dynamic-slice boundaries that
        # XLA cannot fuse through (measured ~10x penalty on small chunks,
        # CLAUDE.md).
        if pq.shape[0] == 1:
            q = per_chunk((pq[0], idx[0]))[:P]
        else:
            q = jax.lax.map(per_chunk, (pq, idx)).reshape(-1, 3)[:P]
        return q, cache

    return jax.lax.cond(need, refresh, fast, None)


def _use_pallas() -> bool:
    """Fused Pallas sweeps are the default on accelerator backends
    (AAADMM_PALLAS=0 opts out); on CPU the interpreter would be slower
    than XLA, so the jnp path stays."""
    import os
    env = os.environ.get("AAADMM_PALLAS")
    if env is not None:
        return env != "0"
    return jax.default_backend() != "cpu"


def _closest_point_candidates(p, cand):
    """Exact closest point over per-query candidate triangles.
    p: (Q, 3); cand: (Q, K, 3, 3). Returns (point (Q,3), sqdist (Q,)).

    On TPU this is ONE fused Pallas kernel (ops/pallas_kernels.py): the
    XLA lowering of the ~30-op Ericson chain is pure per-kernel overhead
    at small-scene sizes (PERF.md r5: costa2k 0.53 -> 0.29 s), and even at
    wiremesh's 65k-query tiles the kernel nets ~2 s end-to-end (35.2 vs
    37.1 s measured with the kernel force-disabled) — the (Q,K,9)->(9,K,Q)
    relayout feeding it costs ~37 ms/trial but the XLA chain's own
    materialized intermediates cost more."""
    if _use_pallas() and p.dtype == jnp.float32:
        from .pallas_kernels import ericson_candidates
        return ericson_candidates(p, cand)
    q, sqd = _closest_point_candidates_all(p, cand)
    i = jnp.argmin(sqd, axis=1)
    return (jnp.take_along_axis(q, i[:, None, None], axis=1)[:, 0],
            jnp.take_along_axis(sqd, i[:, None], axis=1)[:, 0])


def _closest_point_candidates_all(p, cand):
    """Per-candidate exact closest points (no argmin reduction).
    p: (Q, 3); cand: (Q, K, 3, 3). Returns (points (Q,K,3), sqd (Q,K))."""
    a, b, c = cand[:, :, 0], cand[:, :, 1], cand[:, :, 2]
    pq = p[:, None, :]
    ab, ac, ap = b - a, c - a, pq - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = pq - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = pq - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    def safe_div(n, d):
        return n / jnp.where(d == 0, 1.0, d)

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    v_ab = jnp.clip(safe_div(d1, d1 - d3), 0.0, 1.0)
    w_ac = jnp.clip(safe_div(d2, d2 - d6), 0.0, 1.0)
    w_bc = jnp.clip(safe_div(d4 - d3, (d4 - d3) + (d5 - d6)), 0.0, 1.0)
    denom = jnp.where(va + vb + vc == 0, 1.0, va + vb + vc)
    v_in = vb / denom
    w_in = vc / denom
    q = a + v_in[..., None] * ab + w_in[..., None] * ac
    q = jnp.where(on_bc[..., None], b + w_bc[..., None] * (c - b), q)
    q = jnp.where(on_ac[..., None], a + w_ac[..., None] * ac, q)
    q = jnp.where(on_ab[..., None], a + v_ab[..., None] * ab, q)
    q = jnp.where(in_c[..., None], c, q)
    q = jnp.where(in_b[..., None], b, q)
    q = jnp.where(in_a[..., None], a, q)
    sqd = jnp.sum((pq - q) ** 2, -1)
    return q, sqd
