"""Geometry constraint batches (planarity / angle / edge-length / closeness /
reference-surface) — the struct-of-arrays replacement for the reference's
``Constraint<N>`` virtual hierarchy (Geometry/Constraint.h:48-414).

Each batch implements the L4->L2 interface as pure array ops:
  * ``transform(x)``   — apply_transform (Constraint.h:73-94): gather +
    invariance transform (MEAN_CENTERING / SUBTRACT_FIRST / IDENTITY),
    emitting a fixed-shape block (C, K, 3) with a validity mask for padded
    slots (variable-valence faces are padded to the max valence).
  * ``scatter(t, n)``  — D^T applied to a block, via segment_sum (the adjoint
    of transform; replaces the add_constraint triplets, Constraint.h:132-159).
  * ``project(p)``     — the constraint projection (project_impl).

Weights: each constraint carries w = sqrt(weight) (Constraint.h:62-68). Hard
constraints enter D unweighted; soft constraints enter D and projections
scaled by w (add_constraint 'weighted', project 'weighted').
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .closest_point import closest_point_on_mesh, closest_point_on_mesh_2stage
from .svd3 import eigh3x3

# Above this triangle count, RefSurfaceBatch uses the MXU coarse-to-fine
# closest-point (exact-in-practice top-k prefilter) instead of brute force.
_CP_2STAGE_THRESHOLD = 4096
# Above this triangle count, the in-loop candidate cache switches from the
# flat per-triangle form (k=48 ids, exact (Q, T) 2-stage refresh) to the
# Morton-subgroup form whose refresh never materializes (Q, T). Mid-size
# meshes (costa2k/airport3k ~4-6k tris) stay flat: their group-cache slack
# is structurally tighter (fewer, larger groups) and measured to refresh
# far more often, costing 2x end-to-end on costa2k.
_CP_GROUP_THRESHOLD = 20000


from ._batchutil import (  # noqa: F401 (re-export)
    _host_mirror, _static, cast_floats, hostarr)


def _gather_scatter(contrib_flat, inv_idx, inv_mask):
    """Adjoint scatter in gather form (see _batchutil.build_inverse_table)."""
    g = contrib_flat[inv_idx]                       # (n, K, 3)
    return jnp.sum(g * inv_mask[..., None], axis=1)


def with_gather_adjoint(batch, n_verts):
    """Copy of a constraint batch with its scatter() precomputed in padded
    gather form. Valid for batches whose scatter is a plain segment_sum
    over idx (Angle/EdgeLength/Plane). Built once at setup; used on the
    TPU hot path (the sharded path keeps segment_sum — its psum structure
    is part of the multichip contract)."""
    if not hasattr(batch, "inv_idx") or batch.inv_idx is not None:
        return batch
    from ._batchutil import build_inverse_table
    # DEVICE dtype, not the host mirror's (mirrors stay f64 after
    # cast_floats — an f64 mask here poisons the whole f32 loop carry).
    dt = np.dtype(batch.w.dtype)
    inv_idx, inv_mask = build_inverse_table(
        hostarr(batch, "idx"), n_verts, dt)
    out = dataclasses.replace(batch, inv_idx=jnp.asarray(inv_idx),
                              inv_mask=jnp.asarray(inv_mask))
    if hasattr(batch, "_host"):
        object.__setattr__(out, "_host", batch._host)
    return out


def _pad_rows(rows, pad_val=0):
    k = max(len(r) for r in rows)
    out = np.full((len(rows), k), pad_val, np.int32)
    mask = np.zeros((len(rows), k), bool)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
        mask[i, : len(r)] = True
    return out, mask


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlaneBatch:
    """Per-face best-fit-plane projection, MEAN_CENTERING transform
    (PlaneConstraint, Constraint.h:396-414). Faces padded to max valence."""

    idx: jnp.ndarray    # (C, K) int32, padded
    mask: jnp.ndarray   # (C, K) bool
    count: jnp.ndarray  # (C,) float — valence
    w: jnp.ndarray      # (C,)
    inv_idx: Optional[jnp.ndarray] = None   # (n, Kv) gather-form adjoint
    inv_mask: Optional[jnp.ndarray] = None  # (n, Kv)

    @classmethod
    def create(cls, faces, weight, dtype=np.float64):
        idx, mask = _pad_rows(faces)
        C = len(faces)
        w = np.full(C, np.sqrt(weight), dtype)
        cnt = mask.sum(1).astype(dtype)
        out = cls(idx=jnp.asarray(idx), mask=jnp.asarray(mask),
                  count=jnp.asarray(cnt), w=jnp.asarray(w))
        return _host_mirror(out, idx=idx, mask=mask, count=cnt, w=w)

    @property
    def block_shape(self):
        return tuple(self.idx.shape) + (3,)

    def transform(self, x):
        p = x[self.idx] * self.mask[..., None]
        mean = jnp.sum(p, axis=1) / self.count[:, None]
        return (p - mean[:, None, :]) * self.mask[..., None]

    def transform_host(self, x):
        """f64 numpy transform (delta-form precomputation of D x0)."""
        idx, mask = hostarr(self, 'idx'), hostarr(self, 'mask')
        cnt = hostarr(self, 'count').astype(np.float64)
        p = np.asarray(x, np.float64)[idx] * mask[..., None]
        mean = p.sum(1) / cnt[:, None]
        return (p - mean[:, None, :]) * mask[..., None]

    def scatter(self, t, n_verts):
        # Adjoint of masked mean-centering: t_centered scattered to idx.
        tm = t * self.mask[..., None]
        mean = jnp.sum(tm, axis=1) / self.count[:, None]
        tc = (tm - mean[:, None, :]) * self.mask[..., None]
        if self.inv_idx is not None:
            # Padded idx slots alias vertex 0 but their tc rows are
            # mask-zeroed, and the inverse table was built over the SAME
            # padded idx, so the aliased positions contribute zeros.
            return _gather_scatter(tc.reshape(-1, 3),
                                   self.inv_idx, self.inv_mask)
        return jax.ops.segment_sum(tc.reshape(-1, 3), self.idx.reshape(-1),
                                   num_segments=n_verts)

    def project(self, p):
        """Subtract the best-fit-plane normal component: the normal is the
        least-significant left-singular vector of the centered 3xk block
        (Constraint.h:406-413)."""
        # Covariance of the centered points: (C, 3, 3); padded slots are zero.
        cov = jnp.einsum("cki,ckj->cij", p, p)
        wvals, V = eigh3x3(cov)
        nidx = jnp.argmin(wvals, axis=-1)
        normal = jnp.take_along_axis(V, nidx[:, None, None], axis=2)[..., 0]
        nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
        normal = normal / jnp.maximum(nn, 1e-300)
        coef = jnp.einsum("ci,cki->ck", normal, p)
        return (p - coef[..., None] * normal[:, None, :]) * self.mask[..., None]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AngleBatch:
    """3-point angle clamp to [min,max] radians, SUBTRACT_FIRST transform
    (AngleConstraint, Constraint.h:220-296). Block shape (C, 2, 3)."""

    idx: jnp.ndarray        # (C, 3) tip, side1, side2
    w: jnp.ndarray          # (C,)
    min_angle: jnp.ndarray  # (C,)
    max_angle: jnp.ndarray  # (C,)
    inv_idx: Optional[jnp.ndarray] = None   # (n, K) gather-form adjoint
    inv_mask: Optional[jnp.ndarray] = None  # (n, K)

    @classmethod
    def create(cls, triples, weight, min_radian, max_radian, dtype=np.float64):
        C = len(triples)
        mn = np.maximum(0.0, np.broadcast_to(min_radian, (C,)).astype(dtype))
        mx = np.minimum(np.pi, np.broadcast_to(max_radian, (C,)).astype(dtype))
        idx = np.asarray(triples, np.int32)
        w = np.full(C, np.sqrt(weight), dtype)
        out = cls(idx=jnp.asarray(idx), w=jnp.asarray(w),
                  min_angle=jnp.asarray(mn), max_angle=jnp.asarray(mx))
        return _host_mirror(out, idx=idx, w=w)

    @property
    def block_shape(self):
        return (self.idx.shape[0], 2, 3)

    def transform(self, x):
        tip = x[self.idx[:, 0]]
        return jnp.stack([x[self.idx[:, 1]] - tip, x[self.idx[:, 2]] - tip],
                         axis=1)

    def transform_host(self, x):
        idx = hostarr(self, 'idx')
        x = np.asarray(x, np.float64)
        tip = x[idx[:, 0]]
        return np.stack([x[idx[:, 1]] - tip, x[idx[:, 2]] - tip], axis=1)

    def scatter(self, t, n_verts):
        contrib = jnp.concatenate(
            [-(t[:, 0] + t[:, 1])[:, None, :], t], axis=1)  # (C, 3, 3)
        if self.inv_idx is not None:
            return _gather_scatter(contrib.reshape(-1, 3),
                                   self.inv_idx, self.inv_mask)
        return jax.ops.segment_sum(contrib.reshape(-1, 3),
                                   self.idx.reshape(-1), num_segments=n_verts)

    def project(self, p):
        """Closed-form coplanar rotation projection (Constraint.h:243-291)."""
        v1, v2 = p[:, 0], p[:, 1]
        eps = 1e-14
        v1_sq = jnp.sum(v1 * v1, -1)
        v2_sq = jnp.sum(v2 * v2, -1)
        v1_n = jnp.sqrt(v1_sq)
        v2_n = jnp.sqrt(v2_sq)
        u1 = v1 / jnp.maximum(v1_n, 1e-300)[:, None]
        u2 = v2 / jnp.maximum(v2_n, 1e-300)[:, None]
        cos_g = jnp.clip(jnp.sum(u1 * u2, -1), -1.0, 1.0)

        min_cos = jnp.clip(jnp.cos(self.min_angle), -1.0, 1.0)
        max_cos = jnp.clip(jnp.cos(self.max_angle), -1.0, 1.0)
        needs = ((1.0 - jnp.abs(cos_g) > eps)
                 & ((cos_g > min_cos) | (cos_g < max_cos)))

        gamma = jnp.arccos(cos_g)
        too_small = cos_g > min_cos  # angle below range -> open it up
        eta = jnp.where(too_small, self.min_angle - gamma,
                        gamma - self.max_angle)
        eta = jnp.maximum(eta, 0.0)
        theta = 0.5 * jnp.arctan2(v2_sq * jnp.sin(2 * eta),
                                  v1_sq + v2_sq * jnp.cos(2 * eta))
        theta = jnp.clip(theta, 0.0, eta)
        phi = eta - theta

        u3 = u2 - u1 * cos_g[:, None]
        u3 = u3 / jnp.maximum(jnp.linalg.norm(u3, axis=-1, keepdims=True), 1e-300)
        u4 = u1 - u2 * cos_g[:, None]
        u4 = u4 / jnp.maximum(jnp.linalg.norm(u4, axis=-1, keepdims=True), 1e-300)
        sgn = jnp.where(too_small, -1.0, 1.0)[:, None]
        u3 = u3 * sgn
        u4 = u4 * sgn

        p1 = ((u1 * jnp.cos(theta)[:, None] + u3 * jnp.sin(theta)[:, None])
              * (v1_n * jnp.cos(theta))[:, None])
        p2 = ((u2 * jnp.cos(phi)[:, None] + u4 * jnp.sin(phi)[:, None])
              * (v2_n * jnp.cos(phi))[:, None])
        proj = jnp.stack([p1, p2], axis=1)
        return jnp.where(needs[:, None, None], proj, p)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgeLengthBatch:
    """Edge vector projected to target length, SUBTRACT_FIRST
    (EdgeLengthConstraint, Constraint.h:194-218). Block (C, 1, 3)."""

    idx: jnp.ndarray      # (C, 2)
    w: jnp.ndarray        # (C,)
    target: jnp.ndarray   # (C,)
    inv_idx: Optional[jnp.ndarray] = None   # (n, K) gather-form adjoint
    inv_mask: Optional[jnp.ndarray] = None  # (n, K)

    @classmethod
    def create(cls, pairs, weight, target_length, dtype=np.float64):
        C = len(pairs)
        idx = np.asarray(pairs, np.int32)
        w = np.full(C, np.sqrt(weight), dtype)
        out = cls(idx=jnp.asarray(idx), w=jnp.asarray(w),
                  target=jnp.asarray(
                      np.broadcast_to(target_length, (C,)).astype(dtype)))
        return _host_mirror(out, idx=idx, w=w)

    @property
    def block_shape(self):
        return (self.idx.shape[0], 1, 3)

    def transform(self, x):
        return (x[self.idx[:, 1]] - x[self.idx[:, 0]])[:, None, :]

    def transform_host(self, x):
        idx = hostarr(self, 'idx')
        x = np.asarray(x, np.float64)
        return (x[idx[:, 1]] - x[idx[:, 0]])[:, None, :]

    def scatter(self, t, n_verts):
        contrib = jnp.concatenate([-t, t], axis=1)  # (C, 2, 3)
        if self.inv_idx is not None:
            return _gather_scatter(contrib.reshape(-1, 3),
                                   self.inv_idx, self.inv_mask)
        return jax.ops.segment_sum(contrib.reshape(-1, 3),
                                   self.idx.reshape(-1), num_segments=n_verts)

    def project(self, p):
        e = p[:, 0]
        n = jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-300)
        return (e / n * self.target[:, None])[:, None, :]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClosenessBatch:
    """Pin a vertex toward a target, IDENTITY transform (ClosenessConstraint,
    Constraint.h:299-326 — implemented *correctly*: the reference's
    misspelled ``proj_impl`` silently degrades it to an identity projection,
    a latent bug not replicated here)."""

    idx: jnp.ndarray     # (C,)
    w: jnp.ndarray       # (C,)
    target: jnp.ndarray  # (C, 3)

    @classmethod
    def create(cls, idx, weight, targets, dtype=np.float64):
        C = len(idx)
        idx_h = np.asarray(idx, np.int32)
        w = np.full(C, np.sqrt(weight), dtype)
        out = cls(idx=jnp.asarray(idx_h), w=jnp.asarray(w),
                  target=jnp.asarray(np.asarray(targets, dtype).reshape(C, 3)))
        return _host_mirror(out, idx=idx_h, w=w)

    @property
    def block_shape(self):
        return (self.idx.shape[0], 1, 3)

    def transform(self, x):
        return x[self.idx][:, None, :]

    def transform_host(self, x):
        return np.asarray(x, np.float64)[hostarr(self, 'idx')][:, None, :]

    def scatter(self, t, n_verts):
        return jax.ops.segment_sum(t[:, 0], self.idx, num_segments=n_verts)

    def project(self, p):
        return jnp.broadcast_to(self.target[:, None, :], p.shape)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RefSurfaceBatch:
    """Closest-point projection of vertices onto a fixed reference trimesh
    (PointToRefSurfaceConstraint / ReferenceSurfceConstraint,
    Constraint.h:328-394). Block (C, 1, 3)."""

    idx: jnp.ndarray        # (C,)
    w: jnp.ndarray          # (C,)
    tri_verts: jnp.ndarray  # (T, 3, 3) reference surface triangles
    # Host-built spatial groups for the group-granular candidate cache
    # (build_tri_groups; None for small meshes). grp_tris is Morton-permuted
    # + far-padded, blocked (G, S, 3, 3) — a separate copy because the FAR
    # pads would poison the plain 2-stage path's centered expansion.
    grp_tris: Optional[jnp.ndarray] = None     # (G, S, 3, 3)
    grp_cent: Optional[jnp.ndarray] = None     # (G, S, 3)
    grp_rad: Optional[jnp.ndarray] = None      # (G, S)
    grp_gcenter: Optional[jnp.ndarray] = None  # (G, 3)
    grp_gradius: Optional[jnp.ndarray] = None  # (G,)
    tile: int = _static(default=2048)
    # NG=6 subgroups of 16: measured on MaleTorso-vs-target, the smallest
    # config whose slack stays positive for EVERY query (min 0.99 at the
    # start positions; ng=4 left 0.02% of queries chronically negative ->
    # whole-batch refresh every iteration, 700ms/iter wasted).
    cp_groups: int = _static(default=6)        # NG candidate subgroups/query
    cp_sub: int = _static(default=16)          # triangles per subgroup

    @classmethod
    def create(cls, idx, weight, ref_verts, ref_faces, dtype=np.float64,
               tile: int = 2048, group_size: int = 64, sub_size: int = 16,
               cp_groups: int = 6):
        C = len(idx)
        rv = np.asarray(ref_verts, dtype)
        rf = np.asarray(ref_faces, np.int64)
        idx_h = np.asarray(idx, np.int32)
        w = np.full(C, np.sqrt(weight), dtype)
        grp = {}
        if len(rf) > _CP_GROUP_THRESHOLD:
            from .closest_point import build_tri_groups
            tp, cent, rad, gc, gr = build_tri_groups(rv[rf],
                                                     group_size=group_size)
            G = len(gc)
            S = group_size
            grp = dict(grp_tris=jnp.asarray(
                           tp.reshape(G, S, 3, 3).astype(dtype)),
                       grp_cent=jnp.asarray(
                           cent.reshape(G, S, 3).astype(dtype)),
                       grp_rad=jnp.asarray(rad.reshape(G, S).astype(dtype)),
                       grp_gcenter=jnp.asarray(gc.astype(dtype)),
                       grp_gradius=jnp.asarray(gr.astype(dtype)),
                       cp_groups=cp_groups, cp_sub=sub_size)
        out = cls(idx=jnp.asarray(idx_h), w=jnp.asarray(w),
                  tri_verts=jnp.asarray(rv[rf]), tile=tile, **grp)
        return _host_mirror(out, idx=idx_h, w=w)

    @property
    def block_shape(self):
        return (self.idx.shape[0], 1, 3)

    def transform(self, x):
        return x[self.idx][:, None, :]

    def transform_host(self, x):
        return np.asarray(x, np.float64)[hostarr(self, 'idx')][:, None, :]

    def scatter(self, t, n_verts):
        return jax.ops.segment_sum(t[:, 0], self.idx, num_segments=n_verts)

    def project(self, p):
        if self.tri_verts.shape[0] > _CP_2STAGE_THRESHOLD:
            q = closest_point_on_mesh_2stage(p[:, 0], self.tri_verts)
        else:
            q = closest_point_on_mesh(p[:, 0], self.tri_verts, tile=self.tile)
        return q[:, None, :]

    # -- iterative-query candidate cache (solver loop fast path) --

    def cp_cache_init(self, dtype):
        """Candidate cache for in-loop projections, or None when the mesh is
        small enough that the one-shot brute-force sweep is already cheap.
        With host-built groups the cache is group-granular (CPCacheGroup) —
        tiny carried state, block-gathered candidates."""
        from .closest_point import _use_pallas, cp_cache_group_init, \
            cp_cache_init
        T = int(self.tri_verts.shape[0])
        if T <= _CP_2STAGE_THRESHOLD:
            return None
        if self.grp_tris is not None:
            return cp_cache_group_init(int(self.idx.shape[0]),
                                       self.cp_groups, dtype)
        Q, k = int(self.idx.shape[0]), min(48, T)
        # Pallas fast path: also cache the candidate coordinates in kernel
        # layout (bounded size — flat caches only exist for mid meshes).
        with_candT = (_use_pallas() and np.dtype(dtype) == np.float32
                      and Q * k <= 1_000_000)
        return cp_cache_init(Q, k, dtype, with_candT=with_candT)

    def project_cached(self, p, cache):
        """project() through the movement-bounded candidate cache — exact,
        self-refreshing (see closest_point.CPCache/CPCacheGroup). Returns
        (proj, cache)."""
        if self.grp_tris is not None:
            from .closest_point import closest_point_cached_group
            q, cache = closest_point_cached_group(
                p[:, 0], self.grp_tris, self.grp_cent, self.grp_rad,
                self.grp_gcenter, self.grp_gradius, cache,
                sub_size=self.cp_sub)
        else:
            from .closest_point import closest_point_cached
            q, cache = closest_point_cached(p[:, 0], self.tri_verts, cache)
        return q[:, None, :], cache


def wexpand(batch, a):
    w = batch.w
    return w.reshape(w.shape + (1,) * (a.ndim - w.ndim)) * a


def assemble_geometry_node_matrix_sparse(n_verts: int, hard, soft, rho: float,
                                         reg_rows=None):
    """Sparse (scipy CSR) assembly of the same per-coordinate global matrix
    as ``assemble_geometry_node_matrix``. For large meshes the matrix has a
    bounded mesh-stencil row width (~10-30 nonzeros), so the PCG matvec can
    run as one padded gather+FMA instead of re-deriving D^T D through the
    constraint transforms every CG iteration (ELL path, solver/geometry.py)."""
    import scipy.sparse as sp

    # Seed with empties so a system with no constraints/regularization
    # assembles to an all-zero matrix (like the dense assembler) instead of
    # crashing in np.concatenate.
    rows = [np.zeros(0, np.int64)]
    cols = [np.zeros(0, np.int64)]
    vals = [np.zeros(0, np.float64)]

    def emit(idx, K):
        # idx (C, k) global indices; K (C, k, k) local stiffness.
        C, k = idx.shape
        rows.append(np.repeat(idx[:, :, None], k, axis=2).ravel())
        cols.append(np.repeat(idx[:, None, :], k, axis=1).ravel())
        vals.append(K.ravel())

    def add_batch(b, scale_w, scale):
        if isinstance(b, PlaneBatch):
            idx = hostarr(b, 'idx')
            mask = hostarr(b, 'mask').astype(np.float64)
            cnt = hostarr(b, 'count')
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(idx))
            k = idx.shape[1]
            eye = np.eye(k)[None]
            T = (eye - mask[:, :, None] * mask[:, None, :] / cnt[:, None, None])
            T = T * mask[:, :, None] * mask[:, None, :]
            K = np.einsum("c,cik,cjk->cij", w2 * scale, T, T)
            emit(idx, K)
        elif isinstance(b, AngleBatch):
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(b.idx))
            idx = hostarr(b, 'idx')
            G = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
            K = np.einsum("c,ir,jr->cij", w2 * scale, G, G)
            emit(idx, K)
        elif isinstance(b, EdgeLengthBatch):
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(b.idx))
            idx = hostarr(b, 'idx')
            G = np.array([[-1.0], [1.0]])
            K = np.einsum("c,ir,jr->cij", w2 * scale, G, G)
            emit(idx, K)
        else:
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(b.idx))
            idx = hostarr(b, 'idx')
            rows.append(idx)
            cols.append(idx)
            vals.append(np.asarray(w2 * scale, np.float64))

    for b in hard:
        add_batch(b, scale_w=False, scale=rho)
    for b in soft:
        add_batch(b, scale_w=True, scale=1.0)
    if reg_rows is not None:
        idx, coef, mask = reg_rows
        cm = coef * mask
        K = np.einsum("ri,rj->rij", cm, cm)
        emit(idx, K)
    A = sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(n_verts, n_verts)).tocsr()
    A.sum_duplicates()
    return A


def assemble_geometry_node_matrix(n_verts: int, hard, soft, rho: float,
                                  reg_rows=None, vertex_map=None) -> np.ndarray:
    """Host-side dense per-coordinate global matrix
    ``rho * D_h^T D_h + D_s^T W_s^2 D_s + L^T L``
    (ALMGeometrySolver::setup_ADMM, ALMGeometrySolver.h:96-141).

    With ``vertex_map`` (n_fine,) -> [0, n_verts), assembles the Galerkin
    coarse operator P^T A P for the piecewise-constant prolongation instead:
    scatter-adding each constraint's local stiffness at the mapped indices
    sums exactly the rows/columns P^T A P sums (solver/multigrid.py).
    """
    def remap(idx):
        return idx if vertex_map is None else vertex_map[idx]

    def add_batch(A, b, scale_w):
        if isinstance(b, PlaneBatch):
            idx = remap(hostarr(b, 'idx'))
            mask = hostarr(b, 'mask').astype(np.float64)
            cnt = hostarr(b, 'count')
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(idx))
            # Row block for face c: (I - 11^T/k) over its k valid slots.
            k = idx.shape[1]
            eye = np.eye(k)[None]
            T = (eye - mask[:, :, None] * mask[:, None, :] / cnt[:, None, None])
            T = T * mask[:, :, None] * mask[:, None, :]
            K = np.einsum("c,cik,cjk->cij", w2, T, T)
            np.add.at(A, (idx[:, :, None], idx[:, None, :]), K)
        elif isinstance(b, AngleBatch):
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(b.idx))
            idx = remap(hostarr(b, 'idx'))
            # rows: [-1 1 0], [-1 0 1] over (tip, s1, s2)
            G = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
            K = np.einsum("c,ir,jr->cij", w2, G, G)
            np.add.at(A, (idx[:, :, None], idx[:, None, :]), K)
        elif isinstance(b, EdgeLengthBatch):
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(b.idx))
            idx = remap(hostarr(b, 'idx'))
            G = np.array([[-1.0], [1.0]])
            K = np.einsum("c,ir,jr->cij", w2, G, G)
            np.add.at(A, (idx[:, :, None], idx[:, None, :]), K)
        else:  # identity transforms
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(b.idx))
            idx = remap(hostarr(b, 'idx'))
            np.add.at(A, (idx, idx), w2)

    A = np.zeros((n_verts, n_verts))
    for b in hard:
        add_batch(A, b, scale_w=False)
    A *= rho
    for b in soft:
        add_batch(A, b, scale_w=True)
    if reg_rows is not None:
        idx, coef, mask = reg_rows
        idx = remap(idx)
        # L^T L: rows (R, K) with coefficients coef and validity mask.
        cm = coef * mask
        K = np.einsum("ri,rj->rij", cm, cm)
        np.add.at(A, (idx[:, :, None], idx[:, None, :]), K)
    return A
