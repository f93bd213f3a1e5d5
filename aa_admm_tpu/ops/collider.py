"""Mesh-based colliders and collision detection, batched on device.

Equivalents of the reference's BVH-based mesh collision components:

* ``TetMeshSdf`` — static tet-mesh obstacle (PassiveMesh,
  admm_anderson_xzu/src/PassiveObject.hpp:67-107 / zxu :137-178): a query
  point inside any tet gets signed distance = -(distance to nearest surface
  triangle) and the nearest surface point; outside contributes nothing.
* ``DynamicTetCollider`` — deforming tet-mesh collider (TetMeshCollision,
  admm_anderson_xzu/src/DynamicObject.hpp:30-120): point-in-deformed-tet
  test, hit point mapped to the rest pose via barycentric coordinates, then
  the nearest *rest-pose* surface triangle with face + barycentrics + normal.
* ``detect`` — the Collider::detect sweep (Collider.hpp:152-212): per-vertex
  evaluation against all passive + dynamic objects into fixed-shape masked
  hit arrays (the functional replacement for thread-local hit buffers).

The reference traverses AABB trees per query; here every (query, tet) /
(query, triangle) pair is dense vectorized arithmetic — the TPU-native
trade (obstacle meshes are small; the sweep fuses).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import mat3
from .closest_point import closest_point_on_triangles

_BIG = 1e16


def barycoords_tet(x, v0, v1, v2, v3):
    """Barycentric coordinates of x in tets (broadcasting over leading dims).
    v*: (..., 3). Returns (..., 4)."""
    T = jnp.stack([v1 - v0, v2 - v0, v3 - v0], axis=-1)  # (..., 3, 3)
    b = mat3.solve(T, x - v0)
    b0 = 1.0 - jnp.sum(b, axis=-1)
    return jnp.concatenate([b0[..., None], b], axis=-1)


def point_in_tets(x, tet_verts, eps=0.0):
    """x: (P, 3); tet_verts: (T, 4, 3). Returns (inside_any (P,),
    first_tet_idx (P,), barys (P, 4))."""
    xq = x[:, None, :]
    b = barycoords_tet(xq, tet_verts[None, :, 0], tet_verts[None, :, 1],
                       tet_verts[None, :, 2], tet_verts[None, :, 3])
    inside = jnp.all(b >= -eps, axis=-1)  # (P, T)
    any_in = jnp.any(inside, axis=1)
    first = jnp.argmax(inside, axis=1)
    barys = jnp.take_along_axis(b, first[:, None, None], axis=1)[:, 0]
    return any_in, first, barys


def nearest_surface(x, tri_verts):
    """Nearest point on a (small) triangle soup: returns (point (P,3),
    sqdist (P,), tri_idx (P,), normal (P,3))."""
    q, sqd = closest_point_on_triangles(x, tri_verts)
    i = jnp.argmin(sqd, axis=1)
    d = jnp.take_along_axis(sqd, i[:, None], axis=1)[:, 0]
    qi = jnp.take_along_axis(q, i[:, None, None], axis=1)[:, 0]
    tv = tri_verts[i]
    n = jnp.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-300)
    return qi, d, i, n


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TetMeshSdf:
    """Static tet-mesh obstacle (PassiveMesh)."""

    tet_verts: jnp.ndarray  # (T, 4, 3)
    tri_verts: jnp.ndarray  # (S, 3, 3) surface triangles

    @classmethod
    def create(cls, verts, tets, faces=None, dtype=np.float64) -> "TetMeshSdf":
        verts = np.asarray(verts, dtype)
        tets = np.asarray(tets, np.int64)
        if faces is None:
            from ..core.factory import TetMeshData
            faces = TetMeshData(verts=verts, tets=tets.astype(np.int32)
                                ).surface_faces()
        faces = np.asarray(faces, np.int64)
        return cls(tet_verts=jnp.asarray(verts[tets]),
                   tri_verts=jnp.asarray(verts[faces]))

    def signed_distance(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(d (P,), point (P, 3)); d = -dist to surface when inside, +BIG
        outside (the reference leaves the payload untouched when outside)."""
        orig_shape = x.shape
        xf = x.reshape(-1, 3)
        inside, _, _ = point_in_tets(xf, self.tet_verts)
        q, sqd, _, _ = nearest_surface(xf, self.tri_verts)
        d = jnp.where(inside, -jnp.sqrt(jnp.maximum(sqd, 0.0)), _BIG)
        return (d.reshape(orig_shape[:-1]),
                jnp.where(inside[:, None], q, xf).reshape(orig_shape))


class DynamicHit(NamedTuple):
    """Payload of a dynamic-collider hit (DynamicCollision::Payload,
    Collider.hpp:56-83)."""
    hit: jnp.ndarray        # (P,) bool
    face: jnp.ndarray       # (P,) rest-surface triangle index
    barys: jnp.ndarray      # (P, 3) barycentrics on that triangle
    normal: jnp.ndarray     # (P, 3) rest-pose face normal
    point: jnp.ndarray      # (P, 3) rest-pose surface point


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DynamicTetCollider:
    """Deforming tet-mesh collider (TetMeshCollision): rest-pose geometry is
    static; current vertex positions are passed per query."""

    tets: jnp.ndarray        # (T, 4) int32 (global vertex ids)
    faces: jnp.ndarray       # (S, 3) int32 rest surface triangles
    rest_verts: jnp.ndarray  # (V, 3) rest positions (local ids)
    vert_offset: int = dataclasses.field(metadata=dict(static=True), default=0)

    @classmethod
    def create(cls, verts, tets, vert_offset=0, dtype=np.float64):
        from ..core.factory import TetMeshData
        mesh = TetMeshData(verts=np.asarray(verts, dtype),
                           tets=np.asarray(tets, np.int32))
        return cls(tets=jnp.asarray(mesh.tets + vert_offset),
                   faces=jnp.asarray(mesh.surface_faces().astype(np.int32)),
                   rest_verts=jnp.asarray(mesh.verts),
                   vert_offset=vert_offset)

    def detect_with_overflow(self, queries, x_all, query_ids=None):
        """(DynamicHit, overflow () bool). The dense path is exact, so
        overflow is always False here; the spatial-hash subclass reports
        candidate-list truncation (see HashGridTetCollider)."""
        return (self.detect(queries, x_all, query_ids=query_ids),
                jnp.zeros((), bool))

    def detect(self, queries, x_all, query_ids=None) -> DynamicHit:
        """queries (P, 3) against the mesh deformed to x_all (n, 3).
        query_ids: global vertex ids of the queries — a query inside a tet
        containing its own vertex is skipped (skip_vert_idx,
        DynamicObject.hpp:75-77)."""
        tv = x_all[self.tets]                      # (T, 4, 3) deformed tets
        xq = queries[:, None, :]
        b = barycoords_tet(xq, tv[None, :, 0], tv[None, :, 1],
                           tv[None, :, 2], tv[None, :, 3])
        inside = jnp.all(b >= 0.0, axis=-1)        # (P, T)
        if query_ids is not None:
            own = jnp.any(self.tets[None, :, :] == query_ids[:, None, None],
                          axis=-1)                 # (P, T)
            inside = inside & ~own
        hit = jnp.any(inside, axis=1)
        first = jnp.argmax(inside, axis=1)
        barys4 = jnp.take_along_axis(b, first[:, None, None], axis=1)[:, 0]
        return self._hit_payload(queries, hit, first, barys4)

    def _hit_payload(self, queries, hit, first, barys4) -> DynamicHit:
        """Shared tail of detection: map the hit point to the rest pose via
        the containing tet's barycentrics, then find the nearest rest-pose
        surface triangle (DynamicObject.hpp:71-118)."""
        P = queries.shape[0]
        rest_tv = self.rest_verts[self.tets[first] - self.vert_offset]
        restx = jnp.einsum("pk,pkj->pj", barys4, rest_tv)
        tri = self.rest_verts[self.faces]          # (S, 3, 3)
        q, sqd, tri_idx, n = nearest_surface(restx, tri)
        # Orient outward: restx is interior, so the outward normal points
        # away from it (surface extraction does not guarantee orientation).
        flip = jnp.sum(n * (restx - q), -1) > 0
        n = jnp.where(flip[:, None], -n, n)
        tsel = tri[tri_idx]
        bar = _tri_barycentrics(q, tsel)
        zero = jnp.zeros((P, 3), queries.dtype)
        return DynamicHit(hit=hit, face=tri_idx,
                          barys=jnp.where(hit[:, None], bar, zero),
                          normal=jnp.where(hit[:, None], n, zero),
                          point=jnp.where(hit[:, None], q, queries))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HashGridTetCollider(DynamicTetCollider):  # noqa: D401
    """Spatial-hash accelerated TetMeshCollision.

    The reference rebuilds a BVH over the deformed tets every step and
    traverses it per query (DynamicObject.hpp:65-68) — a pointer-chasing
    structure with data-dependent depth, hostile to TPUs. The TPU-native
    replacement is a *sorted spatial hash*, rebuilt on device each call with
    fixed shapes:

      1. deformed tet centroids -> integer cells of side h = 1.05 x the
         largest deformed tet circumradius: a query inside a tet is within
         the circumradius of its centroid, so with h >= circumradius the
         centroid's cell is within the query's 3x3x3 cell neighborhood;
      2. cells hashed into 2^k buckets; tets sorted by bucket id;
      3. per query, the 27 neighbor buckets give candidate ranges via two
         searchsorted calls; up to ``cap`` candidates per bucket are gathered
         (hash collisions only add false candidates — the exact barycentric
         containment test filters them);
      4. the barycentric test runs on (P, 27*cap) candidates instead of
         (P, T): O(P) work per step instead of O(P*T).

    Matches DynamicTetCollider.detect exactly whenever no bucket overflows
    ``cap`` (the smallest containing tet index is selected, like the dense
    argmax); tested against the dense path in tests/test_collider.py.

    ``detect_with_overflow`` additionally returns a runtime overflow flag:
    True when any queried bucket range held more than ``cap`` candidates
    (contacts may have been silently dropped). Callers must escalate on
    overflow — PhysicsSolver grows ``cap`` and falls back to the exact
    dense collider (matching the exactness of the reference BVH,
    DynamicObject.hpp:65-118) rather than miss self-collisions.
    """

    n_buckets: int = dataclasses.field(metadata=dict(static=True),
                                       default=2048)
    cap: int = dataclasses.field(metadata=dict(static=True), default=8)

    @classmethod
    def create(cls, verts, tets, vert_offset=0, dtype=np.float64,
               n_buckets=2048, cap=8):
        base = DynamicTetCollider.create(verts, tets, vert_offset, dtype)
        return cls(tets=base.tets, faces=base.faces,
                   rest_verts=base.rest_verts, vert_offset=base.vert_offset,
                   n_buckets=n_buckets, cap=cap)

    def _hash_cells(self, cx, cy, cz):
        # Large-prime XOR hash (Teschner et al. 2003), power-of-two buckets.
        h = (cx * 73856093) ^ (cy * 19349663) ^ (cz * 83492791)
        return h & (self.n_buckets - 1)

    def max_bucket_load(self, x_all) -> int:
        """Largest number of tets sharing a hash bucket at positions x_all —
        must stay <= cap for exactness (use to size ``cap`` in tests/setup)."""
        tv = x_all[self.tets]
        centroid = jnp.mean(tv, axis=1)
        rad2 = jnp.max(jnp.sum((tv - centroid[:, None, :]) ** 2, -1), axis=1)
        h = 1.05 * jnp.sqrt(jnp.max(rad2)) + 1e-30
        tc = jnp.floor(centroid / h).astype(jnp.int32)
        th = self._hash_cells(tc[:, 0], tc[:, 1], tc[:, 2])
        return int(jnp.max(jnp.bincount(th, length=self.n_buckets)))

    def detect(self, queries, x_all, query_ids=None) -> DynamicHit:
        return self.detect_with_overflow(queries, x_all, query_ids)[0]

    def detect_with_overflow(self, queries, x_all, query_ids=None):
        tv = x_all[self.tets]                        # (T, 4, 3)
        T = tv.shape[0]
        centroid = jnp.mean(tv, axis=1)              # (T, 3)
        rad2 = jnp.max(jnp.sum((tv - centroid[:, None, :]) ** 2, -1), axis=1)
        h = 1.05 * jnp.sqrt(jnp.max(rad2)) + 1e-30   # dynamic cell size

        tc = jnp.floor(centroid / h).astype(jnp.int32)
        tet_hash = self._hash_cells(tc[:, 0], tc[:, 1], tc[:, 2])  # (T,)
        order = jnp.argsort(tet_hash)
        sorted_hash = tet_hash[order]

        qc = jnp.floor(queries / h).astype(jnp.int32)  # (P, 3)
        offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3),
                                      indexing="ij"), -1).reshape(27, 3)
        nbr = qc[:, None, :] + offs[None, :, :]        # (P, 27, 3)
        nh = self._hash_cells(nbr[..., 0], nbr[..., 1], nbr[..., 2])
        starts = jnp.searchsorted(sorted_hash, nh, side="left")   # (P, 27)
        ends = jnp.searchsorted(sorted_hash, nh, side="right")

        # Runtime exactness guard: a queried bucket range longer than cap
        # means candidates were dropped and contacts may be missed.
        overflow = jnp.any((ends - starts) > self.cap)

        slot = starts[..., None] + jnp.arange(self.cap)           # (P, 27, cap)
        valid = slot < ends[..., None]
        cand = order[jnp.clip(slot, 0, T - 1)]                    # (P, 27, cap)
        P = queries.shape[0]
        cand = cand.reshape(P, -1)
        valid = valid.reshape(P, -1)

        ctv = tv[cand]                                            # (P, C, 4, 3)
        b = barycoords_tet(queries[:, None, :], ctv[:, :, 0], ctv[:, :, 1],
                           ctv[:, :, 2], ctv[:, :, 3])            # (P, C, 4)
        inside = jnp.all(b >= 0.0, axis=-1) & valid
        if query_ids is not None:
            own = jnp.any(self.tets[cand] == query_ids[:, None, None],
                          axis=-1)
            inside = inside & ~own
        hit = jnp.any(inside, axis=1)
        # Deterministic pick matching the dense path: smallest tet index.
        pick_key = jnp.where(inside, cand, T)
        j = jnp.argmin(pick_key, axis=1)
        first = jnp.minimum(jnp.take_along_axis(pick_key, j[:, None],
                                                axis=1)[:, 0], T - 1)
        barys4 = jnp.take_along_axis(b, j[:, None, None], axis=1)[:, 0]
        return self._hit_payload(queries, hit, first, barys4), overflow


def _tri_barycentrics(p, tri):
    """Barycentric coords of p (P,3) on triangles tri (P,3,3)."""
    v0 = tri[:, 1] - tri[:, 0]
    v1 = tri[:, 2] - tri[:, 0]
    v2 = p - tri[:, 0]
    d00 = jnp.sum(v0 * v0, -1)
    d01 = jnp.sum(v0 * v1, -1)
    d11 = jnp.sum(v1 * v1, -1)
    d20 = jnp.sum(v2 * v0, -1)
    d21 = jnp.sum(v2 * v1, -1)
    denom = jnp.maximum(d00 * d11 - d01 * d01, 1e-300)
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    return jnp.stack([1.0 - v - w, v, w], axis=-1)


class PassiveHit(NamedTuple):
    hit: jnp.ndarray     # (P,) bool — penetrating some passive object
    dx: jnp.ndarray      # (P,) signed distance (min over objects)
    point: jnp.ndarray   # (P, 3) surface point


def detect(x, scene=None, mesh_sdfs=(), dynamic=(), query_ids=None):
    """Collider::detect (Collider.hpp:152-212): evaluate every vertex against
    all passive objects (analytic SDF scene + mesh obstacles) and dynamic
    colliders; fixed-shape masked outputs instead of hit buffers."""
    P = x.shape[0]
    best_d = jnp.full((P,), _BIG, x.dtype)
    best_p = x
    if scene is not None and scene.n_objects:
        d, p = scene.signed_distance(x)
        closer = d < best_d
        best_d = jnp.where(closer, d, best_d)
        best_p = jnp.where(closer[:, None], p, best_p)
    for m in mesh_sdfs:
        d, p = m.signed_distance(x)
        closer = d < best_d
        best_d = jnp.where(closer, d, best_d)
        best_p = jnp.where(closer[:, None], p, best_p)
    passive = PassiveHit(hit=best_d < 0, dx=best_d, point=best_p)
    dyn_hits = [dc.detect(x, x, query_ids=query_ids) for dc in dynamic]
    return passive, dyn_hits
