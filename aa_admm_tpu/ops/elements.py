"""Struct-of-arrays element batches: the TPU-native replacement for the
reference's per-element ``EnergyTerm`` virtual hierarchy
(admm_anderson_xzu/src/EnergyTerm.hpp:67-213).

One batch = all elements of one type/material, processed by a single fused
kernel. The sparse reduction matrix D never exists on device: ``deform``
computes D x as a gather + small matmul per element, and ``scatter`` applies
D^T via ``jax.ops.segment_sum`` (deterministic, bit-reproducible — the
functional replacement for the reference's OpenMP scatter loops).

z-block shape conventions — PLANE FORM (component-major, round 5): every
block flowing through the solvers is a rank-2 array (C, E) whose rows are
the C components of the per-element quantity, row-major over the logical
shape, and whose columns are the elements:
  tets  -> (9, E)   deformation gradient F = [x1-x0|x2-x0|x3-x0] B^-1,
           plane 3*i+j = F[i, j] (TetEnergyTerm::get_reduction,
           TetEnergyTerm.cpp:67-88)
  tris  -> (6, E)   3x2 deformation gradient in the 2D rest basis,
           plane 2*i+j = F[i, j] (TriEnergyTerm.cpp:30-71)
  pins/collisions -> (3, E) vertex positions (identity reduction,
           SpringEnergyTerm.hpp:60-65, CollisionEnergyTerm.hpp:72-77)

Why plane form: on TPU a materialized (E, 3, 3) array puts a size-3 axis
on the 128-wide lane dimension of the (8, 128) tile — ~40x memory
inflation for every loop-carried z/u buffer, plus relayout copies at
every fusion boundary (measured 24% of the plinkohit device step in r5
traces, see PERF.md). (C, E) keeps elements on lanes at full density, the
AA flatten is a free bitcast, and per-element weights broadcast natively
((C, E) * (E,)). The unrolled math in ops/mat3.py / ops/prox.py still
sees logical (E, *zdim) views via ``p2m``/``m2p`` — XLA fuses the
transposes into the surrounding elementwise work, so no (E, 3, 3) buffer
is ever materialized.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Lame
from . import mat3
from . import prox as proxops
from .sdf import SdfScene

_SQRT2 = float(np.sqrt(2.0))




from ._batchutil import _host_mirror, _static, hostarr  # noqa: F401 (re-export)


def m2p(a):
    """Logical (E, *zdim) -> plane form (C, E); C = prod(zdim) row-major.
    A logical transpose — fuses away inside elementwise chains."""
    return a.reshape(a.shape[0], -1).T


def p2m(p, zdim):
    """Plane form (C, E) -> logical (E, *zdim) view for ops/mat3-style
    unrolled math."""
    return p.T.reshape((p.shape[-1],) + tuple(zdim))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TetBatch:
    """All tets of one material. weight w = sqrt(k*vol) per element
    (TetEnergyTerm.cpp:63-64)."""

    tets: jnp.ndarray     # (E, 4) int32
    Dm_inv: jnp.ndarray   # (E, 3, 3) inverse rest-edge matrix
    vol: jnp.ndarray      # (E,)
    w: jnp.ndarray        # (E,)
    mu: jnp.ndarray       # (E,)
    lam: jnp.ndarray      # (E,)
    k: jnp.ndarray        # (E,) bulk modulus
    kind: str = _static(default="linear")   # linear | neohookean | stvk
    svd_method: str = _static(default="jacobi")

    zdim = (3, 3)

    @classmethod
    def from_mesh(cls, verts: np.ndarray, tets: np.ndarray, lame: Lame,
                  kind: str = "linear", dtype=np.float64,
                  svd_method: str = "jacobi") -> "TetBatch":
        v0 = verts[tets[:, 0]]
        edges = np.transpose(verts[tets[:, 1:]] - v0[:, None, :], (0, 2, 1))
        vol = np.linalg.det(edges) / 6.0
        if np.any(vol < 0):
            raise ValueError("TetBatch: inverted initial tet")
        Dm_inv = np.linalg.inv(edges)
        E = len(tets)
        k = np.full(E, lame.bulk_modulus, dtype)
        w = np.sqrt(k * vol)
        out = cls(
            tets=jnp.asarray(tets.astype(np.int32)),
            Dm_inv=jnp.asarray(Dm_inv.astype(dtype)),
            vol=jnp.asarray(vol.astype(dtype)),
            w=jnp.asarray(w.astype(dtype)),
            mu=jnp.asarray(np.full(E, lame.mu, dtype)),
            lam=jnp.asarray(np.full(E, lame.lam, dtype)),
            k=jnp.asarray(k),
            kind=kind,
            svd_method=svd_method,
        )
        return _host_mirror(out, tets=tets.astype(np.int32),
                            Dm_inv=Dm_inv.astype(np.float64),
                            w=w.astype(np.float64))

    def deform(self, x):
        """D x: per-element deformation gradient from positions x (n, 3),
        in plane form (9, E). F[i, j] = sum_k (x_{k+1} - x_0)[i] B[k, j] —
        the same unrolled sums as the old mat3.mmul path, built directly
        as planes so no (E, 3, 3) buffer materializes."""
        g = x[self.tets]                                   # (E, 4, 3)
        e = g[:, 1:] - g[:, :1]                            # (E, 3verts, 3coords)
        B = self.Dm_inv
        return jnp.stack([
            e[:, 0, i] * B[:, 0, j] + e[:, 1, i] * B[:, 1, j]
            + e[:, 2, i] * B[:, 2, j]
            for i in range(3) for j in range(3)])          # (9, E)

    def scatter(self, t, n_verts):
        """D^T t: adjoint of deform (t in plane form (9, E)), scattered to
        vertex space (n, 3). dE = t_mat B^T gives the per-edge gradients;
        vertex 0 receives -sum of the edge rows."""
        B = self.Dm_inv
        dE = [[t[3 * i + 0] * B[:, k, 0] + t[3 * i + 1] * B[:, k, 1]
               + t[3 * i + 2] * B[:, k, 2] for k in range(3)]
              for i in range(3)]                           # [coord i][edge k]
        v0 = [-(dE[i][0] + dE[i][1] + dE[i][2]) for i in range(3)]
        contrib = jnp.stack(
            [jnp.stack(v0, axis=-1)]
            + [jnp.stack([dE[0][k], dE[1][k], dE[2][k]], axis=-1)
               for k in range(3)], axis=1)                 # (E, 4, 3)
        return jax.ops.segment_sum(contrib.reshape(-1, 3), self.tets.reshape(-1),
                                   num_segments=n_verts)

    def prox(self, v):
        vm = p2m(v, self.zdim)
        if self.kind == "linear":
            out = proxops.prox_tet_linear(vm, self.mu, self.lam, self.k,
                                          self.svd_method)
        elif self.kind == "neohookean":
            out = proxops.prox_tet_neohookean(vm, self.mu, self.lam, self.k,
                                              self.svd_method)
        elif self.kind == "stvk":
            out = proxops.prox_tet_stvk(vm, self.mu, self.lam, self.k,
                                        self.svd_method)
        else:
            raise ValueError(self.kind)
        return m2p(out)

    def grad(self, z):
        """dU/dF * vol at z (EnergyTerm::get_all_gradient path)."""
        zm = p2m(z, self.zdim)
        if self.kind == "linear":
            out = proxops.grad_tet_linear(zm, self.mu, self.lam, self.k,
                                          self.vol, self.svd_method)
        elif self.kind == "neohookean":
            out = proxops.grad_tet_neohookean(zm, self.mu, self.lam, self.k,
                                              self.vol)
        elif self.kind == "stvk":
            out = proxops.grad_tet_stvk(zm, self.mu, self.lam, self.k, self.vol)
        else:
            raise ValueError(self.kind)
        return m2p(out)

    def energy(self, z):
        zm = p2m(z, self.zdim)
        if self.kind == "linear":
            return proxops.energy_tet_linear(zm, self.mu, self.lam, self.k,
                                             self.vol, self.svd_method)
        if self.kind == "neohookean":
            return proxops.energy_tet_neohookean(zm, self.mu, self.lam, self.k,
                                                 self.vol)
        if self.kind == "stvk":
            return proxops.energy_tet_stvk(zm, self.mu, self.lam, self.k,
                                           self.vol)
        raise ValueError(self.kind)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriBatch:
    """Cloth triangles; w = sqrt(k*area) (TriEnergyTerm.cpp:50-51)."""

    tris: jnp.ndarray      # (E, 3) int32
    rest_inv: jnp.ndarray  # (E, 2, 2)
    area: jnp.ndarray      # (E,)
    w: jnp.ndarray         # (E,)
    mu: jnp.ndarray
    lam: jnp.ndarray
    k: jnp.ndarray
    limit_min: jnp.ndarray
    limit_max: jnp.ndarray
    variant: str = _static(default="zxu")  # strain-limiting style: xzu | zxu

    zdim = (3, 2)

    @classmethod
    def from_mesh(cls, verts: np.ndarray, tris: np.ndarray, lame: Lame,
                  variant: str = "zxu", dtype=np.float64) -> "TriBatch":
        if lame.limit_min > 1.0:
            raise ValueError("TriBatch: strain limit min should be -inf to 1")
        if lame.limit_max < 1.0:
            raise ValueError("TriBatch: strain limit max should be 1 to inf")
        e12 = verts[tris[:, 1]] - verts[tris[:, 0]]
        e13 = verts[tris[:, 2]] - verts[tris[:, 0]]
        n1 = e12 / np.linalg.norm(e12, axis=-1, keepdims=True)
        t = e13 - np.sum(e13 * n1, axis=-1, keepdims=True) * n1
        n2 = t / np.linalg.norm(t, axis=-1, keepdims=True)
        basis = np.stack([n1, n2], axis=-1)                  # (E, 3, 2)
        edges = np.stack([e12, e13], axis=-1)                # (E, 3, 2)
        rest = np.einsum("eji,ejk->eik", basis, edges)       # (E, 2, 2)
        area = 0.5 * np.linalg.det(rest)
        if np.any(area < 0):
            raise ValueError("TriBatch: inverted initial pose")
        rest_inv = np.linalg.inv(rest)
        E = len(tris)
        k = np.full(E, lame.bulk_modulus, dtype)
        w = np.sqrt(k * area)
        out = cls(
            tris=jnp.asarray(tris.astype(np.int32)),
            rest_inv=jnp.asarray(rest_inv.astype(dtype)),
            area=jnp.asarray(area.astype(dtype)),
            w=jnp.asarray(w.astype(dtype)),
            mu=jnp.asarray(np.full(E, lame.mu, dtype)),
            lam=jnp.asarray(np.full(E, lame.lam, dtype)),
            k=jnp.asarray(k),
            limit_min=jnp.asarray(np.full(E, lame.limit_min, dtype)),
            limit_max=jnp.asarray(np.full(E, lame.limit_max, dtype)),
            variant=variant,
        )
        return _host_mirror(out, tris=tris.astype(np.int32),
                            rest_inv=rest_inv.astype(np.float64),
                            w=w.astype(np.float64))

    def deform(self, x):
        """D x in plane form (6, E): F[i, j] = sum_k e_k[i] R[k, j]."""
        g = x[self.tris]                                    # (E, 3, 3)
        e = g[:, 1:] - g[:, :1]                             # (E, 2edges, 3coords)
        R = self.rest_inv
        return jnp.stack([
            e[:, 0, i] * R[:, 0, j] + e[:, 1, i] * R[:, 1, j]
            for i in range(3) for j in range(2)])           # (6, E)

    def scatter(self, t, n_verts):
        """Adjoint of deform (t plane form (6, E)) -> vertex space (n, 3)."""
        R = self.rest_inv
        dE = [[t[2 * i + 0] * R[:, k, 0] + t[2 * i + 1] * R[:, k, 1]
               for k in range(2)] for i in range(3)]        # [coord i][edge k]
        v0 = [-(dE[i][0] + dE[i][1]) for i in range(3)]
        contrib = jnp.stack(
            [jnp.stack(v0, axis=-1)]
            + [jnp.stack([dE[0][k], dE[1][k], dE[2][k]], axis=-1)
               for k in range(2)], axis=1)                  # (E, 3, 3)
        return jax.ops.segment_sum(contrib.reshape(-1, 3), self.tris.reshape(-1),
                                   num_segments=n_verts)

    def prox(self, v):
        vm = p2m(v, self.zdim)
        if self.variant == "zxu":
            out = proxops.prox_tri_zxu(vm, self.limit_min, self.limit_max)
        else:
            out = proxops.prox_tri_xzu(vm, self.limit_min, self.limit_max)
        return m2p(out)

    def grad(self, z):
        return m2p(proxops.grad_tri(p2m(z, self.zdim), self.mu, self.lam,
                                    self.k, self.area))

    def energy(self, z):
        return proxops.energy_tri(p2m(z, self.zdim), self.mu, self.lam,
                                  self.k, self.area)

    def strain_violation(self, z):
        return proxops.strain_limit_violation(p2m(z, self.zdim),
                                              self.limit_min, self.limit_max)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PinBatch:
    """Spring pins: identity reduction on a vertex; prox snaps to the target.
    weight = sqrt(2*bulk(rubber)) (SpringEnergyTerm.hpp:53-57)."""

    idx: jnp.ndarray      # (E,) int32
    target: jnp.ndarray   # (E, 3)
    active: jnp.ndarray   # (E,) bool
    w: jnp.ndarray        # (E,)

    zdim = (3,)

    @classmethod
    def create(cls, idx, targets, dtype=np.float64) -> "PinBatch":
        E = len(idx)
        w = np.full(E, np.sqrt(Lame.rubber().bulk_modulus * 2.0), dtype)
        idx_h = np.asarray(idx, np.int32)
        out = cls(idx=jnp.asarray(idx_h),
                  target=jnp.asarray(np.asarray(targets, dtype).reshape(E, 3)),
                  active=jnp.ones((E,), bool),
                  w=jnp.asarray(w))
        return _host_mirror(out, idx=idx_h, w=w)

    def deform(self, x):
        return x[self.idx].T                               # (3, E)

    def scatter(self, t, n_verts):
        return jax.ops.segment_sum(t.T, self.idx, num_segments=n_verts)

    def prox(self, v):
        return proxops.prox_pin(v.T, self.target, self.active).T

    def grad(self, z):
        return jnp.zeros_like(z)

    def energy(self, z):
        return jnp.zeros(z.shape[-1], z.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CollisionBatch:
    """Per-vertex hard-collision terms (zxu Collision energy,
    CollisionEnergyTerm.hpp:41-117): identity reduction, prox snaps to the
    nearest penetrating passive collider (analytic SDFs and/or tet-mesh
    obstacles); weight = sqrt(2*bulk(soft_rubber))."""

    idx: jnp.ndarray      # (E,) int32
    active: jnp.ndarray   # (E,) bool
    w: jnp.ndarray        # (E,)
    scene: SdfScene
    mesh_sdfs: tuple = ()

    zdim = (3,)

    @classmethod
    def create(cls, idx, scene: SdfScene, mesh_sdfs=(),
               dtype=np.float64) -> "CollisionBatch":
        E = len(idx)
        w = np.full(E, np.sqrt(Lame.soft_rubber().bulk_modulus * 2.0), dtype)
        idx_h = np.asarray(idx, np.int32)
        out = cls(idx=jnp.asarray(idx_h),
                  active=jnp.ones((E,), bool),
                  w=jnp.asarray(w), scene=scene, mesh_sdfs=tuple(mesh_sdfs))
        return _host_mirror(out, idx=idx_h, w=w)

    def deform(self, x):
        return x[self.idx].T                               # (3, E)

    def scatter(self, t, n_verts):
        return jax.ops.segment_sum(t.T, self.idx, num_segments=n_verts)

    def prox(self, v):
        return proxops.prox_collision(v.T, self.scene, self.active,
                                      self.mesh_sdfs).T

    def grad(self, z):
        return jnp.zeros_like(z)

    def energy(self, z):
        return jnp.zeros(z.shape[-1], z.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SelfCollisionBatch:
    """Per-vertex self-collision terms — the TPU-native counterpart of the
    reference's dynamic TetMeshCollision path (DynamicObject.hpp:30-120 +
    the per-vertex collision-energy treatment of CollisionEnergyTerm.hpp).

    The reference rebuilds a BVH per step and (in the vestigial ConstraintSet
    path) converts hits into linear constraints; here detection runs once per
    timestep on the predicted positions via ``HashGridTetCollider`` (see
    PhysicsSolver.step), and the resulting contact (surface point + outward
    normal in the *deformed* pose) is frozen for the step's ADMM iterations:
    the prox snaps a candidate z to the contact point whenever it lies on the
    penetrating side of the frozen contact plane. Identity reduction; weight
    sqrt(2*bulk(soft_rubber)) like the passive collision terms
    (CollisionEnergyTerm.hpp:63-70).
    """

    idx: jnp.ndarray     # (E,) int32 — candidate vertices (usually all)
    w: jnp.ndarray       # (E,)
    active: jnp.ndarray  # (E,) bool — refreshed per step
    target: jnp.ndarray  # (E, 3) deformed contact point, per step
    normal: jnp.ndarray  # (E, 3) deformed outward normal, per step

    zdim = (3,)

    @classmethod
    def create(cls, idx, dtype=np.float64) -> "SelfCollisionBatch":
        E = len(idx)
        w = np.full(E, np.sqrt(Lame.soft_rubber().bulk_modulus * 2.0), dtype)
        idx_h = np.asarray(idx, np.int32)
        out = cls(idx=jnp.asarray(idx_h), w=jnp.asarray(w),
                  active=jnp.zeros((E,), bool),
                  target=jnp.zeros((E, 3), dtype),
                  normal=jnp.zeros((E, 3), dtype))
        return _host_mirror(out, idx=idx_h, w=w)

    def deform(self, x):
        return x[self.idx].T                               # (3, E)

    def scatter(self, t, n_verts):
        return jax.ops.segment_sum(t.T, self.idx, num_segments=n_verts)

    def prox(self, v):
        vm = v.T
        pen = jnp.sum((vm - self.target) * self.normal, axis=-1) < 0.0
        hit = self.active & pen
        return jnp.where(hit[..., None], self.target, vm).T

    def grad(self, z):
        return jnp.zeros_like(z)

    def energy(self, z):
        return jnp.zeros(z.shape[-1], z.dtype)


def wexpand(batch, a):
    """Broadcast per-element weights onto a plane-form (C, E) z-block:
    (E,) already aligns with the trailing element axis."""
    return batch.w


def block_sqnorm(a):
    return jnp.sum(a * a)
