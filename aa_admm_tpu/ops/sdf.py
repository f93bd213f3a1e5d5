"""Analytic signed-distance colliders, batched over query points.

Equivalents of the reference passive colliders
(admm_anderson_hard_zxu/src/PassiveObject.hpp:30-140): Floor, SlideFloor,
Sphere, PlaneAndHalfSphere (plinkohit), Cylinder (plinkopony). The reference
folds multiple colliders by keeping the minimum signed distance
(each ``signed_distance`` overwrites the payload only when closer); here the
scene is a fixed-shape struct-of-arrays and the min-reduction is vectorized.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e16


def _floor_sd(x, y0):
    d = x[..., 1] - y0
    p = jnp.stack([x[..., 0], jnp.broadcast_to(y0, x[..., 0].shape), x[..., 2]], axis=-1)
    return d, p


def _slide_floor_sd(x, center, normal):
    d = jnp.einsum("...i,i->...", x - center, normal)
    p = x - d[..., None] * normal
    return d, p


def _sphere_sd(x, center, rad):
    dir_ = x - center
    n = jnp.linalg.norm(dir_, axis=-1)
    d = n - rad
    unit = dir_ / jnp.maximum(n, 1e-300)[..., None]
    p = center + unit * rad
    return d, p


def _plane_half_sphere_sd(x, center, rad):
    """PlaneAndHalfSphere::signed_distance (PassiveObject.hpp:82-116):
    outside the cylinder of radius rad -> plane at center.y; inside -> a
    half-sphere bump (distance measured to the sphere surface, with the
    above-plane case treated as norm+rad)."""
    proj = jnp.stack([x[..., 0] - center[0],
                      jnp.zeros_like(x[..., 0]),
                      x[..., 2] - center[2]], axis=-1)
    dc = jnp.linalg.norm(proj, axis=-1) - rad
    # Plane branch
    d_plane = x[..., 1] - center[1]
    p_plane = jnp.stack([x[..., 0],
                         jnp.broadcast_to(center[1], x[..., 0].shape),
                         x[..., 2]], axis=-1)
    # Half-sphere branch
    dir_ = x - center
    n = jnp.linalg.norm(dir_, axis=-1)
    d_hs = jnp.where(d_plane > 0, n + rad, rad - n)
    unit = dir_ / jnp.maximum(n, 1e-300)[..., None]
    p_hs = center + unit * rad
    outside = dc > 0
    return (jnp.where(outside, d_plane, d_hs),
            jnp.where(outside[..., None], p_plane, p_hs))


def _cylinder_sd(x, center, rad):
    """Cylinder along z (Cylinder::signed_distance, PassiveObject.hpp:118-136)."""
    posxy = jnp.stack([x[..., 0], x[..., 1], jnp.zeros_like(x[..., 0])], axis=-1)
    dir_ = posxy - center
    n = jnp.linalg.norm(dir_, axis=-1)
    d = n - rad
    unit = dir_ / jnp.maximum(n, 1e-300)[..., None]
    p = center + unit * rad
    p = p.at[..., 2].set(x[..., 2])
    return d, p


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SdfScene:
    """Fixed collection of analytic colliders; empty arrays mean 'none'."""

    floor_y: jnp.ndarray            # (Nf,)
    slide_center: jnp.ndarray       # (Ns, 3)
    slide_normal: jnp.ndarray       # (Ns, 3) unit
    sphere_center: jnp.ndarray      # (Nsp, 3)
    sphere_rad: jnp.ndarray         # (Nsp,)
    phs_center: jnp.ndarray         # (Nph, 3)  plane+half-sphere
    phs_rad: jnp.ndarray            # (Nph,)
    cyl_center: jnp.ndarray         # (Nc, 3)
    cyl_rad: jnp.ndarray            # (Nc,)

    @classmethod
    def empty(cls, dtype=jnp.float64) -> "SdfScene":
        z3 = jnp.zeros((0, 3), dtype)
        z1 = jnp.zeros((0,), dtype)
        return cls(z1, z3, z3, z3, z1, z3, z1, z3, z1)

    @property
    def n_objects(self) -> int:
        return (self.floor_y.shape[0] + self.slide_center.shape[0]
                + self.sphere_center.shape[0] + self.phs_center.shape[0]
                + self.cyl_center.shape[0])

    def signed_distance(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Min signed distance and its surface point over all colliders.

        x: (..., 3). Returns (d (...,), point (..., 3))."""
        best_d = jnp.full(x.shape[:-1], _BIG, x.dtype)
        best_p = x

        def fold(best, ds, ps):
            bd, bp = best
            closer = ds < bd
            return jnp.where(closer, ds, bd), jnp.where(closer[..., None], ps, bp)

        for i in range(self.floor_y.shape[0]):
            best_d, best_p = fold((best_d, best_p), *_floor_sd(x, self.floor_y[i]))
        for i in range(self.slide_center.shape[0]):
            best_d, best_p = fold((best_d, best_p),
                                  *_slide_floor_sd(x, self.slide_center[i],
                                                   self.slide_normal[i]))
        for i in range(self.sphere_center.shape[0]):
            best_d, best_p = fold((best_d, best_p),
                                  *_sphere_sd(x, self.sphere_center[i],
                                              self.sphere_rad[i]))
        for i in range(self.phs_center.shape[0]):
            best_d, best_p = fold((best_d, best_p),
                                  *_plane_half_sphere_sd(x, self.phs_center[i],
                                                         self.phs_rad[i]))
        for i in range(self.cyl_center.shape[0]):
            best_d, best_p = fold((best_d, best_p),
                                  *_cylinder_sd(x, self.cyl_center[i],
                                                self.cyl_rad[i]))
        return best_d, best_p


class SdfSceneBuilder:
    """Host-side accumulator mirroring Solver::add_obstacle."""

    def __init__(self, dtype=np.float64):
        self.dtype = dtype
        self.floors, self.slides, self.spheres = [], [], []
        self.phs, self.cyls = [], []

    def add_floor(self, y):
        self.floors.append(float(y)); return self

    def add_slide_floor(self, center, normal):
        n = np.asarray(normal, self.dtype)
        self.slides.append((np.asarray(center, self.dtype), n / np.linalg.norm(n)))
        return self

    def add_sphere(self, center, rad):
        self.spheres.append((np.asarray(center, self.dtype), float(rad))); return self

    def add_plane_half_sphere(self, center, rad):
        self.phs.append((np.asarray(center, self.dtype), float(rad))); return self

    def add_cylinder(self, center, rad):
        self.cyls.append((np.asarray(center, self.dtype), float(rad))); return self

    def build(self, dtype=None) -> SdfScene:
        dt = self.dtype if dtype is None else np.dtype(dtype)

        def arr3(items):
            return jnp.asarray(np.asarray([c for c, _ in items], dt).reshape(-1, 3))

        def arr1(items):
            return jnp.asarray(np.asarray([r for _, r in items], dt))

        return SdfScene(
            floor_y=jnp.asarray(np.asarray(self.floors, dt)),
            slide_center=arr3(self.slides) if self.slides else jnp.zeros((0, 3), dt),
            slide_normal=(jnp.asarray(np.asarray([n for _, n in self.slides], dt))
                          if self.slides else jnp.zeros((0, 3), dt)),
            sphere_center=arr3(self.spheres) if self.spheres else jnp.zeros((0, 3), dt),
            sphere_rad=arr1(self.spheres) if self.spheres else jnp.zeros((0,), dt),
            phs_center=arr3(self.phs) if self.phs else jnp.zeros((0, 3), dt),
            phs_rad=arr1(self.phs) if self.phs else jnp.zeros((0,), dt),
            cyl_center=arr3(self.cyls) if self.cyls else jnp.zeros((0, 3), dt),
            cyl_rad=arr1(self.cyls) if self.cyls else jnp.zeros((0,), dt),
        )
