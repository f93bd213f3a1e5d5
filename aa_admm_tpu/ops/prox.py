"""Batched proximal operators and energy gradients for all material models.

Replaces the per-element virtual ``EnergyTerm::prox`` calls of the reference
(TetEnergyTerm.cpp:101-123 linear; :171-183 hyperelastic via 9-dim LBFGS;
TriEnergyTerm.cpp:74-105 cloth) with fully batched, branch-free functions.

The hyperelastic prox (NeoHookean / StVK) exploits isotropy: the minimizer of
``psi(F) + (k/2)||F - v||^2`` shares singular vectors with ``v``, so the
9-dimensional LBFGS of the reference collapses to a 3-dimensional safeguarded
Newton on singular values — a fixed-iteration, divergence-free computation
that vectorizes across the whole element batch on the VPU.

All functions operate on matrices shaped (..., 3, 3) or (..., 3, 2); the
penalty coefficient ``k`` is the material bulk modulus (the reference sets
w^2 = k*vol so the ADMM quadratic coefficient equals k; NHProx/StVKProx use
``k = lame.bulk_modulus()`` directly, TetEnergyTerm.hpp:141-147).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import mat3
from .svd3 import svd3x3, svd3x2

_NEWTON_ITERS = 12


# ----------------------------------------------------------------------------
# Linear (corotated) tet — TetEnergyTerm
# ----------------------------------------------------------------------------

def prox_tet_linear(v, mu, lam, k, svd_method: str = "jacobi"):
    """zi = 0.5 * (P + v) with P = U diag(1,1,s) V^T, s=-1 iff det(v) < 1e-16
    (TetEnergyTerm::prox, TetEnergyTerm.cpp:101-123; exact because w^2=k*vol).
    """
    del mu, lam, k
    U, S, V = svd3x3(v, method=svd_method)
    s3 = jnp.where(mat3.det(v) < 1e-16, -1.0, 1.0)
    sig = jnp.stack([jnp.ones_like(s3), jnp.ones_like(s3), s3], axis=-1)
    P = mat3.usv(U, sig, V)
    return 0.5 * (P + v)


def grad_tet_linear(z, mu, lam, k, vol, svd_method: str = "jacobi"):
    """k*vol*(F - U V^T) (TetEnergyTerm::get_gradient, TetEnergyTerm.cpp:156-165)."""
    del mu, lam
    U, _, V = svd3x3(z, method=svd_method)
    R = mat3.mmult(U, V)
    return (k * vol)[..., None, None] * (z - R)


def energy_tet_linear(z, mu, lam, k, vol, svd_method: str = "jacobi"):
    """0.5*k*vol*||sigma - 1||^2 (TetEnergyTerm::energyLBFGS, cpp:135-142)."""
    del mu, lam
    _, S, _ = svd3x3(z, method=svd_method)
    return 0.5 * k * vol * jnp.sum((S - 1.0) ** 2, axis=-1)


# ----------------------------------------------------------------------------
# Hyperelastic tets — singular-value Newton prox
# ----------------------------------------------------------------------------

def _signed_svd3x3(F, svd_method):
    """SVD with the invertible-elasticity convention: sigma_3 carries the sign
    of det(F) and the last column of U is flipped accordingly (same convention
    as FastSVD::signed_svd, admm_anderson_xzu/src/FastSVD.hpp:37-62)."""
    U, S, V = svd3x3(F, method=svd_method)
    detU = mat3.det(U)
    detV = mat3.det(V)
    # Make V a rotation by flipping its last column; compensate in sigma.
    V = V.at[..., :, 2].multiply(detV[..., None])
    U = U.at[..., :, 2].multiply(detU[..., None])
    S = S.at[..., 2].multiply(detU * detV)
    return U, S, V


def _nh_grad_hess(s, sv, mu, lam, k):
    """Gradient/Hessian of 0.5*mu*(|s|^2 - 2log|J| - 3) + 0.5*lam*log^2|J|
    + 0.5*k*|s - sv|^2 in singular-value space."""
    eps = 1e-12
    s_safe = jnp.where(jnp.abs(s) < eps, jnp.sign(s) * eps + (s == 0) * eps, s)
    inv = 1.0 / s_safe
    J = s_safe[..., 0] * s_safe[..., 1] * s_safe[..., 2]
    L = jnp.log(jnp.abs(J))
    g = (mu[..., None] * (s - inv)
         + lam[..., None] * L[..., None] * inv
         + k[..., None] * (s - sv))
    diag = (mu[..., None] * (1.0 + inv * inv)
            - lam[..., None] * L[..., None] * inv * inv
            + k[..., None])
    H = lam[..., None, None] * inv[..., :, None] * inv[..., None, :]
    H = H + jnp.zeros_like(H).at[..., 0, 0].set(diag[..., 0]) \
                             .at[..., 1, 1].set(diag[..., 1]) \
                             .at[..., 2, 2].set(diag[..., 2])
    return g, H


def _stvk_grad_hess(s, sv, mu, lam, k):
    """Gradient/Hessian of mu*sum(e_i^2) + 0.5*lam*(tr e)^2 + 0.5*k*|s-sv|^2
    with e_i = 0.5*(s_i^2 - 1)."""
    e = 0.5 * (s * s - 1.0)
    tre = jnp.sum(e, axis=-1, keepdims=True)
    g = (2.0 * mu[..., None] * e + lam[..., None] * tre) * s + k[..., None] * (s - sv)
    diag = 2.0 * mu[..., None] * e + lam[..., None] * tre + k[..., None]
    H = (lam[..., None, None]
         * s[..., :, None] * s[..., None, :])
    H = H + 2.0 * mu[..., None, None] * (s[..., :, None] * s[..., None, :]) * jnp.eye(3, dtype=s.dtype)
    H = H + jnp.zeros_like(H).at[..., 0, 0].set(diag[..., 0]) \
                             .at[..., 1, 1].set(diag[..., 1]) \
                             .at[..., 2, 2].set(diag[..., 2])
    return g, H


def _nh_value(s, sv, mu, lam, k):
    eps = 1e-300
    J = jnp.abs(s[..., 0] * s[..., 1] * s[..., 2])
    L = jnp.log(jnp.maximum(J, eps))
    return (0.5 * mu * (jnp.sum(s * s, axis=-1) - 2.0 * L - 3.0)
            + 0.5 * lam * L * L
            + 0.5 * k * jnp.sum((s - sv) ** 2, axis=-1))


def _stvk_value(s, sv, mu, lam, k):
    e = 0.5 * (s * s - 1.0)
    return (mu * jnp.sum(e * e, axis=-1) + 0.5 * lam * jnp.sum(e, axis=-1) ** 2
            + 0.5 * k * jnp.sum((s - sv) ** 2, axis=-1))


def _sigma_newton(sv, mu, lam, k, grad_hess, value, iters=_NEWTON_ITERS):
    """Backtracking-damped Newton on singular values, fixed iteration count.

    Replaces mcl::optlib::LBFGS<double,9> (LBFGS.hpp:80-120) with a
    vectorized solver free of data-dependent control flow."""
    s = sv

    def body(s, _):
        g, H = grad_hess(s, sv, mu, lam, k)
        # Levenberg damping keeps H PD far from the optimum.
        lam_reg = 1e-9 * jnp.maximum(1.0, jnp.abs(mat3.trace(H)))
        Hd = H + lam_reg[..., None, None] * jnp.eye(3, dtype=s.dtype)
        step = mat3.solve(Hd, g)
        f0 = value(s, sv, mu, lam, k)
        # Backtracking over fixed candidate step scales (branch-free select).
        best_s, best_f = s, f0
        for alpha in (1.0, 0.5, 0.25, 0.0625):
            cand = s - alpha * step
            fc = value(cand, sv, mu, lam, k)
            ok = jnp.isfinite(fc) & (fc < best_f)
            best_s = jnp.where(ok[..., None], cand, best_s)
            best_f = jnp.where(ok, fc, best_f)
        return best_s, None

    # Measured both ways on the v5e (r5): the scanned loop's ~8 tiny
    # kernels x 12 trips cost ~4 ms of the beams 100-iteration step, but
    # STATICALLY UNROLLING is worse (beams device step 41.6 -> 50.9 ms) —
    # the 12x-replicated Newton body defeats XLA's fusion grouping and
    # inflates the local phase 1.5x. Keep the scan.
    s, _ = jax.lax.scan(body, s, None, length=iters)
    return s


def prox_tet_neohookean(v, mu, lam, k, svd_method: str = "jacobi"):
    """argmin_F  psi_NH(F) + (k/2)||F - v||^2 via singular-value Newton
    (NeoHookeanTet::NHProx, TetEnergyTerm.cpp:221-267)."""
    U, S, V = _signed_svd3x3(v, svd_method)
    s = _sigma_newton(S, mu, lam, k, _nh_grad_hess, _nh_value)
    return mat3.usv(U, s, V)


def prox_tet_stvk(v, mu, lam, k, svd_method: str = "jacobi"):
    """argmin_F  psi_StVK(F) + (k/2)||F - v||^2 via singular-value Newton
    (StVKTet::StVKProx, TetEnergyTerm.cpp:272-319)."""
    U, S, V = _signed_svd3x3(v, svd_method)
    s = _sigma_newton(S, mu, lam, k, _stvk_grad_hess, _stvk_value)
    return mat3.usv(U, s, V)


def grad_tet_neohookean(z, mu, lam, k, vol):
    """vol * (mu*(F - F^-T) + lam*log(J)*F^-T)
    (NHProx::U_gradient, TetEnergyTerm.cpp:262-267, scaled by vol as in
    HyperElasticTet::get_gradient, cpp:204-215)."""
    del k
    J = mat3.det(z)
    FinvT = jnp.swapaxes(mat3.adjugate(z), -1, -2) / jnp.where(
        J == 0, 1e-300, J)[..., None, None]
    logJ = jnp.log(jnp.maximum(J, 1e-300))
    G = mu[..., None, None] * (z - FinvT) + (lam * logJ)[..., None, None] * FinvT
    return vol[..., None, None] * G


def grad_tet_stvk(z, mu, lam, k, vol):
    """vol * F (2 mu E + lam tr(E) I), E = (F^T F - I)/2
    (StVKProx::U_gradient, TetEnergyTerm.cpp:313-319)."""
    del k
    I = jnp.eye(3, dtype=z.dtype)
    E = 0.5 * (mat3.mtmul(z, z) - I)
    trE = mat3.trace(E)
    G = mat3.mmul(z, 2.0 * mu[..., None, None] * E
                  + (lam * trE)[..., None, None] * I)
    return vol[..., None, None] * G


def energy_tet_neohookean(z, mu, lam, k, vol):
    """vol * psi_NH (NHProx::energy_density, TetEnergyTerm.cpp:221-237)."""
    del k
    J = mat3.det(z)
    I1 = mat3.frob2(z)
    logI3 = jnp.log(jnp.maximum(J * J, 1e-300))
    return vol * (0.5 * mu * (I1 - logI3 - 3.0) + 0.125 * lam * logI3 * logI3)


def energy_tet_stvk(z, mu, lam, k, vol):
    del k
    I = jnp.eye(3, dtype=z.dtype)
    E = 0.5 * (mat3.mtmul(z, z) - I)
    trE = mat3.trace(E)
    return vol * (mu * mat3.frob2(E) + 0.5 * lam * trE * trE)


# ----------------------------------------------------------------------------
# Triangle (cloth) energy — TriEnergyTerm, both strain-limiting styles
# ----------------------------------------------------------------------------

def prox_tri_zxu(v, limit_min, limit_max):
    """3x2 SVD; averaged singular values clamped into [limit_min, limit_max],
    rebuild U Sigma V^T (zxu TriEnergyTerm::prox, TriEnergyTerm.cpp:74-105)."""
    U, S, V = svd3x2(v)
    sig = 0.5 * (1.0 + S)
    check = (limit_min > 0.0) | (limit_max < 99.0)
    clamped = jnp.clip(sig, limit_min[..., None], limit_max[..., None])
    sig = jnp.where(check[..., None], clamped, sig)
    return mat3.usv32(U, sig, V)


def prox_tri_xzu(v, limit_min, limit_max):
    """xzu variant: project singular values toward 1 (average), then clamp the
    *column norms* of z (admm_anderson_xzu/src/TriEnergyTerm.cpp:67-105)."""
    U, S, V = svd3x2(v)
    sig = 0.5 * (1.0 + S)
    z = mat3.usv32(U, sig, V)
    check = (limit_min > 0.0) | (limit_max < 99.0)
    norms = jnp.linalg.norm(z, axis=-2, keepdims=True)  # per-column
    scale = jnp.clip(norms, limit_min[..., None, None],
                     limit_max[..., None, None]) / jnp.maximum(norms, 1e-300)
    return jnp.where(check[..., None, None], z * scale, z)


def strain_limit_violation(v, limit_min, limit_max):
    """Sum of singular-value excursions outside [limit_min, limit_max]
    (TriEnergyTerm::prox_for_strain_limiting_energy, zxu cpp:107-132)."""
    _, S, _ = svd3x2(v)
    sig = 0.5 * (1.0 + S)
    check = (limit_min > 0.0) | (limit_max < 99.0)
    under = jnp.maximum(limit_min[..., None] - sig, 0.0)
    over = jnp.maximum(sig - limit_max[..., None], 0.0)
    return jnp.where(check, jnp.sum(under + over, axis=-1), 0.0)


def grad_tri(z, mu, lam, k, area):
    """k*area*(F - U S* V^T) with S* the identity-projected signature — the
    cloth analogue of the linear-tet gradient."""
    del mu, lam
    U, _, V = svd3x2(z)
    P = mat3.mmult32(U, V)
    return (k * area)[..., None, None] * (z - P)


def energy_tri(z, mu, lam, k, area):
    """0.5*k*area*||F - UV^T||^2 (TriEnergyTerm::energy, zxu cpp:134-144)."""
    del mu, lam
    U, _, V = svd3x2(z)
    P = mat3.mmult32(U, V)
    return 0.5 * k * area * jnp.sum((z - P) ** 2, axis=(-2, -1))


# ----------------------------------------------------------------------------
# Pins and collisions (3-dim z blocks)
# ----------------------------------------------------------------------------

def prox_pin(v, pin_pos, active):
    """SpringPin::prox — snap z to the pin when active (SpringEnergyTerm.hpp:67-71)."""
    return jnp.where(active[..., None], pin_pos, v)


def prox_collision(v, sdf_scene, active, mesh_sdfs=()):
    """Collision::prox — snap z to the surface point of the nearest
    penetrating passive collider (analytic SDFs and/or mesh obstacles,
    CollisionEnergyTerm.hpp:79-91: all passive_objs are folded by min
    distance)."""
    d, point = sdf_scene.signed_distance(v)
    for m in mesh_sdfs:
        dm, pm = m.signed_distance(v)
        closer = dm < d
        d = jnp.where(closer, dm, d)
        point = jnp.where(closer[..., None], pm, point)
    hit = active & (d < 0.0)
    return jnp.where(hit[..., None], point, v)
