"""Batched small-matrix SVD kernels (3x3 and 3x2), TPU-first.

The reference calls Eigen::JacobiSVD per element inside OpenMP loops
(TetEnergyTerm.cpp:101-123, TriEnergyTerm.cpp:74-105) and vendors the McAdams
branch-free SSE kernel (igl/Singular_Value_Decomposition_Main_Kernel_Body.hpp).
Here the whole element batch is one fused vectorized computation: a cyclic
Jacobi eigendecomposition of F^T F (fixed sweep count, branch-free — maps onto
the VPU with no per-element control flow), followed by a safeguarded recovery
of U. ``method='lapack'`` falls back to jnp.linalg.svd for f64 validation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_JACOBI_SWEEPS = 6  # cyclic sweeps; 3-4 converges for well-conditioned F, 6 is safe


def _jacobi_rotation(app, aqq, apq):
    """Stable Jacobi rotation (c, s) zeroing A[p,q]; branch-free."""
    # tau = (aqq - app) / (2 apq); t = sign(tau)/(|tau| + sqrt(1+tau^2))
    small = jnp.asarray(1e-300, app.dtype) if app.dtype == jnp.float64 else jnp.asarray(1e-30, app.dtype)
    denom = 2.0 * apq
    tau = (aqq - app) / jnp.where(jnp.abs(denom) < small, small, denom)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.abs(apq) < small, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    return c, s


def _apply_jacobi(A, V, p, q):
    """One Jacobi rotation on symmetric A (batch..., 3, 3), accumulated into V."""
    c, s = _jacobi_rotation(A[..., p, p], A[..., q, q], A[..., p, q])
    # Build the Givens rotation J (identity except rows/cols p,q).
    J = jnp.zeros_like(A).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(1.0)
    J = J.at[..., p, p].set(c).at[..., q, q].set(c)
    J = J.at[..., p, q].set(s).at[..., q, p].set(-s)
    A = jnp.einsum("...ji,...jk,...kl->...il", J, A, J)
    V = jnp.einsum("...ij,...jk->...ik", V, J)
    return A, V


def eigh3x3(A, sweeps: int = _JACOBI_SWEEPS):
    """Eigendecomposition of symmetric 3x3 batch via cyclic Jacobi.

    Returns (eigvals (...,3), V (...,3,3)) unsorted."""
    V = jnp.zeros_like(A).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(1.0)
    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            A, V = _apply_jacobi(A, V, p, q)
    w = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    return w, V


def _sort_desc3(w, V):
    order = jnp.argsort(-w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def _orthonormal_u(F, V, S):
    """Recover U from F V = U diag(S) by Gram-Schmidt with per-column
    fallbacks: a column whose singular value is below noise gets an arbitrary
    orthogonal completion (its contribution to F is negligible); columns with
    reliable magnitude keep their exact direction and sign, so det(U) = -1
    cases (reflections) reconstruct correctly."""
    tiny = jnp.asarray(1e-300 if F.dtype == jnp.float64 else 1e-30, F.dtype)
    FV = jnp.einsum("...ij,...jk->...ik", F, V)
    tol = (jnp.maximum(S[..., 0], 1.0)
           * (1e-12 if F.dtype == jnp.float64 else 1e-5))[..., None]

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), tiny)

    c0 = FV[..., :, 0]
    n0 = jnp.linalg.norm(c0, axis=-1, keepdims=True)
    e0 = jnp.zeros_like(c0).at[..., 0].set(1.0)
    u0 = jnp.where(n0 > tol, c0 / jnp.maximum(n0, tiny), e0)

    c1 = FV[..., :, 1]
    c1 = c1 - jnp.sum(c1 * u0, axis=-1, keepdims=True) * u0
    n1 = jnp.linalg.norm(c1, axis=-1, keepdims=True)
    alt1 = jnp.eye(3, dtype=F.dtype)[jnp.argmin(jnp.abs(u0), axis=-1)]
    alt1 = norm(alt1 - jnp.sum(alt1 * u0, axis=-1, keepdims=True) * u0)
    u1 = jnp.where(n1 > tol, c1 / jnp.maximum(n1, tiny), alt1)

    c2 = FV[..., :, 2]
    c2 = (c2 - jnp.sum(c2 * u0, axis=-1, keepdims=True) * u0
          - jnp.sum(c2 * u1, axis=-1, keepdims=True) * u1)
    n2 = jnp.linalg.norm(c2, axis=-1, keepdims=True)
    alt2 = jnp.cross(u0, u1)
    u2 = jnp.where(n2 > tol, c2 / jnp.maximum(n2, tiny), alt2)
    return jnp.stack([u0, u1, u2], axis=-1)


@functools.partial(jax.jit, static_argnames=("method",))
def svd3x3(F, method: str = "jacobi"):
    """Batched SVD of (..., 3, 3): returns U, S (desc, >=0), V with F=U S V^T.

    U and V are orthogonal but not necessarily rotations (same convention as
    Eigen::JacobiSVD used by the reference prox kernels)."""
    if method == "lapack":
        U, S, Vh = jnp.linalg.svd(F, full_matrices=True)
        return U, S, jnp.swapaxes(Vh, -1, -2)
    A = jnp.einsum("...ji,...jk->...ik", F, F)
    w, V = eigh3x3(A)
    w, V = _sort_desc3(w, V)
    S = jnp.sqrt(jnp.maximum(w, 0.0))
    U = _orthonormal_u(F, V, S)
    return U, S, V


@jax.jit
def svd3x2(F):
    """Batched thin SVD of (..., 3, 2): U (...,3,2), S (...,2), V (...,2,2).

    Closed form via the 2x2 symmetric eigenproblem of F^T F (branch-free)."""
    eps = jnp.asarray(1e-150 if F.dtype == jnp.float64 else 1e-20, F.dtype)
    A = jnp.einsum("...ji,...jk->...ik", F, F)  # (...,2,2) symmetric
    a, b, d = A[..., 0, 0], A[..., 0, 1], A[..., 1, 1]
    tr = a + d
    disc = jnp.sqrt(jnp.maximum((a - d) ** 2 + 4.0 * b * b, 0.0))
    l1 = 0.5 * (tr + disc)
    l2 = 0.5 * (tr - disc)
    # Eigenvector for l1: (b, l1-a) or (l1-d, b), pick the better-conditioned.
    v1a = jnp.stack([b, l1 - a], axis=-1)
    v1b = jnp.stack([l1 - d, b], axis=-1)
    use_a = (jnp.abs(l1 - a) > jnp.abs(l1 - d))[..., None]
    v1 = jnp.where(use_a, v1a, v1b)
    n1 = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v1 = jnp.where(n1 > eps, v1 / jnp.maximum(n1, eps),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0], F.dtype), v1.shape))
    v2 = jnp.stack([-v1[..., 1], v1[..., 0]], axis=-1)
    V = jnp.stack([v1, v2], axis=-1)
    S = jnp.sqrt(jnp.maximum(jnp.stack([l1, l2], axis=-1), 0.0))
    FV = jnp.einsum("...ij,...jk->...ik", F, V)
    U = FV / jnp.maximum(S[..., None, :], eps)

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)

    u0 = norm(U[..., :, 0])
    u1 = U[..., :, 1] - jnp.sum(U[..., :, 1] * u0, axis=-1, keepdims=True) * u0
    u1n = jnp.linalg.norm(u1, axis=-1, keepdims=True)
    alt = jnp.eye(3, dtype=F.dtype)[jnp.argmin(jnp.abs(u0), axis=-1)]
    alt = norm(alt - jnp.sum(alt * u0, axis=-1, keepdims=True) * u0)
    u1 = jnp.where(u1n > eps, u1 / jnp.maximum(u1n, eps), alt)
    U = jnp.stack([u0, u1], axis=-1)
    return U, S, V


def polar_rotation3x3(F, method: str = "jacobi"):
    """R = U V^T from the SVD (the corotation used in the linear-tet gradient,
    TetEnergyTerm.cpp:144-165)."""
    U, _, V = svd3x3(F, method=method)
    return jnp.einsum("...ij,...kj->...ik", U, V)
