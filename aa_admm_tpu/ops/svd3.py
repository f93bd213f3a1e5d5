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

from . import mat3

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
    """One Jacobi rotation on symmetric A (batch..., 3, 3), accumulated into
    V — fully scalarized (component updates, no matrix products) so the whole
    sweep chain fuses into one elementwise TPU kernel."""
    c, s = _jacobi_rotation(A[..., p, p], A[..., q, q], A[..., p, q])
    r = 3 - p - q  # the untouched index
    app, aqq, apq = A[..., p, p], A[..., q, q], A[..., p, q]
    apr, aqr = A[..., p, r], A[..., q, r]
    new_pp = c * c * app - 2.0 * c * s * apq + s * s * aqq
    new_qq = s * s * app + 2.0 * c * s * apq + c * c * aqq
    new_pr = c * apr - s * aqr
    new_qr = s * apr + c * aqr
    zero = jnp.zeros_like(app)

    cols = [None, None, None]
    vals = {(p, p): new_pp, (q, q): new_qq, (r, r): A[..., r, r],
            (p, q): zero, (q, p): zero,
            (p, r): new_pr, (r, p): new_pr,
            (q, r): new_qr, (r, q): new_qr}
    A_new = jnp.stack([jnp.stack([vals[(i, j)] for j in range(3)], -1)
                       for i in range(3)], -2)

    vp = [V[..., i, p] for i in range(3)]
    vq = [V[..., i, q] for i in range(3)]
    vcols = {p: [c * vp[i] - s * vq[i] for i in range(3)],
             q: [s * vp[i] + c * vq[i] for i in range(3)],
             r: [V[..., i, r] for i in range(3)]}
    V_new = jnp.stack([jnp.stack([vcols[j][i] for j in range(3)], -1)
                       for i in range(3)], -2)
    del cols
    return A_new, V_new


def eigh3x3(A, sweeps: int = _JACOBI_SWEEPS):
    """Eigendecomposition of symmetric 3x3 batch via cyclic Jacobi.

    Returns (eigvals (...,3), V (...,3,3)) unsorted."""
    V = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            A, V = _apply_jacobi(A, V, p, q)
    w = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    return w, V


def _sort_desc3(w, V):
    """Descending sort of 3 eigenpairs via a branch-free sorting network
    (3 compare-swaps) — no gathers."""
    def swap(wi, wj, vi, vj):
        cond = wi < wj
        return (jnp.where(cond, wj, wi), jnp.where(cond, wi, wj),
                [jnp.where(cond, b, a) for a, b in zip(vi, vj)],
                [jnp.where(cond, a, b) for a, b in zip(vi, vj)])

    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    v0 = [V[..., i, 0] for i in range(3)]
    v1 = [V[..., i, 1] for i in range(3)]
    v2 = [V[..., i, 2] for i in range(3)]
    w0, w1, v0, v1 = swap(w0, w1, v0, v1)
    w1, w2, v1, v2 = swap(w1, w2, v1, v2)
    w0, w1, v0, v1 = swap(w0, w1, v0, v1)
    w = jnp.stack([w0, w1, w2], -1)
    V = jnp.stack([jnp.stack([v0[i], v1[i], v2[i]], -1) for i in range(3)], -2)
    return w, V


def _orthonormal_u(F, V, S):
    """Recover U from F V = U diag(S) by Gram-Schmidt with per-column
    fallbacks: a column whose singular value is below noise gets an arbitrary
    orthogonal completion (its contribution to F is negligible); columns with
    reliable magnitude keep their exact direction and sign, so det(U) = -1
    cases (reflections) reconstruct correctly."""
    tiny = jnp.asarray(1e-300 if F.dtype == jnp.float64 else 1e-30, F.dtype)
    FV = mat3.mmul(F, V)
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
    A = mat3.mtmul(F, F)
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
    A = mat3.gram22(F)  # (...,2,2) symmetric
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
    FV = mat3.mmul32_22(F, V)
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
    return mat3.mmult(U, V)
