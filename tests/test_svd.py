import jax.numpy as jnp
import numpy as np
import pytest

from aa_admm_tpu.ops.svd3 import polar_rotation3x3, svd3x2, svd3x3


def _check_svd3x3(F, tol=1e-8):
    U, S, V = svd3x3(jnp.asarray(F))
    U, S, V = np.asarray(U), np.asarray(S), np.asarray(V)
    # Reconstruction
    R = np.einsum("...ik,...k,...jk->...ij", U, S, V)
    assert np.max(np.abs(R - F)) < tol * max(1.0, np.max(np.abs(F)))
    # Orthogonality
    I = np.eye(3)
    assert np.max(np.abs(np.einsum("...ji,...jk->...ik", U, U) - I)) < tol
    assert np.max(np.abs(np.einsum("...ji,...jk->...ik", V, V) - I)) < tol
    # Singular values non-negative descending
    assert np.all(S[..., :-1] >= S[..., 1:] - 1e-12)
    assert np.all(S >= -1e-12)
    # Match LAPACK singular values
    S_ref = np.linalg.svd(F, compute_uv=False)
    assert np.max(np.abs(S - S_ref)) < tol * max(1.0, np.max(np.abs(S_ref)))


def test_svd3x3_random():
    rng = np.random.default_rng(0)
    F = rng.normal(size=(64, 3, 3))
    _check_svd3x3(F)


def test_svd3x3_near_identity():
    rng = np.random.default_rng(1)
    F = np.eye(3) + 1e-3 * rng.normal(size=(32, 3, 3))
    _check_svd3x3(F, tol=1e-10)


def test_svd3x3_reflection_and_degenerate():
    F = np.stack([
        np.diag([1.0, 1.0, -1.0]),
        np.diag([2.0, 1e-8, 1.0]),
        np.zeros((3, 3)),
        np.diag([5.0, 5.0, 5.0]),  # repeated singular values
        np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], float),  # rank 2
    ])
    _check_svd3x3(F, tol=1e-6)


def test_svd3x2():
    rng = np.random.default_rng(2)
    F = rng.normal(size=(64, 3, 2))
    U, S, V = svd3x2(jnp.asarray(F))
    U, S, V = np.asarray(U), np.asarray(S), np.asarray(V)
    R = np.einsum("...ik,...k,...jk->...ij", U, S, V)
    assert np.max(np.abs(R - F)) < 1e-8
    I2 = np.eye(2)
    assert np.max(np.abs(np.einsum("...ji,...jk->...ik", U, U) - I2)) < 1e-8
    assert np.max(np.abs(np.einsum("...ji,...jk->...ik", V, V) - I2)) < 1e-8
    S_ref = np.linalg.svd(F, compute_uv=False)
    assert np.max(np.abs(S - S_ref)) < 1e-8


def test_polar_rotation():
    rng = np.random.default_rng(3)
    F = np.eye(3) + 0.3 * rng.normal(size=(16, 3, 3))
    R = np.asarray(polar_rotation3x3(jnp.asarray(F)))
    # R should be the orthogonal polar factor: R = F (F^T F)^(-1/2) when det>0
    for i in range(16):
        u, _, vt = np.linalg.svd(F[i])
        R_ref = u @ vt
        assert np.max(np.abs(R[i] - R_ref)) < 1e-8
