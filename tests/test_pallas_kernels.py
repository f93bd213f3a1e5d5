"""Pallas kernels (interpret mode on CPU) vs the reference jnp
implementations — bit-level parity of the fused Ericson sweep and the
banded CG updates (SURVEY §7.2 step 2 / VERDICT r4 #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aa_admm_tpu.ops import pallas_kernels as pk
from aa_admm_tpu.ops.closest_point import _closest_point_candidates



@pytest.mark.parametrize("Q,K", [(300, 7), (128, 48), (1000, 16)])
def test_ericson_candidates_matches_jnp(Q, K):
    rng = np.random.default_rng(Q + K)
    p = jnp.asarray(rng.standard_normal((Q, 3)), jnp.float32)
    cand = jnp.asarray(rng.standard_normal((Q, K, 3, 3)), jnp.float32)
    q_ref, d_ref = _closest_point_candidates(p, cand)
    q_pal, d_pal = pk.ericson_candidates(p, cand)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref),
                               rtol=2e-6, atol=2e-6)
    # closest POINTS must agree wherever the minimum is unique (ties pick
    # the first candidate in both paths, but fp noise can reorder ties).
    np.testing.assert_allclose(np.asarray(q_pal), np.asarray(q_ref),
                               rtol=1e-5, atol=1e-5)


def test_ericson_degenerate_triangles():
    """Zero-area triangles and exact-on-surface queries must not NaN."""
    p = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]], jnp.float32)
    tri = jnp.asarray([[[0, 0, 0], [0, 0, 0], [0, 0, 0]],
                       [[1, 2, 3], [1, 2, 3], [4, 5, 6]]], jnp.float32)
    cand = jnp.stack([tri, tri])
    q_ref, d_ref = _closest_point_candidates(p, cand)
    q_pal, d_pal = pk.ericson_candidates(p, cand)
    assert np.isfinite(np.asarray(q_pal)).all()
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(q_pal), np.asarray(q_ref),
                               atol=1e-6)


@pytest.mark.parametrize("dtype,rtol", [(np.float64, 1e-12),
                                        (np.float32, 1e-3)])
def test_cg_updates_match_jnp(dtype, rtol):
    """f64: exact math parity. f32: loose — the band layout reduces dots
    in 8-sublane bands, a different f32 summation order than XLA's column
    sum, so alpha/beta differ at roundoff and amplify through cancelling
    entries (measured ~3e-4 max rel)."""
    n, c = 1024, 3
    rng = np.random.default_rng(7)
    x = rng.standard_normal((n, c)).astype(dtype)
    r = rng.standard_normal((n, c)).astype(dtype)
    p = rng.standard_normal((n, c)).astype(dtype)
    ap = rng.standard_normal((n, c)).astype(dtype)
    z = rng.standard_normal((n, c)).astype(dtype)
    rz = rng.random(c).astype(dtype) + 0.5

    # reference math (solver/linear.py pcg body)
    pAp = (p * ap).sum(0)
    alpha = rz / pAp
    x_ref = x + alpha[None, :] * p
    r_ref = r - alpha[None, :] * ap
    rr_ref = (r_ref * r_ref).sum(0)
    rz_new_ref = (r_ref * z).sum(0)
    beta = rz_new_ref / rz
    p_ref = z + beta[None, :] * p

    xb, rb, rr = pk.cg_update1(jnp.asarray(rz), pk.to_band(jnp.asarray(p)),
                               pk.to_band(jnp.asarray(ap)),
                               pk.to_band(jnp.asarray(x)),
                               pk.to_band(jnp.asarray(r)))
    x_pal = np.asarray(pk.from_band(xb, n))
    r_pal = np.asarray(pk.from_band(rb, n))
    np.testing.assert_allclose(x_pal, x_ref, rtol=rtol, atol=rtol)
    np.testing.assert_allclose(r_pal, r_ref, rtol=rtol, atol=rtol)
    np.testing.assert_allclose(np.asarray(rr), rr_ref, rtol=max(rtol, 1e-10))

    pb, rz_new = pk.cg_update2(jnp.asarray(rz), rb,
                               pk.to_band(jnp.asarray(z)),
                               pk.to_band(jnp.asarray(p)))
    p_pal = np.asarray(pk.from_band(pb, n))
    np.testing.assert_allclose(np.asarray(rz_new), rz_new_ref,
                               rtol=max(rtol, 1e-10))
    np.testing.assert_allclose(p_pal, p_ref, rtol=rtol, atol=rtol)


def test_band_roundtrip():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
    b = pk.to_band(v)
    assert b.shape == pk.band_shape(64, 3)
    np.testing.assert_array_equal(np.asarray(pk.from_band(b, 64)),
                                  np.asarray(v))


def test_pcg_banded_matches_pcg():
    """Full banded CG (Pallas interpret) vs pcg on an SPD system, f64 —
    same trajectory semantics including frozen converged columns."""
    from aa_admm_tpu.solver.linear import pcg, pcg_banded
    rng = np.random.default_rng(3)
    n, c = 256, 3
    M = rng.standard_normal((n, n))
    A = jnp.asarray(M @ M.T + n * np.eye(n))
    diag = jnp.diagonal(A)
    rhs = jnp.asarray(rng.standard_normal((n, c)))
    # scale columns so they converge at different iteration counts (the
    # frozen-column path is exercised)
    rhs = rhs * jnp.asarray([1.0, 1e-3, 1e3])[None, :]
    op = lambda v: A @ v

    x1, it1 = pcg(op, rhs, diag, tol=1e-10, max_iters=300)
    x2, it2 = pcg_banded(op, rhs, diag, tol=1e-10, max_iters=300)
    r1 = np.linalg.norm(np.asarray(op(x1) - rhs), axis=0)
    r2 = np.linalg.norm(np.asarray(op(x2) - rhs), axis=0)
    rhsn = np.linalg.norm(np.asarray(rhs), axis=0)
    assert (r1 / rhsn < 1e-9).all()
    assert (r2 / rhsn < 1e-9).all()
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1),
                               rtol=1e-8, atol=1e-10)


def test_cached_candT_fast_path_matches_plain(monkeypatch):
    """The candT-cached fast path (Pallas interpret on CPU) must agree
    with the plain gather-based cached path: same points on the fast
    branch AND after a forced refresh."""
    monkeypatch.setenv("AAADMM_PALLAS", "1")
    from aa_admm_tpu.ops.closest_point import (closest_point_cached,
                                               cp_cache_init)
    rng = np.random.default_rng(9)
    T, Q = 500, 200
    tri = jnp.asarray(rng.standard_normal((T, 3, 3)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((Q, 3)), jnp.float32) * 2.0

    c_plain = cp_cache_init(Q, 48, jnp.float32, with_candT=False)
    c_ct = cp_cache_init(Q, 48, jnp.float32, with_candT=True)
    assert c_ct.candT is not None

    # First call: slack -inf -> refresh on both paths.
    q1, c_plain = closest_point_cached(p, tri, c_plain)
    q2, c_ct = closest_point_cached(p, tri, c_ct)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1),
                               rtol=1e-5, atol=1e-5)
    assert c_ct.candT is not None

    # Small move: fast path on both (candT path = kernel only).
    p2 = p + 1e-5
    q1b, _ = closest_point_cached(p2, tri, c_plain)
    q2b, _ = closest_point_cached(p2, tri, c_ct)
    np.testing.assert_allclose(np.asarray(q2b), np.asarray(q1b),
                               rtol=1e-5, atol=1e-5)
