"""Golden tests for the batched prox operators against reference semantics:
analytic projections checked directly, hyperelastic proxes cross-checked
against a 9-dimensional scipy minimization of the exact reference objective
(NHProx/StVKProx::value, TetEnergyTerm.cpp:239-311)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from aa_admm_tpu.ops import prox as P


def _nh_density(F, mu, lam):
    J = np.linalg.det(F)
    I1 = np.trace(F.T @ F)
    logI3 = np.log(J * J)
    return 0.5 * mu * (I1 - logI3 - 3.0) + 0.125 * lam * logI3 * logI3


def _stvk_density(F, mu, lam):
    E = 0.5 * (F.T @ F - np.eye(3))
    return mu * np.trace(E.T @ E) + 0.5 * lam * np.trace(E) ** 2


def _scipy_prox(v, mu, lam, k, density):
    def obj(x):
        F = x.reshape(3, 3, order="F")
        return density(F, mu, lam) + 0.5 * k * np.sum((x - v.ravel(order="F")) ** 2)

    best = None
    for seed_scale in (1.0, 0.999, 1.001):
        x0 = v.ravel(order="F") * seed_scale
        r = scipy.optimize.minimize(obj, x0, method="L-BFGS-B",
                                    options=dict(maxiter=500, ftol=1e-16,
                                                 gtol=1e-12))
        if best is None or r.fun < best.fun:
            best = r
    return best.x.reshape(3, 3, order="F"), best.fun


def test_tet_linear_prox_identity():
    # A pure rotation is already on the constraint set: prox averages z with
    # its projection, so z stays put.
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    z = jnp.asarray(R[None])
    out = np.asarray(P.prox_tet_linear(z, None, None, None))
    assert np.allclose(out[0], R, atol=1e-10)


def test_tet_linear_prox_average():
    F = np.diag([2.0, 1.0, 1.0])
    out = np.asarray(P.prox_tet_linear(jnp.asarray(F[None]), None, None, None))
    # Projection is identity (U=V=I, sigma->1), so result = (I + F)/2.
    assert np.allclose(out[0], np.diag([1.5, 1.0, 1.0]), atol=1e-10)


def test_tet_linear_prox_inverted():
    F = np.diag([1.0, 1.0, -0.5])
    out = np.asarray(P.prox_tet_linear(jnp.asarray(F[None]), None, None, None))
    # det<0: the sign flip composes with the reflection already carried by
    # U/V, so the projection target is the closest *rotation* P = I
    # (P = U diag(1,1,-1) V^T = F V diag(1,1,-2) V^T = I here), z = (P+F)/2.
    assert np.allclose(out[0], np.diag([1.0, 1.0, 0.25]), atol=1e-10)


@pytest.mark.parametrize("model", ["nh", "stvk"])
def test_hyperelastic_prox_matches_scipy(model):
    rng = np.random.default_rng(42)
    mu, lam = 13.17, 44.12   # arbitrary moderate material
    k = lam + 2.0 / 3.0 * mu
    fn = P.prox_tet_neohookean if model == "nh" else P.prox_tet_stvk
    density = _nh_density if model == "nh" else _stvk_density
    vs = np.stack([
        np.eye(3) + 0.3 * rng.normal(size=(3, 3)),
        np.diag([1.5, 0.7, 1.1]),
        np.eye(3),
        np.eye(3) + 0.05 * rng.normal(size=(3, 3)),
    ])
    out = np.asarray(fn(jnp.asarray(vs),
                        jnp.full(len(vs), mu), jnp.full(len(vs), lam),
                        jnp.full(len(vs), k)))
    for i, v in enumerate(vs):
        ref_F, ref_val = _scipy_prox(v, mu, lam, k, density)
        def obj(F):
            return density(F, mu, lam) + 0.5 * k * np.sum((F - v) ** 2)
        # Ours should achieve an objective <= scipy's (both are minimizers).
        assert obj(out[i]) <= ref_val + 1e-7 * max(1.0, abs(ref_val)), \
            f"case {i}: ours {obj(out[i])} vs scipy {ref_val}"


def test_hyperelastic_prox_degenerate_no_nan():
    # Near-zero-volume input (the testHyperelastic.cpp stress case): must not
    # produce NaNs and must not invert further.
    v = np.diag([1.0, 1.0, 1e-8])
    out = np.asarray(P.prox_tet_neohookean(
        jnp.asarray(v[None]), jnp.asarray([10.0]), jnp.asarray([40.0]),
        jnp.asarray([46.6])))
    assert np.all(np.isfinite(out))
    assert np.linalg.det(out[0]) > 0


def test_tri_prox_strain_limits():
    # Stretched flat triangle: singular values [2, 1] -> averaged [1.5, 1],
    # then clamped to limit_max=1.05.
    F = np.array([[2.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
    out = np.asarray(P.prox_tri_zxu(jnp.asarray(F[None]),
                                    jnp.asarray([0.95]), jnp.asarray([1.05])))
    s = np.linalg.svd(out[0], compute_uv=False)
    assert np.allclose(np.sort(s)[::-1], [1.05, 1.0], atol=1e-10)


def test_tri_prox_no_limits():
    F = np.array([[2.0, 0.0], [0.0, 0.5], [0.0, 0.0]])
    out = np.asarray(P.prox_tri_zxu(jnp.asarray(F[None]),
                                    jnp.asarray([-100.0]), jnp.asarray([100.0])))
    s = np.linalg.svd(out[0], compute_uv=False)
    assert np.allclose(np.sort(s)[::-1], [1.5, 0.75], atol=1e-10)


def test_strain_violation():
    F = np.array([[2.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
    v = np.asarray(P.strain_limit_violation(
        jnp.asarray(F[None]), jnp.asarray([0.95]), jnp.asarray([1.05])))
    # averaged sigmas [1.5, 1.0]: violation = 1.5 - 1.05 = 0.45
    assert np.allclose(v[0], 0.45, atol=1e-10)


def test_pin_prox():
    v = jnp.asarray(np.zeros((2, 3)))
    pins = jnp.asarray([[1.0, 2, 3], [4, 5, 6]])
    active = jnp.asarray([True, False])
    out = np.asarray(P.prox_pin(v, pins, active))
    assert np.allclose(out[0], [1, 2, 3])
    assert np.allclose(out[1], [0, 0, 0])
