"""Anderson acceleration: trajectory parity against a direct NumPy
transcription of the reference algorithm (Geometry/AndersonAcceleration.h:
154-211), plus acceleration sanity on a contraction mapping."""

import jax.numpy as jnp
import numpy as np

from aa_admm_tpu.solver import anderson


class NumpyAA:
    """Direct oracle of AndersonAcceleration::compute_impl."""

    def __init__(self, m, total_dim, effective_dim):
        self.m, self.d, self.de = m, total_dim, effective_dim
        self.u = np.zeros(total_dim)
        self.dF = np.zeros((effective_dim, m))
        self.dG = np.zeros((total_dim, m))
        self.scale = np.zeros(m)
        self.M = np.zeros((m, m))
        self.iter = -1
        self.col = -1

    def init(self, u0):
        self.u = u0.copy()
        self.iter = 0
        self.col = 0

    def replace(self, u):
        self.u = u.copy()

    def reset(self, u):
        self.u = u.copy()
        self.iter = 0
        self.col = 0

    def compute(self, G):
        F = G[:self.de] - self.u[:self.de]
        if self.iter == 0:
            self.dF[:, 0] = -F
            self.dG[:, 0] = -G
            self.u = G.copy()
        else:
            self.dF[:, self.col] += F
            self.dG[:, self.col] += G
            eps = 1e-14
            scale = max(eps, np.linalg.norm(self.dF[:, self.col]))
            self.scale[self.col] = scale
            self.dF[:, self.col] /= scale
            m_k = min(self.m, self.iter)
            if m_k == 1:
                theta = np.zeros(1)
                sq = self.dF[:, self.col] @ self.dF[:, self.col]
                self.M[0, 0] = sq
                n = np.sqrt(sq)
                if n > eps:
                    theta[0] = (self.dF[:, self.col] / n) @ (F / n)
            else:
                inner = self.dF[:, self.col] @ self.dF[:, :m_k]
                self.M[self.col, :m_k] = inner
                self.M[:m_k, self.col] = inner
                theta = np.linalg.lstsq(self.M[:m_k, :m_k],
                                        self.dF[:, :m_k].T @ F, rcond=None)[0]
            self.u = G - self.dG[:, :m_k] @ (theta / self.scale[:m_k])
            self.col = (self.col + 1) % self.m
            self.dF[:, self.col] = -F
            self.dG[:, self.col] = -G
        self.iter += 1
        return self.u.copy()


def _fixed_point_map(seed, d):
    rng = np.random.default_rng(seed)
    Q = rng.normal(size=(d, d))
    A = 0.9 * Q / np.abs(np.linalg.eigvals(Q)).max()  # contraction
    b = rng.normal(size=d)
    return lambda x: A @ x + b, A, b


def test_trajectory_matches_oracle():
    d, m = 12, 4
    g, A, b = _fixed_point_map(0, d)
    x0 = np.zeros(d)

    oracle = NumpyAA(m, d, d)
    oracle.init(x0)
    st = anderson.init(m, jnp.asarray(x0))

    x_o, x_j = x0.copy(), x0.copy()
    for it in range(25):
        G_o = g(x_o)
        G_j = g(x_j)
        x_o = oracle.compute(G_o)
        st, xj = anderson.compute(st, jnp.asarray(G_j))
        x_j = np.asarray(xj)
        assert np.allclose(x_o, x_j, rtol=1e-8, atol=1e-10), f"iter {it}"


def test_effective_dim_matches_oracle():
    d, de, m = 16, 6, 3
    g, A, b = _fixed_point_map(1, d)
    x0 = np.zeros(d)
    oracle = NumpyAA(m, d, de)
    oracle.init(x0)
    st = anderson.init(m, jnp.asarray(x0), effective_dim=de)
    x_o, x_j = x0.copy(), x0.copy()
    for it in range(20):
        x_o = oracle.compute(g(x_o))
        st, xj = anderson.compute(st, jnp.asarray(g(x_j)))
        x_j = np.asarray(xj)
        assert np.allclose(x_o, x_j, rtol=1e-8, atol=1e-10), f"iter {it}"


def test_replace_and_reset_match_oracle():
    d, m = 10, 3
    g, A, b = _fixed_point_map(2, d)
    x0 = np.ones(d)
    oracle = NumpyAA(m, d, d)
    oracle.init(x0)
    st = anderson.init(m, jnp.asarray(x0))
    x_o, x_j = x0.copy(), x0.copy()
    for it in range(15):
        x_o = oracle.compute(g(x_o))
        st, xj = anderson.compute(st, jnp.asarray(g(x_j)))
        x_j = np.asarray(xj)
        if it == 5:
            oracle.replace(x0)
            st = anderson.replace(st, jnp.asarray(x0))
            x_o, x_j = x0.copy(), x0.copy()
        if it == 9:
            oracle.reset(x0)
            st = anderson.reset(st, jnp.asarray(x0))
            x_o, x_j = x0.copy(), x0.copy()
        assert np.allclose(x_o, x_j, rtol=1e-8, atol=1e-10), f"iter {it}"


def test_aa_accelerates_contraction():
    d, m = 30, 8
    rng = np.random.default_rng(3)
    Q = rng.normal(size=(d, d))
    Sym = Q @ Q.T
    A = 0.95 * Sym / np.abs(np.linalg.eigvalsh(Sym)).max()
    b = rng.normal(size=d)
    g = lambda x: A @ x + b  # noqa: E731
    x_star = np.linalg.solve(np.eye(d) - A, b)

    # Plain fixed-point iteration
    x = np.zeros(d)
    for _ in range(30):
        x = g(x)
    err_plain = np.linalg.norm(x - x_star)

    # AA iteration
    st = anderson.init(m, jnp.zeros(d))
    x = np.zeros(d)
    for _ in range(30):
        st, xj = anderson.compute(st, jnp.asarray(g(x)))
        x = np.asarray(xj)
    err_aa = np.linalg.norm(x - x_star)
    assert err_aa < err_plain * 1e-3


def test_solve_theta_rank_deficient_f32_vs_cod_oracle():
    """VERDICT r1 item 10: _solve_theta's relative eigh cutoff at a
    near-rank-deficient window in f32 vs the f64 minimum-norm (COD-like)
    oracle (Geometry/AndersonAcceleration.h:193-196). The f32 solve must
    stay finite, solve the normal equations about as well as the oracle,
    and not blow up along the null space."""
    rng = np.random.default_rng(11)
    d, m, r = 48, 6, 3
    C = rng.normal(size=(d, r)) @ rng.normal(size=(r, m))  # rank r < m
    C[:, 3] = C[:, 0] * (1.0 + 1e-7)                       # near-duplicate
    F = rng.normal(size=d)
    M64 = C.T @ C
    rhs64 = C.T @ F
    th_oracle = np.linalg.lstsq(M64, rhs64, rcond=None)[0]

    from aa_admm_tpu.solver.anderson import _solve_theta
    valid = jnp.ones(m, bool)
    th32 = np.asarray(_solve_theta(jnp.asarray(M64, jnp.float32),
                                   jnp.asarray(rhs64, jnp.float32),
                                   valid), np.float64)
    assert np.isfinite(th32).all()
    scale = np.linalg.norm(rhs64)
    r_ours = np.linalg.norm(M64 @ th32 - rhs64)
    r_best = np.linalg.norm(M64 @ th_oracle - rhs64)
    assert r_ours <= r_best + 1e-3 * scale
    assert np.linalg.norm(th32) <= 2.0 * np.linalg.norm(th_oracle) + 1e-3


def test_aa_f32_duplicate_columns_stays_stable():
    """End-to-end f32 AA on a fixed-point map with duplicated coordinates:
    the update differences are exactly linearly dependent, so the window
    Gram matrix is singular every step. The accelerated f32 iteration must
    stay finite and still converge (tracked against the f64 oracle run)."""
    d = 12
    fmap64, A, b = _fixed_point_map(5, d // 2)

    def fmap(x):  # duplicate the state: x = [y, y]
        y = fmap64(x[: d // 2])
        return np.concatenate([y, y])

    x_star = np.linalg.solve(np.eye(d // 2) - A, b)

    for dtype in (jnp.float64, jnp.float32):
        x = jnp.zeros(d, dtype)
        st = anderson.init(5, x)
        for _ in range(60):
            g = jnp.asarray(fmap(np.asarray(x, np.float64)), dtype)
            st, x = anderson.compute(st, g)
            assert bool(jnp.isfinite(x).all()), dtype
        err = np.abs(np.asarray(x[: d // 2], np.float64) - x_star).max()
        tol = 1e-8 if dtype == jnp.float64 else 1e-3
        assert err < tol, (dtype, err)
