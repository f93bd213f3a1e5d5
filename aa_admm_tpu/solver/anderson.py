"""Anderson acceleration as a pure function of fixed-shape carried state.

Re-expresses both reference AA variants behind one implementation:
  * z-only AA (admm_anderson_xzu/src/AndersonAcceleration.h:138-200) —
    ``effective_dim == total_dim``;
  * effective-dim AA on a (u, x) pair (Geometry/AndersonAcceleration.h:154-211,
    byte-identical in admm_anderson_hard_zxu) — mixing coefficients computed
    from the *head* (effective) block only, mixing applied to the whole vector.

Numerical details preserved: per-column rescaling of dF by its norm with
eps=1e-14 (AndersonAcceleration.h:167-170); rank-deficiency-safe m x m
normal-equation solve (the reference's CompleteOrthogonalDecomposition is
replaced by an eigh-based pseudo-inverse with relative cutoff — both return
least-squares solutions for singular M); ring-buffer column indexing; and the
``replace``/``reset`` safeguard hooks used by the solvers' reject paths.

Everything is jit-compatible: the window fill-in (m_k = min(m, iter)) is
handled by column masking instead of dynamic shapes, so the whole ADMM loop
(including AA) compiles to a single ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-14


class AAState(NamedTuple):
    current_u: jnp.ndarray  # (d,)
    dF: jnp.ndarray         # (de, m) scaled residual-difference history
    dG: jnp.ndarray         # (d, m) iterate-difference history
    dF_scale: jnp.ndarray   # (m,)
    M: jnp.ndarray          # (m, m) normal-equations Gram matrix
    iter: jnp.ndarray       # () int32  iterations since (re)init
    col_idx: jnp.ndarray    # () int32  ring-buffer column


def init(m: int, u0: jnp.ndarray, effective_dim: int | None = None) -> AAState:
    """AndersonAcceleration::init — u0 is the flat initial iterate; for pair
    variants the effective block must be the head of the vector."""
    d = u0.shape[0]
    de = d if effective_dim is None else effective_dim
    dt = u0.dtype
    return AAState(
        current_u=u0,
        dF=jnp.zeros((de, m), dt),
        dG=jnp.zeros((d, m), dt),
        dF_scale=jnp.ones((m,), dt),
        M=jnp.zeros((m, m), dt),
        iter=jnp.zeros((), jnp.int32),
        col_idx=jnp.zeros((), jnp.int32),
    )


def replace(state: AAState, u: jnp.ndarray) -> AAState:
    """Overwrite the accepted iterate, keep history (xzu reject path,
    admm_anderson_xzu/src/AndersonAcceleration.h:51-54)."""
    return state._replace(current_u=u)


def reset(state: AAState, u: jnp.ndarray) -> AAState:
    """Restart the window (zxu/geometry reject path,
    Geometry/AndersonAcceleration.h:74-91)."""
    return state._replace(current_u=u,
                          iter=jnp.zeros((), jnp.int32),
                          col_idx=jnp.zeros((), jnp.int32))


def _solve_theta(M, rhs, valid):
    """Least-squares solve of the masked normal equations.

    Invalid rows/cols are replaced by identity (theta=0 there); the valid
    subblock is solved with an eigh pseudo-inverse (relative cutoff), matching
    the minimum-norm behavior of the reference's COD for singular M."""
    m = M.shape[0]
    eye = jnp.eye(m, dtype=M.dtype)
    vmask = valid[:, None] & valid[None, :]
    Mm = jnp.where(vmask, M, eye)
    rhs_m = jnp.where(valid, rhs, 0.0)
    w, Q = jnp.linalg.eigh(Mm)
    cutoff = jnp.maximum(jnp.max(jnp.abs(w)), _EPS) * (m * jnp.finfo(M.dtype).eps * 10)
    w_inv = jnp.where(jnp.abs(w) > cutoff, 1.0 / w, 0.0)
    theta = Q @ (w_inv * (Q.T @ rhs_m))
    return jnp.where(valid, theta, 0.0)


def compute(state: AAState, G: jnp.ndarray) -> tuple[AAState, jnp.ndarray]:
    """One AA mixing step: consumes the fixed-point image G of the current
    iterate, returns the accelerated iterate
    (compute_impl, Geometry/AndersonAcceleration.h:154-211)."""
    de = state.dF.shape[0]
    m = state.dF.shape[1]
    F = G[:de] - state.current_u[:de]

    def first(state):
        dF = state.dF.at[:, 0].set(-F)
        dG = state.dG.at[:, 0].set(-G)
        return state._replace(current_u=G, dF=dF, dG=dG), G

    def general(state):
        col = state.col_idx
        dF_col = state.dF[:, col] + F
        dG_col = state.dG[:, col] + G
        # ONE fused (2, de) @ (de, m) product delivers {scale^2, the Gram row,
        # the projection rhs} — on a sharded element axis this is a single
        # all-reduce instead of three (norm + inner + rhs), the SURVEY
        # section 5.8 "AA inner products via psum" fused (VERDICT r3 #4).
        # HIGHEST precision keeps the f32 TPU matmul out of bf16 MXU passes
        # (these reductions gate accept/reject).
        dF_base = state.dF.at[:, col].set(dF_col)
        P = jnp.einsum("kd,dm->km", jnp.stack([dF_col, F]), dF_base,
                       precision=jax.lax.Precision.HIGHEST)
        scale2 = P[0, col]
        scale = jnp.maximum(_EPS, jnp.sqrt(jnp.maximum(scale2, 0.0)))
        dF = dF_base.at[:, col].mul(1.0 / scale)
        dG = state.dG.at[:, col].set(dG_col)
        dF_scale = state.dF_scale.at[col].set(scale)

        m_k = jnp.minimum(m, state.iter)
        valid = jnp.arange(m) < m_k

        # inner = dF_col_scaled @ dF (col entry = ||dF_col||^2 / scale^2);
        # rhs = F @ dF (col entry scaled) — both recovered from P.
        inner = (P[0] / scale).at[col].set(scale2 / (scale * scale))
        M = state.M.at[col, :].set(inner).at[:, col].set(inner)
        rhs = P[1].at[col].set(P[1, col] / scale)
        theta = _solve_theta(M, rhs, valid)

        u = G - dG @ (theta / dF_scale)

        col2 = (col + 1) % m
        dF = dF.at[:, col2].set(-F)
        dG = dG.at[:, col2].set(-G)
        new_state = state._replace(current_u=u, dF=dF, dG=dG,
                                   dF_scale=dF_scale, M=M, col_idx=col2)
        return new_state, u

    new_state, u = jax.lax.cond(state.iter == 0, first, general, state)
    return new_state._replace(iter=state.iter + 1), u
