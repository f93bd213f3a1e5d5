"""Global-step linear solvers, TPU-first.

The reference prefactorizes the constant SPD system with sparse Cholesky and
backsolves per iteration (LinearSolver.hpp:36-92, SPDSolver.h:37-95).
Sequential sparse triangular solves are hostile to TPUs, so this module
offers two idiomatic replacements:

* ``DenseInverseSolver`` — for small/medium systems (the reference's own
  benchmark scenes are 600-60k nodes; everything but WireMeshOpt fits): the
  per-coordinate n x n system matrix is assembled and Cholesky-inverted once
  on the host in f64, and each ADMM iteration's solve becomes a single MXU
  matmul ``A^-1 @ rhs`` over all coordinate columns at once. Exact (to
  roundoff), like the reference's direct solve.

* ``pcg`` — matrix-free Jacobi-preconditioned conjugate gradients for large
  systems, run simultaneously over all coordinate columns; the only
  reductions are dot products (psum-able across a device mesh).

The system matrix is identical per coordinate (the reference solves N times
with the same factorization, ALMGeometrySolver.h:442-450), so both paths
solve (n, ncoord) blocks in one shot.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.elements import hostarr


def assemble_node_matrix(n_verts: int, batches, dt2p: float = 1.0,
                         masses: Optional[np.ndarray] = None) -> np.ndarray:
    """Host-side dense assembly of the per-coordinate system matrix
    ``M + dt2p * D^T W^2 D`` (n x n over nodes; identical for x/y/z because
    the reduction acts per coordinate — Solver.cpp:459-470).

    batches: element batches (TetBatch/TriBatch/PinBatch/CollisionBatch).
    """
    A = np.zeros((n_verts, n_verts))
    if masses is not None:
        A[np.arange(n_verts), np.arange(n_verts)] += np.asarray(masses)
    for b in batches:
        w2 = hostarr(b, 'w').astype(np.float64) ** 2
        if hasattr(b, "Dm_inv"):       # tets
            Dm = hostarr(b, 'Dm_inv').astype(np.float64)           # (E,3,3)
            G = np.concatenate([-Dm.sum(axis=1, keepdims=True), Dm], axis=1)  # (E,4,3)
            K = np.einsum("e,eir,ejr->eij", w2, G, G)       # (E,4,4)
            idx = hostarr(b, 'tets')
            np.add.at(A, (idx[:, :, None], idx[:, None, :]), K)
        elif hasattr(b, "rest_inv"):   # tris
            R = hostarr(b, 'rest_inv').astype(np.float64)          # (E,2,2)
            G = np.concatenate([-R.sum(axis=1, keepdims=True), R], axis=1)    # (E,3,2)
            K = np.einsum("e,eir,ejr->eij", w2, G, G)       # (E,3,3)
            idx = hostarr(b, 'tris')
            np.add.at(A, (idx[:, :, None], idx[:, None, :]), K)
        else:                           # identity reduction on a vertex
            idx = hostarr(b, 'idx')
            np.add.at(A, (idx, idx), w2)
    if dt2p != 1.0:
        if masses is not None:
            A[np.arange(n_verts), np.arange(n_verts)] -= np.asarray(masses)
        A *= dt2p
        if masses is not None:
            A[np.arange(n_verts), np.arange(n_verts)] += np.asarray(masses)
    return A


def assemble_node_diag(n_verts: int, batches) -> np.ndarray:
    """Diagonal of D^T W^2 D per node (for the Jacobi preconditioner) without
    materializing the matrix — O(E) host work for arbitrarily large meshes."""
    d = np.zeros(n_verts)
    for b in batches:
        w2 = hostarr(b, 'w').astype(np.float64) ** 2
        if hasattr(b, "Dm_inv"):
            Dm = hostarr(b, 'Dm_inv').astype(np.float64)
            G = np.concatenate([-Dm.sum(axis=1, keepdims=True), Dm], axis=1)
            np.add.at(d, hostarr(b, 'tets'), w2[:, None] * (G ** 2).sum(axis=-1))
        elif hasattr(b, "rest_inv"):
            R = hostarr(b, 'rest_inv').astype(np.float64)
            G = np.concatenate([-R.sum(axis=1, keepdims=True), R], axis=1)
            np.add.at(d, hostarr(b, 'tris'), w2[:, None] * (G ** 2).sum(axis=-1))
        else:
            np.add.at(d, hostarr(b, 'idx'), w2)
    return d


def dense_inverse(A_free: np.ndarray, dtype=None) -> jnp.ndarray:
    """Cholesky-based SPD inverse computed once on host in f64."""
    import scipy.linalg
    c, low = scipy.linalg.cho_factor(A_free.astype(np.float64))
    inv = scipy.linalg.cho_solve((c, low), np.eye(A_free.shape[0]))
    if dtype is not None:
        inv = inv.astype(dtype)
    return jnp.asarray(inv)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseInverseSolver:
    Ainv: jnp.ndarray  # (nf, nf)

    def solve(self, rhs):
        """rhs (nf, ncoord) -> (nf, ncoord): one MXU matmul."""
        return self.Ainv @ rhs


def pcg(operator: Callable, rhs, diag, tol: float = 1e-12,
        max_iters: int = 400, x0=None, precond: Optional[Callable] = None,
        row_sharding=None):
    """Preconditioned CG on (n, ncoord) blocks.

    operator: v (n, c) -> A v (n, c), matrix-free.
    diag: (n,) diagonal of A — the default Jacobi preconditioner.
    precond: optional M^-1 r callable (e.g. multigrid.TwoLevelPrecond.apply)
      overriding Jacobi; must be SPD.
    row_sharding: optional NamedSharding pinning the n axis of the CG
      vectors across devices each iteration (multi-chip global step: the
      matvec rows stay sharded, the dot products become psums over ICI).
    Returns (x, n_iters). Per-column alpha/beta; converged columns freeze.
    """
    if precond is None:
        Minv_diag = (1.0 / diag)[:, None]
        precond = lambda r: Minv_diag * r
    pin = (lambda a: a) if row_sharding is None else \
        (lambda a: jax.lax.with_sharding_constraint(a, row_sharding))
    x = jnp.zeros_like(rhs) if x0 is None else x0
    x = pin(x)
    r = pin(rhs - operator(x))
    z = precond(r)
    p = pin(z)
    # {r.z, r.r} in ONE stacked reduction (one psum per CG iteration instead
    # of two; rr is carried so the loop cond re-reduces nothing). With the
    # p.Ap reduction this leaves exactly 2 collectives per iteration — the
    # alpha->r dependency makes p.Ap unfusable with r-side reductions
    # (VERDICT r3 #4, SURVEY section 5.8).
    s = jnp.sum(jnp.stack([r * z, r * r]), axis=1)
    rz, rr = s[0], s[1]
    rhs_norm2 = jnp.maximum(jnp.sum(rhs * rhs, axis=0), 1e-300)
    tol2 = tol * tol

    def cond(carry):
        x, r, p, rz, rr, it = carry
        return (it < max_iters) & jnp.any(rr / rhs_norm2 > tol2)

    def body(carry):
        x, r, p, rz, rr, it = carry
        Ap = pin(operator(p))
        pAp = jnp.sum(p * Ap, axis=0)
        active = (rr / rhs_norm2) > tol2
        alpha = jnp.where(active, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = pin(x + alpha[None, :] * p)
        r = pin(r - alpha[None, :] * Ap)
        z = precond(r)
        s = jnp.sum(jnp.stack([r * z, r * r]), axis=1)
        rz_new, rr_new = s[0], s[1]
        beta = jnp.where(active, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = pin(z + beta[None, :] * p)
        return x, r, p, rz_new, rr_new, it + 1

    x, r, p, rz, rr, it = jax.lax.while_loop(
        cond, body, (x, r, p, rz, rr, jnp.int32(0)))
    return x, it


def use_pallas_cg() -> bool:
    """Banded (Pallas-fused) CG is the default on accelerator backends for
    f32 solves; AAADMM_PALLAS=0 opts out. On CPU the interpreter would be
    slower than XLA, so the jnp path stays (tests force it explicitly)."""
    import os
    env = os.environ.get("AAADMM_PALLAS")
    if env is not None:
        return env != "0"
    return jax.default_backend() != "cpu"


def pcg_banded(operator: Callable, rhs, diag, tol: float = 1e-12,
               max_iters: int = 400, x0=None,
               precond: Optional[Callable] = None, row_sharding=None):
    """pcg with the vector half of each iteration fused into two Pallas
    kernels (ops/pallas_kernels.py; VERDICT r4 #1): the device trace showed
    ~3 ms/CG-iteration of small (n, 3) fusions (x/r/p axpys + stacked dots)
    around the at-roof matvec+preconditioner pair. Here the CG vectors are
    carried in band layout — (n, c) viewed as (c*8, n/8), the free reshape
    of the transpose — so per-column dots are 8-sublane band sums and one
    kernel covers {pAp, alpha, x, r, rr} while a second covers
    {rz, beta, p}; the operator/preconditioner boundaries transpose back.

    Same semantics as pcg (per-column alpha/beta, frozen converged
    columns); f32 reduction order differs (banded sums), so trajectories
    match pcg to roundoff, not bitwise. Single-device only (the band
    carries are not row-sharded; the sharded multi-chip path keeps pcg)."""
    from ..ops import pallas_kernels as pk

    if precond is None:
        Minv_diag = (1.0 / diag)[:, None]
        precond = lambda r: Minv_diag * r
    n, c = rhs.shape
    x = jnp.zeros_like(rhs) if x0 is None else x0
    r = rhs - operator(x)
    z = precond(r)
    p = z
    s = jnp.sum(jnp.stack([r * z, r * r]), axis=1)
    rz, rr = s[0], s[1]
    thresh = jnp.maximum(jnp.sum(rhs * rhs, axis=0), 1e-300) * (tol * tol)
    xb, rb, pb = pk.to_band(x), pk.to_band(r), pk.to_band(p)

    def cond(carry):
        xb, rb, pb, rz, rr, it = carry
        return (it < max_iters) & jnp.any(rr > thresh)

    def body(carry):
        xb, rb, pb, rz, rr, it = carry
        Ap = operator(pk.from_band(pb, n, c))
        xb, rb, rr_new = pk.cg_update1(rz, pb, pk.to_band(Ap), xb, rb,
                                       rr_prev=rr, thresh=thresh)
        z = precond(pk.from_band(rb, n, c))
        pb, rz_new = pk.cg_update2(rz, rb, pk.to_band(z), pb,
                                   rr_prev=rr, thresh=thresh)
        return xb, rb, pb, rz_new, rr_new, it + 1

    xb, rb, pb, rz, rr, it = jax.lax.while_loop(
        cond, body, (xb, rb, pb, rz, rr, jnp.int32(0)))
    return pk.from_band(xb, n, c), it
