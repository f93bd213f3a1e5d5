"""Two-level aggregation preconditioner for the large-mesh global step.

The reference amortizes the geometry global step with a one-time sparse
Cholesky factorization (Geometry/SPDSolver.h:37-95) and pays an O(nnz)
sequential backsolve per iteration.  Sequential triangular solves are
hostile to TPUs, so the large-mesh path here uses matrix-free PCG
(solver/linear.py::pcg) — but plain Jacobi-preconditioned CG needs many
iterations on the wire-mesh systems (the graph Laplacian-like matrix
``rho D_h^T D_h + D_s^T W^2 D_s`` has a long tail of smooth low-frequency
error modes).

This module removes those smooth modes with a classic two-level
aggregation preconditioner, built once on host at setup time (the system
matrix is constant across all ADMM iterations, exactly like the
reference's factorization):

* ``greedy_aggregate`` — AMG-style greedy graph aggregation over the
  constraint connectivity graph, repeated until the coarse problem is
  small enough to dense-invert (a few thousand unknowns).
* The coarse operator ``A_c = P^T A P`` for the piecewise-constant
  prolongation ``P`` is assembled directly from the constraint batches by
  index remapping (no fine matrix is ever materialized).
* On device, one preconditioner application is
  ``M^-1 r = omega * r / diag(A)  +  P (A_c^-1 (P^T r))``:
  a segment_sum (restriction), one dense (nc, nc) @ (nc, 3) MXU matmul
  (coarse solve), and a gather (prolongation).  All fixed-shape, fully
  fused by XLA into the CG loop.

The additive form keeps the preconditioner SPD (sum of SPD terms), so CG
convergence theory applies unchanged.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def collect_pair_edges(batches, reg_rows=None):
    """Vertex-adjacency edges implied by constraint batches: every pair of
    vertices sharing a constraint row.  Host-side, setup only."""
    from ..ops.constraints import hostarr
    pairs = []
    for b in batches:
        idx = hostarr(b, 'idx')
        if idx.ndim == 1:
            continue  # single-vertex constraints carry no adjacency
        mask = None
        try:
            mask = hostarr(b, 'mask')
        except Exception:
            mask = None
        C, K = idx.shape
        for i in range(K):
            for j in range(i + 1, K):
                a, c = idx[:, i], idx[:, j]
                if mask is not None:
                    keep = mask[:, i] & mask[:, j]
                    a, c = a[keep], c[keep]
                pairs.append(np.stack([a, c], axis=1))
    if reg_rows is not None:
        idx, coef, mask = reg_rows
        C, K = idx.shape
        for i in range(K):
            for j in range(i + 1, K):
                keep = mask[:, i] & mask[:, j]
                pairs.append(np.stack([idx[keep, i], idx[keep, j]], axis=1))
    if not pairs:
        return np.zeros((0, 2), np.int64)
    e = np.concatenate(pairs, axis=0).astype(np.int64)
    e = np.sort(e, axis=1)
    e = e[e[:, 0] != e[:, 1]]
    return np.unique(e, axis=0)


def _aggregate_once(n: int, edges: np.ndarray) -> np.ndarray:
    """One round of greedy aggregation: sweep vertices; an unaggregated
    vertex roots a new aggregate absorbing its unaggregated neighbors;
    leftovers attach to the most-connected neighboring aggregate."""
    # CSR adjacency
    if len(edges):
        src = np.concatenate([edges[:, 0], edges[:, 1]])
        dst = np.concatenate([edges[:, 1], edges[:, 0]])
        order = np.argsort(src, kind='stable')
        src, dst = src[order], dst[order]
        starts = np.searchsorted(src, np.arange(n + 1))
    else:
        dst = np.zeros(0, np.int64)
        starts = np.zeros(n + 1, np.int64)

    agg = np.full(n, -1, np.int64)
    next_agg = 0
    for v in range(n):
        if agg[v] >= 0:
            continue
        nbrs = dst[starts[v]:starts[v + 1]]
        free = nbrs[agg[nbrs] < 0]
        # Root only if the whole neighborhood is free (standard strength-free
        # aggregation heuristic: avoids many tiny aggregates).
        if len(free) == len(nbrs) or len(nbrs) == 0:
            agg[v] = next_agg
            agg[free] = next_agg
            next_agg += 1
    # Attach leftovers to the neighboring aggregate they touch most.
    for v in range(n):
        if agg[v] >= 0:
            continue
        nbrs = dst[starts[v]:starts[v + 1]]
        anbrs = agg[nbrs]
        anbrs = anbrs[anbrs >= 0]
        if len(anbrs):
            vals, counts = np.unique(anbrs, return_counts=True)
            agg[v] = vals[np.argmax(counts)]
        else:
            agg[v] = next_agg
            next_agg += 1
    return agg


def greedy_aggregate(n_verts: int, edges: np.ndarray,
                     target_coarse: int = 4000,
                     max_rounds: int = 4) -> np.ndarray:
    """Repeat aggregation until the coarse side is <= target_coarse (or
    coarsening stalls).  Returns agg (n_verts,) int32."""
    agg = np.arange(n_verts, dtype=np.int64)
    cur_n, cur_edges = n_verts, edges
    for _ in range(max_rounds):
        # Each round coarsens ~4-6x; stop once within reach of the target
        # rather than overshooting far below it (a too-small coarse space
        # costs many extra PCG iterations per ADMM step).
        if cur_n <= target_coarse * 1.5:
            break
        a = _aggregate_once(cur_n, cur_edges)
        nc = int(a.max()) + 1 if len(a) else 0
        if nc >= cur_n:  # stalled
            break
        agg = a[agg]
        ce = a[cur_edges]
        ce = np.sort(ce, axis=1)
        ce = ce[ce[:, 0] != ce[:, 1]]
        cur_edges = np.unique(ce, axis=0)
        cur_n = nc
    return agg.astype(np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TwoLevelPrecond:
    """Additive two-level preconditioner; `apply` is the M^-1 r operator
    handed to pcg."""

    agg: jnp.ndarray      # (n,) int32 vertex -> aggregate
    Ac_inv: jnp.ndarray   # (nc, nc) dense inverse of the coarse operator
    inv_diag: jnp.ndarray  # (n,) 1/diag(A) — the Jacobi (smoother) term

    def apply(self, r):
        rc = jax.ops.segment_sum(r, self.agg,
                                 num_segments=self.Ac_inv.shape[0])
        yc = self.Ac_inv @ rc
        return self.inv_diag[:, None] * r + yc[self.agg]


def build_two_level(n_verts, hard, soft, rho, reg_rows, diag,
                    dtype=np.float64, target_coarse: int = None):
    """Assemble the preconditioner on host (setup time, like the reference's
    predecomposition).  `diag` is the fine-grid diagonal of A.

    target_coarse defaults to n/24 clipped to [4000, 8000]: larger coarse
    spaces cut PCG iterations markedly on big meshes, while 8k keeps the
    one-time host Cholesky inversion of A_c under ~a minute."""
    if target_coarse is None:
        import os
        env = os.environ.get("AAADMM_MG_COARSE")
        # 6000 cap: each preconditioner application streams the dense
        # (nc, nc) coarse inverse, so nc^2 is a per-CG-iteration cost;
        # 6000 (144 MB at f32, ~2.5 ms) beats 8000 (256 MB, ~4 ms) at
        # equal converged quality under the capped-CG budget (measured).
        # `env is not None` (not falsy-string): AAADMM_MG_COARSE=0 must be
        # rejected loudly, not silently fall back to the default (ADVICE r4).
        if env is not None:
            target_coarse = int(env)
            if target_coarse < 100:
                raise ValueError(
                    f"AAADMM_MG_COARSE={target_coarse}: the coarse space must "
                    f"have at least 100 aggregates (a degenerate coarse space "
                    f"silently destroys the preconditioner)")
        else:
            target_coarse = int(np.clip(n_verts // 24, 4000, 6000))
    from ..ops.constraints import assemble_geometry_node_matrix
    edges = collect_pair_edges(list(hard) + list(soft), reg_rows)
    agg = greedy_aggregate(n_verts, edges, target_coarse=target_coarse)
    nc = int(agg.max()) + 1
    Ac = assemble_geometry_node_matrix(nc, hard, soft, rho,
                                       reg_rows=reg_rows, vertex_map=agg)
    # Aggregates can zero out difference-form constraints; keep SPD.
    Ac[np.arange(nc), np.arange(nc)] += 1e-10 * max(Ac.max(), 1.0)
    from .linear import dense_inverse
    return TwoLevelPrecond(
        agg=jnp.asarray(agg),
        Ac_inv=dense_inverse(Ac, dtype=dtype),
        inv_diag=jnp.asarray((1.0 / np.maximum(diag, 1e-300)).astype(dtype)))
