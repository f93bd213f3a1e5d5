"""ALM/ADMM geometry optimization solver on TPU.

Re-implements ``ALMGeometrySolver<N>`` (Geometry/ALMGeometrySolver.h:52-463)
— the solver used by both PlanarityOpt and WireMeshOpt — as a compiled JAX
``while_loop``: separate hard/soft constraint transforms, exact hard
projection + weighted soft projection in the z-update, a per-coordinate
global solve (one MXU matmul against a precomputed dense inverse, or PCG),
a scaled-dual update on the hard block only, and safeguarded Anderson
acceleration over the (u, x) pair with accept/reject on the combined
residual ``||D_h x - z_h||^2 + ||D_h x - D_h x_prev||^2``
(ALMGeometrySolver.h:459-461).

The loop counts *accepted* iterations (ALMGeometrySolver.h:219-263): a
rejected trial rolls back to the last accepted iterate, restarts the AA
window, and forces the next trial to be accepted.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.meshio import save_residual_file
from ..core.timers import MicroTimer
from ..ops.constraints import (AngleBatch, ClosenessBatch, EdgeLengthBatch,
                               PlaneBatch, RefSurfaceBatch,
                               assemble_geometry_node_matrix, hostarr)
from . import anderson
from .linear import DenseInverseSolver, dense_inverse, pcg


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RegRows:
    """Padded regularization rows L (LinearRegularization.h:36-153):
    row r touches idx[r, :] with coefficients coef[r, :] (already scaled by
    sqrt(weight)); target rhs per row."""

    idx: jnp.ndarray     # (R, K) int32
    coef: jnp.ndarray    # (R, K)
    mask: jnp.ndarray    # (R, K) bool
    target: jnp.ndarray  # (R, 3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """Padded-row (ELL) sparse matrix for the constant global operator.

    The system matrix ``rho D_h^T D_h + D_s^T W^2 D_s + L^T L`` has a bounded
    mesh-stencil row width, so ``A v`` is one gather + FMA over (n, K) —
    ~50-100x cheaper per CG iteration than re-deriving D^T D through the
    constraint transform/scatter pipeline (the reference's analogue is its
    one-time sparse-Cholesky prefactorization, ALMGeometrySolver.h:143-153)."""

    idx: jnp.ndarray   # (n, K) int32 column indices (self-padded)
    coef: jnp.ndarray  # (n, K) values (0 in padding)

    @classmethod
    def from_csr(cls, A, dtype):
        n = A.shape[0]
        nnz = np.diff(A.indptr)
        K = max(int(nnz.max()), 1)
        idx = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, K))
        coef = np.zeros((n, K))
        r = np.repeat(np.arange(n), nnz)
        pos = np.arange(A.nnz) - np.repeat(A.indptr[:-1], nnz)
        idx[r, pos] = A.indices
        coef[r, pos] = A.data
        return cls(idx=jnp.asarray(idx.astype(np.int32)),
                   coef=jnp.asarray(coef.astype(dtype)))

    def apply(self, v):
        """v (n, c) -> A v (n, c)."""
        return jnp.einsum("nk,nkc->nc", self.coef, v[self.idx])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BsrMatrix:
    """Morton-blocked SpMV for the constant global operator, built for a
    backend whose gather unit runs at ~3 GB/s on 12-byte rows but ~25-75
    GB/s on 192-256-byte rows (measured; CLAUDE.md): vertices are permuted
    into Morton order and grouped into B-vertex blocks, each block-row
    stores a dense (B, deg*B) local matrix over its `deg` most-populated
    neighbor blocks (gathered as whole (B, 3) blocks), and the few entries
    that fall outside the deg cap spill into whole (B, B) blocks (see the
    sblk_* fields). ~4-5x faster per matvec than the flat ELL gather at
    wiremesh scale."""

    iperm: jnp.ndarray       # (n,) original vertex -> blocked position
    nbr: jnp.ndarray         # (nb, deg) int32 neighbor block ids
    a_loc: jnp.ndarray       # (nb, B, deg*B) dense local blocks
    # Entries beyond the deg cap, as whole (B, B) spill blocks: the r4 COO
    # form cost ~1.8 ms/CG-iteration in 12-byte-row gather/scatter traffic
    # (tools/bench_cg_pallas.py); block form gathers/scatters (B, 3) =
    # 192-byte rows, the backend's fast regime (CLAUDE.md).
    sblk_row: jnp.ndarray    # (ns,) int32 block-row ids
    sblk_nbr: jnp.ndarray    # (ns,) int32 neighbor block ids
    sblk_a: jnp.ndarray      # (ns, B, B) dense spill blocks
    block: int = _static(default=16)

    @classmethod
    def from_csr(cls, A, dtype, verts, block: int = 16, deg_cap: int = 12):
        """Host build. `verts` (n, 3) supplies the Morton order."""
        import scipy.sparse as sp
        n = A.shape[0]
        v = np.asarray(verts, np.float64)
        lo, hi = v.min(0), v.max(0)
        q = np.clip((v - lo) / np.maximum(hi - lo, 1e-30) * 1023.0,
                    0, 1023).astype(np.uint64)

        def spread(x):
            x = (x | (x << 32)) & np.uint64(0x1F00000000FFFF)
            x = (x | (x << 16)) & np.uint64(0x1F0000FF0000FF)
            x = (x | (x << 8)) & np.uint64(0x100F00F00F00F00F)
            x = (x | (x << 4)) & np.uint64(0x10C30C30C30C30C3)
            x = (x | (x << 2)) & np.uint64(0x1249249249249249)
            return x

        code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
            | (spread(q[:, 2]) << np.uint64(2))
        perm = np.argsort(code, kind="stable")    # blocked pos j -> original
        B = block
        nb = -(-n // B)
        n_pad = nb * B
        iperm = np.empty(n, np.int64)
        iperm[perm] = np.arange(n)                # original -> blocked pos
        # permute A into blocked numbering (pad rows/cols stay empty)
        coo = A.tocoo()
        Ap = sp.csr_matrix((coo.data, (iperm[coo.row], iperm[coo.col])),
                           shape=(n_pad, n_pad))
        Ap.sum_duplicates()
        # per block-row: neighbor block histogram, keep the deg_cap most
        # populated neighbor blocks (vectorized — nnz ~ 2M at wiremesh scale)
        coo_p = Ap.tocoo()
        rows, cols, data = coo_p.row.astype(np.int64), \
            coo_p.col.astype(np.int64), coo_p.data
        br, bc = rows // B, cols // B
        pair = br * nb + bc
        upair, counts = np.unique(pair, return_counts=True)
        ubr, ubc = upair // nb, upair % nb
        order = np.lexsort((-counts, ubr))
        ubr_s, ubc_s = ubr[order], ubc[order]
        rank = np.arange(len(ubr_s)) - np.searchsorted(
            ubr_s, ubr_s)                       # rank within block-row
        kept = rank < deg_cap
        # Unused slots self-pad: a duplicated neighbor slot double-gathers
        # the block but its local coefficients are zero — harmless.
        nbr_list = np.tile(np.arange(nb, dtype=np.int32)[:, None],
                           (1, deg_cap))
        nbr_list[ubr_s[kept], rank[kept]] = ubc_s[kept].astype(np.int32)

        # slot of each entry's (block-row, neighbor-block), -1 if spilled
        kept_pair = ubr_s[kept] * nb + ubc_s[kept]
        kept_slot = rank[kept]
        kp_order = np.argsort(kept_pair)
        kept_pair_s, kept_slot_s = kept_pair[kp_order], kept_slot[kp_order]
        pos = np.searchsorted(kept_pair_s, pair)
        pos = np.minimum(pos, len(kept_pair_s) - 1)
        hit = kept_pair_s[pos] == pair
        slot = np.where(hit, kept_slot_s[pos], -1)

        a_loc = np.zeros((nb, B, deg_cap * B), np.float64)
        m = slot >= 0
        np.add.at(a_loc,
                  (br[m], rows[m] - br[m] * B,
                   slot[m] * B + (cols[m] - bc[m] * B)), data[m])
        # Spilled entries grouped into whole (B, B) blocks by their
        # (block-row, neighbor-block) pair — mesh spills are clustered
        # (an excess neighbor block carries many vertex pairs), so the
        # block count ns is far below the entry count and the per-matvec
        # cost becomes one 192-byte-row block gather + batched matmul +
        # block scatter instead of the pathological 12-byte COO form.
        sp_r, sp_c, sp_v = rows[~m], cols[~m], data[~m]
        if len(sp_r):
            sbr, sbc = sp_r // B, sp_c // B
            spair = sbr * nb + sbc
            upair_s, inv = np.unique(spair, return_inverse=True)
            ns = len(upair_s)
            sblk_a = np.zeros((ns, B, B), np.float64)
            np.add.at(sblk_a, (inv, sp_r - sbr * B, sp_c - sbc * B), sp_v)
            sblk_row = (upair_s // nb).astype(np.int32)
            sblk_nbr = (upair_s % nb).astype(np.int32)
        else:
            sblk_row = np.zeros(1, np.int32)
            sblk_nbr = np.zeros(1, np.int32)
            sblk_a = np.zeros((1, B, B), np.float64)
        return cls(iperm=jnp.asarray(iperm.astype(np.int32)),
                   nbr=jnp.asarray(nbr_list),
                   a_loc=jnp.asarray(a_loc.astype(dtype)),
                   sblk_row=jnp.asarray(sblk_row),
                   sblk_nbr=jnp.asarray(sblk_nbr),
                   sblk_a=jnp.asarray(sblk_a.astype(dtype)),
                   block=B)

    @property
    def n_pad(self):
        return self.nbr.shape[0] * self.block

    def to_blocked(self, v):
        """(n, c) original numbering -> (n_pad, c) blocked numbering."""
        vp = jnp.zeros((self.n_pad,) + v.shape[1:], v.dtype)
        return vp.at[self.iperm].set(v)

    def from_blocked(self, vp, n):
        return vp[self.iperm]

    def apply_blocked(self, vp):
        """A v in blocked numbering: (n_pad, c) -> (n_pad, c). The CG loop
        runs entirely in blocked space (permute once per solve, not per
        matvec)."""
        B = self.block
        nb = self.nbr.shape[0]
        c = vp.shape[1]
        vb = vp.reshape(nb, B, c)
        neigh = vb[self.nbr]                       # (nb, deg, B, c) blocks
        neigh = neigh.reshape(nb, -1, c)           # (nb, deg*B, c)
        out = jnp.einsum("nbd,ndc->nbc", self.a_loc, neigh)
        extra = jnp.einsum("sij,sjc->sic", self.sblk_a, vb[self.sblk_nbr])
        out = out.at[self.sblk_row].add(extra)     # (B, c)-block scatter
        return out.reshape(nb * B, c)

    def apply(self, v):
        """v (n, c) -> A v (n, c) in original numbering."""
        return self.from_blocked(self.apply_blocked(self.to_blocked(v)),
                                 v.shape[0])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GeometrySystem:
    hard: tuple                      # hard constraint batches
    soft: tuple                      # soft constraint batches
    solver: Optional[DenseInverseSolver]
    precond_diag: Optional[jnp.ndarray]
    rhs_fixed: jnp.ndarray           # (n, 3) = L^T * reg_rhs
    mg: Optional["TwoLevelPrecond"] = None  # two-level precond (PCG path)
    ell: Optional[EllMatrix] = None         # constant-operator matvec (PCG)
    # Morton-blocked operator + blocked preconditioner data (large meshes):
    # the CG loop then runs in blocked numbering (permute once per solve).
    bsr: Optional[BsrMatrix] = None
    precond_diag_b: Optional[jnp.ndarray] = None   # (n_pad,)
    mg_b: Optional["TwoLevelPrecond"] = None
    reg: Optional[RegRows] = None
    # Delta-form anchors (set per solve): the loop state is delta = x - x0,
    # so every carried quantity is O(local scale) and f32 keeps ~1e-7
    # absolute precision even on meshes with coordinates ~1e3 (without this,
    # the combined residual floors at ~|x|^2 eps^2 and AA stalls).
    x0: Optional[jnp.ndarray] = None        # (n, 3)
    t0_hard: tuple = ()                     # D_h x0 per hard batch (f64->dt)
    t0_soft: tuple = ()                     # D_s x0 per soft batch
    Ax0: Optional[jnp.ndarray] = None       # A x0 (f64 host -> dt)
    # Multi-chip sharding (None = single device). vert_sharding pins the
    # (n, 3) vertex-row arrays (CG vectors, ELL matvec rows) over the mesh;
    # elem_sharding pins the per-constraint block tuples (z, u, Dx). The
    # reductions (CG dots, residual norms, AA inner products) become
    # XLA-inserted psums over ICI — SURVEY.md section 5.8 collectives.
    vert_sharding: Optional[object] = _static(default=None)
    elem_sharding: Optional[object] = _static(default=None)
    n_verts: int = _static(default=0)
    rho: float = _static(default=1.0)
    max_iter: int = _static(default=100)
    anderson_m: int = _static(default=5)
    accel: bool = _static(default=True)
    # Dynamic (traced) so tolerance experiments reuse one compiled program —
    # the big-mesh geometry solve takes minutes to compile on a tunneled TPU.
    cg_tol: float = 1e-12
    cg_max_iters: int = 400

    def constrain_elems(self, ts):
        if self.elem_sharding is None:
            return ts
        return tuple(jax.lax.with_sharding_constraint(t, self.elem_sharding)
                     for t in ts)

    def constrain_rows(self, x):
        if self.vert_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, self.vert_sharding)

    def transform_hard(self, x):
        return self.constrain_elems(tuple(b.transform(x) for b in self.hard))

    def transform_soft(self, x):
        return self.constrain_elems(tuple(b.transform(x) for b in self.soft))

    def dx_hard(self, delta):
        """D_h (x0 + delta) = t0 + D_h delta — exact in the local scale.
        Without anchors (x0 None) the state carries absolute x and this is
        the plain transform."""
        if not self.t0_hard:
            return self.transform_hard(delta)
        return self.constrain_elems(tuple(
            t0 + b.transform(delta)
            for b, t0 in zip(self.hard, self.t0_hard)))

    def dx_soft(self, delta):
        if not self.t0_soft:
            return self.transform_soft(delta)
        return self.constrain_elems(tuple(
            t0 + b.transform(delta)
            for b, t0 in zip(self.soft, self.t0_soft)))


class GeometryTrace(NamedTuple):
    x: jnp.ndarray
    function_values: jnp.ndarray  # (max_iter,)
    rejects: jnp.ndarray          # (max_iter,) total rejects before accept i
    n_trials: jnp.ndarray


def _flatten(ts):
    return jnp.concatenate([t.ravel() for t in ts])


def _unflatten(flat, templates):
    out, off = [], 0
    for t in templates:
        size = int(np.prod(t.shape))
        out.append(flat[off:off + size].reshape(t.shape))
        off += size
    return tuple(out)


def _sqnorm_all(ts):
    """||concat(ts)||^2 as per-block partial sums + scalar adds (see the
    physics twin: XLA's AllReduceCombiner merges the scalar psums; a
    concatenate-then-reduce variant costs O(z) all-gather traffic)."""
    return sum(jnp.sum(t * t) for t in ts)


def _solve_x(system: GeometrySystem, z_hard, u, z_soft, x_warm=None,
             with_iters=False):
    """x-update (ALMGeometrySolver::ADMM_x_update, :442-450) in delta form:
    A delta = rhs_fixed + rho D_h^T (z_h - u) + D_s^T W_s z_s - A x0."""
    rhs = system.rhs_fixed
    if system.Ax0 is not None:
        rhs = rhs - system.Ax0
    s = jnp.zeros_like(rhs)
    for b, zh, uh in zip(system.hard, z_hard, u):
        s = s + b.scatter(zh - uh, system.n_verts)
    rhs = rhs + system.rho * s
    for b, zs in zip(system.soft, z_soft):
        w2 = b.w.reshape(b.w.shape + (1,) * (zs.ndim - 1)) ** 2
        rhs = rhs + b.scatter(w2 * zs, system.n_verts)
    if system.solver is not None:
        x = system.solver.solve(rhs)
        return (x, jnp.zeros((), jnp.int32)) if with_iters else x

    if system.bsr is not None:
        # Blocked-space CG: one permute in, one out; every matvec and
        # preconditioner application stays in Morton-blocked numbering.
        # Row sharding carries into blocked space unchanged (the block
        # permutation maps rows to rows), so the CG vectors stay sharded
        # and the dots become psums — same collectives as the ELL path.
        bsr = system.bsr
        rhs_b = system.constrain_rows(bsr.to_blocked(rhs))
        x0_b = bsr.to_blocked(x_warm) if x_warm is not None else None
        mgb = system.mg_b
        from .linear import pcg_banded, use_pallas_cg
        if (use_pallas_cg() and system.vert_sharding is None
                and rhs_b.dtype == jnp.float32):
            # Pallas-fused CG vector updates (VERDICT r4 #1): measured
            # 2.42 -> 0.43 ms/CG-iteration of vector-op cost at wiremesh
            # scale (tools/bench_cg_pallas.py, real chip). Single-device
            # f32 only; the sharded path keeps the psum-friendly pcg.
            x_b, it = pcg_banded(
                bsr.apply_blocked, rhs_b, system.precond_diag_b,
                tol=system.cg_tol, max_iters=system.cg_max_iters, x0=x0_b,
                precond=mgb.apply if mgb is not None else None)
        else:
            x_b, it = pcg(bsr.apply_blocked, rhs_b, system.precond_diag_b,
                          tol=system.cg_tol, max_iters=system.cg_max_iters,
                          x0=x0_b,
                          precond=mgb.apply if mgb is not None else None,
                          row_sharding=system.vert_sharding)
        x = bsr.from_blocked(x_b, system.n_verts)
        return (x, it) if with_iters else x

    if system.ell is not None:
        operator = system.ell.apply
    else:
        def operator(v):
            out = jnp.zeros_like(v)
            sh = jnp.zeros_like(v)
            for b in system.hard:
                sh = sh + b.scatter(b.transform(v), system.n_verts)
            out = out + system.rho * sh
            for b in system.soft:
                t = b.transform(v)
                w2 = b.w.reshape(b.w.shape + (1,) * (t.ndim - 1)) ** 2
                out = out + b.scatter(w2 * t, system.n_verts)
            return out + _reg_apply(system, v)

    x, it = pcg(operator, system.constrain_rows(rhs), system.precond_diag,
                tol=system.cg_tol,
                max_iters=system.cg_max_iters, x0=x_warm,
                precond=system.mg.apply if system.mg is not None else None,
                row_sharding=system.vert_sharding)
    if with_iters:
        return x, it
    return x


def _reg_apply(system, v):
    # Regularization normal matrix applied matrix-free (CG path); the dense
    # path folds L^T L into the prefactorized matrix.
    if system.reg is None:
        return jnp.zeros_like(v)
    r = system.reg
    rows = jnp.einsum("rk,rkc->rc", r.coef * r.mask, v[r.idx])
    out = jnp.zeros_like(v)
    contrib = (r.coef * r.mask)[..., None] * rows[:, None, :]
    return out.at[r.idx.reshape(-1)].add(contrib.reshape(-1, 3))


def _alm_init_state(system: GeometrySystem, init_x):
    """Fresh ADMM+AA loop state (per-dispatch histories sized max_iter).
    In delta mode (system.x0 set) the carried 'x' is delta = x - x0 and
    starts at zero; init_x must then equal system.x0."""
    x0 = jnp.zeros_like(init_x) if system.x0 is not None else init_x
    u0 = tuple(jnp.zeros(b.block_shape, init_x.dtype) for b in system.hard)
    aa0 = anderson.init(max(system.anderson_m, 1),
                        jnp.concatenate([_flatten(u0), x0.ravel()]))
    max_iter = system.max_iter
    fv0 = jnp.full((max_iter,), jnp.nan, init_x.dtype)
    rj0 = jnp.zeros((max_iter,), jnp.int32)
    # Closest-point candidate caches (None for batches without one) — slack
    # -inf, so the first z-update refreshes them in-loop.
    cp0 = tuple(b.cp_cache_init(init_x.dtype)
                if hasattr(b, "cp_cache_init") else None
                for b in system.soft)
    return dict(x=x0, u=u0, dx=x0, du=u0, cp=cp0,
                prev=jnp.asarray(np.finfo(np.dtype(init_x.dtype)).max,
                                 init_x.dtype),
                reset=jnp.asarray(False), aa=aa0,
                it=jnp.zeros((), jnp.int32), trial=jnp.zeros((), jnp.int32),
                fv=fv0, rj=rj0, rejects=jnp.zeros((), jnp.int32),
                limit=jnp.asarray(max_iter, jnp.int32),
                max_trials=jnp.asarray(2 * max_iter + 4, jnp.int32),
                cgit=jnp.zeros((), jnp.int32))


@jax.jit
def solve_alm_chunk(system: GeometrySystem, state):
    """Run the accept/reject loop until ``it == limit`` (or the trial bound)
    and return the carried state. ``limit`` is dynamic so a chunked driver
    can reuse one compiled program for every dispatch; ``it`` counts accepted
    iterations within this dispatch and histories are per-dispatch arrays."""
    accel = system.accel

    def cond(st):
        # max_trials is the reference's single runaway bound of 2*iters+4
        # over the *whole* solve (ALMGeometrySolver.h:197); the chunked
        # driver carries ``trial`` across dispatches so the budget is global.
        return (st["it"] < st["limit"]) & (st["trial"] < st["max_trials"])

    def body(st):
        # st["x"] carries delta = x - x0 (see GeometrySystem delta anchors).
        cx, cu = st["x"], st["u"]
        dx_h = system.dx_hard(cx)              # D_h (x0 + delta)
        dx_s = system.dx_soft(cx)
        prev_dx_h = dx_h

        # z-update (:425-440): hard projects (D_h x + u); soft projects D_s x.
        z_h = system.constrain_elems(tuple(
            b.project(d + ui) for b, d, ui in zip(system.hard, dx_h, cu)))
        z_s, cps = [], []
        for b, d, c in zip(system.soft, dx_s, st["cp"]):
            if c is None:
                z_s.append(b.project(d))
                cps.append(None)
            else:
                z, c2 = b.project_cached(d, c)
                z_s.append(z)
                cps.append(c2)
        z_s = system.constrain_elems(tuple(z_s))
        cps = tuple(cps)

        new_x, n_cg = _solve_x(system, z_h, cu, z_s, x_warm=cx,
                               with_iters=True)
        dx_h2 = system.dx_hard(new_x)
        new_u = system.constrain_elems(tuple(
            ui + d - zh for ui, d, zh in zip(cu, dx_h2, z_h)))

        # Combined residual as ONE fused reduction over both norm terms.
        res = _sqnorm_all(tuple(d - zh for d, zh in zip(dx_h2, z_h))
                          + tuple(d - p for d, p in zip(dx_h2, prev_dx_h)))

        accept = (not accel) | st["reset"] | (res < st["prev"])

        def on_accept(st):
            fv = st["fv"].at[st["it"]].set(res)
            rj = st["rj"].at[st["it"]].set(st["rejects"])
            if accel:
                aa, mixed = anderson.compute(
                    st["aa"], jnp.concatenate([_flatten(new_u), new_x.ravel()]))
                usize = sum(int(np.prod(t.shape)) for t in new_u)
                nu = _unflatten(mixed[:usize], new_u)
                nx = mixed[usize:].reshape(new_x.shape)
            else:
                aa, nu, nx = st["aa"], new_u, new_x
            return dict(x=nx, u=nu, dx=new_x, du=new_u, cp=cps,
                        prev=res, reset=jnp.asarray(False), aa=aa,
                        it=st["it"] + 1, trial=st["trial"] + 1,
                        fv=fv, rj=rj, rejects=jnp.zeros((), jnp.int32),
                        limit=st["limit"], max_trials=st["max_trials"],
                        cgit=st["cgit"] + n_cg)

        def on_reject(st):
            aa = anderson.reset(
                st["aa"], jnp.concatenate([_flatten(st["du"]),
                                           st["dx"].ravel()]))
            # cps stays valid across the rollback: the cache self-checks
            # movement against its own p0, independent of accept/reject.
            return dict(x=st["dx"], u=st["du"], dx=st["dx"], du=st["du"],
                        cp=cps,
                        prev=st["prev"], reset=jnp.asarray(True), aa=aa,
                        it=st["it"], trial=st["trial"] + 1,
                        fv=st["fv"], rj=st["rj"],
                        rejects=st["rejects"] + 1, limit=st["limit"],
                        max_trials=st["max_trials"],
                        cgit=st["cgit"] + n_cg)

        return jax.lax.cond(accept, on_accept, on_reject, st)

    return jax.lax.while_loop(cond, body, state)


def solve_alm(system: GeometrySystem, init_x) -> GeometryTrace:
    """ALMGeometrySolver::solve_ADMM (ALMGeometrySolver.h:163-283).
    Trace.x holds *absolute* positions (x0 + delta when delta anchors are
    set), regardless of the internal delta-form state."""
    st = solve_alm_chunk(system, _alm_init_state(system, init_x))
    x_abs = st["dx"] if system.x0 is None else system.x0 + st["dx"]
    return GeometryTrace(x=x_abs, function_values=st["fv"],
                         rejects=st["rj"], n_trials=st["trial"])


@jax.jit
def soft_energy_delta(system: GeometrySystem, delta):
    """soft_energy evaluated through the delta-form anchors (accurate at f32
    on large-coordinate meshes; used for the Init/final energy prints)."""
    total = jnp.asarray(0.0, delta.dtype)
    for b, d in zip(system.soft, system.dx_soft(delta)):
        p = b.project(d)
        w2 = b.w.reshape(b.w.shape + (1,) * (d.ndim - 1)) ** 2
        total = total + 0.5 * jnp.sum(w2 * (d - p) ** 2)
    return total


@jax.jit
def soft_energy(system: GeometrySystem, x):
    """Weighted soft-constraint projection error: sum over soft constraints of
    0.5 * w^2 * ||D_s x - proj(D_s x)||^2 (Constraint::project with
    squared_deviation, Constraint.h:96-116; printed as 'Init/final energy',
    ALMGeometrySolver.h:186-192, 271-278)."""
    total = jnp.asarray(0.0, x.dtype)
    for b in system.soft:
        d = b.transform(x)
        p = b.project(d)
        w2 = b.w.reshape(b.w.shape + (1,) * (d.ndim - 1)) ** 2
        total = total + 0.5 * jnp.sum(w2 * (d - p) ** 2)
    return total


def _geometry_node_diag(n_points, hard, soft, rho, reg):
    """Diagonal of the geometry global matrix without materializing it
    (Jacobi preconditioner for the large-mesh PCG path)."""
    d = np.zeros(n_points)

    def add(b, scale_w, out_scale=1.0):
        if isinstance(b, PlaneBatch):
            idx = hostarr(b, 'idx')
            mask = hostarr(b, 'mask').astype(np.float64)
            cnt = hostarr(b, 'count')
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(idx))
            # diag of T^T T = T (projector): (1 - 1/k) per valid slot.
            contrib = (1.0 - 1.0 / cnt)[:, None] * mask * w2[:, None]
            np.add.at(d, idx, out_scale * contrib)
        elif isinstance(b, AngleBatch):
            idx = hostarr(b, 'idx')
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(idx))
            rowsq = np.array([2.0, 1.0, 1.0])
            np.add.at(d, idx, out_scale * w2[:, None] * rowsq[None, :])
        elif isinstance(b, EdgeLengthBatch):
            idx = hostarr(b, 'idx')
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(idx))
            np.add.at(d, idx, out_scale * w2[:, None] * np.ones(2)[None, :])
        elif isinstance(b, (ClosenessBatch, RefSurfaceBatch)):
            # identity reduction on single vertices
            idx = hostarr(b, 'idx')
            w2 = (hostarr(b, 'w') ** 2) if scale_w else np.ones(len(idx))
            np.add.at(d, idx, out_scale * w2)
        else:
            # A silent identity-reduction fallback would degrade the
            # preconditioner for any future batch with a different D^T D
            # diagonal — fail loudly instead (VERDICT r3 weak #6).
            raise TypeError(
                f"_geometry_node_diag: unknown constraint batch type "
                f"{type(b).__name__}; add its D^T D diagonal rule here")

    for b in hard:
        add(b, scale_w=False, out_scale=rho)
    for b in soft:
        add(b, scale_w=True)
    if reg is not None:
        idx, coef, mask = reg
        np.add.at(d, idx, (coef * mask) ** 2)
    return np.maximum(d, 1e-12)


class ALMGeometrySolver:
    """Host-side builder + driver mirroring the reference public API
    (add_hard_constraint / add_soft_constraint / add_closeness /
    add_*laplacian / setup_ADMM / solve_ADMM / get_solution / save,
    ALMGeometrySolver.h:81-365)."""

    def __init__(self, dense_threshold: int = 12000,
                 bsr_threshold: int = 50000):
        self.hard: List = []
        self.soft: List = []
        self.bsr_threshold = bsr_threshold
        self._bsr = None
        self.reg_rows: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self.system: Optional[GeometrySystem] = None
        self.dense_threshold = dense_threshold
        self._solution = None
        self.function_values: List[float] = []
        self.elapsed_time: List[float] = []
        self.anderson_reset: List[int] = []
        self.dtype = np.float64

    def add_hard_constraint(self, batch):
        self.hard.append(batch)

    def add_soft_constraint(self, batch):
        self.soft.append(batch)

    # -- regularization (LinearRegularization.h) --

    def add_closeness(self, idx, weight, target_pt):
        sw = np.sqrt(weight)
        self.reg_rows.append((np.asarray([idx]), np.asarray([sw]),
                              np.asarray(target_pt, np.float64) * sw))

    def _add_laplacian_helper(self, indices, coefs, weight, ref_points=None):
        sw = np.sqrt(weight)
        idx = np.asarray(indices, np.int64)
        coef = np.asarray(coefs, np.float64) * sw
        target = np.zeros(3)
        if ref_points is not None:
            target = (np.asarray(ref_points)[idx]
                      * np.asarray(coefs)[:, None]).sum(0) * sw
        self.reg_rows.append((idx, coef, target))

    def add_uniform_laplacian(self, indices, weight):
        n = len(indices)
        coefs = [1.0] + [-1.0 / (n - 1)] * (n - 1)
        self._add_laplacian_helper(indices, coefs, weight)

    def add_laplacian(self, indices, coefs, weight):
        self._add_laplacian_helper(indices, coefs, weight)

    def add_relative_uniform_laplacian(self, indices, weight, ref_points):
        n = len(indices)
        coefs = [1.0] + [-1.0 / (n - 1)] * (n - 1)
        self._add_laplacian_helper(indices, coefs, weight, ref_points)

    def add_relative_laplacian(self, indices, coefs, weight, ref_points):
        self._add_laplacian_helper(indices, coefs, weight, ref_points)

    # -- setup / solve --

    def setup_ADMM(self, n_points: int, penalty_param: float,
                   linear_solver: str = "auto") -> bool:
        t = MicroTimer()
        # Batches are created at f64 by the apps; cast their device arrays
        # to the solve dtype (f64 host mirrors kept for assembly/anchors) so
        # no f64 leaf reaches the jitted accept/reject loop under f32.
        from ..ops.constraints import cast_floats
        self.hard = [cast_floats(b, self.dtype) for b in self.hard]
        self.soft = [cast_floats(b, self.dtype) for b in self.soft]
        reg = None
        rhs_fixed = np.zeros((n_points, 3))
        if self.reg_rows:
            K = max(len(r[0]) for r in self.reg_rows)
            R = len(self.reg_rows)
            idx = np.zeros((R, K), np.int32)
            coef = np.zeros((R, K))
            mask = np.zeros((R, K), bool)
            target = np.zeros((R, 3))
            for i, (ii, cc, tt) in enumerate(self.reg_rows):
                idx[i, :len(ii)] = ii
                coef[i, :len(ii)] = cc
                mask[i, :len(ii)] = True
                target[i] = tt
            np.add.at(rhs_fixed, idx.reshape(-1),
                      (coef[..., None] * target[:, None, :]).reshape(-1, 3))
            reg = (idx, coef * mask, mask)

        use_dense = (linear_solver == "dense"
                     or (linear_solver == "auto"
                         and n_points <= self.dense_threshold))
        if use_dense:
            A = assemble_geometry_node_matrix(
                n_points, self.hard, self.soft, penalty_param, reg_rows=reg)
            solver = DenseInverseSolver(Ainv=dense_inverse(A, dtype=self.dtype))
            self._A_host = A          # f64, for the delta-form A x0 anchor
            precond = None
            mg = None
            ell = None
        else:
            solver = None
            from ..ops.constraints import assemble_geometry_node_matrix_sparse
            A_csr = assemble_geometry_node_matrix_sparse(
                n_points, self.hard, self.soft, penalty_param, reg_rows=reg)
            self._A_host = A_csr
            ell = EllMatrix.from_csr(A_csr, self.dtype)
            diag = np.asarray(A_csr.diagonal())
            precond = jnp.asarray(diag.astype(self.dtype))
            from .multigrid import build_two_level
            mg = build_two_level(n_points, self.hard, self.soft,
                                 penalty_param, reg, diag, dtype=self.dtype)

        reg_struct = None
        if reg is not None and not use_dense:
            idx, coef, mask = reg
            target = np.stack([t for _, _, t in self.reg_rows])
            reg_struct = RegRows(idx=jnp.asarray(idx),
                                 coef=jnp.asarray(coef.astype(self.dtype)),
                                 mask=jnp.asarray(mask),
                                 target=jnp.asarray(target.astype(self.dtype)))
        self.system = GeometrySystem(
            hard=tuple(self.hard), soft=tuple(self.soft),
            solver=solver, precond_diag=precond, mg=mg, ell=ell,
            rhs_fixed=jnp.asarray(rhs_fixed.astype(self.dtype)),
            reg=reg_struct,
            n_verts=n_points, rho=float(penalty_param))
        print(f"predecomposition time = {t.elapsed_s():.6f}")
        return True

    def solve_ADMM(self, init_x: np.ndarray, rel_residual_eps: float,
                   max_iter: int, anderson_m: int,
                   cg_tol: float = None, cg_max_iters: int = None,
                   chunk_iters: int = None):
        """Run the compiled accept/reject loop.

        chunk_iters (or env AAADMM_GEO_CHUNK) splits the run into several
        shorter device dispatches with carried state: large meshes on a
        tunneled TPU need this (a single multi-minute dispatch can exceed
        the transport's execution window), and it yields per-chunk wall
        times for the residual artifact. Semantics match the single-dispatch
        path: the runaway-trial bound (2*iters+4, matching the reference's
        accept-counting loop) is carried across chunks as one global
        budget."""
        assert self.system is not None
        if int(max_iter) < 1:
            # Nothing to run: return the init state unchanged.
            x0j = jnp.asarray(np.asarray(init_x, self.dtype))
            self._solution = np.asarray(init_x, np.float64).copy()
            self.function_values = []
            self.elapsed_time = []
            self.anderson_reset = []
            return GeometryTrace(x=x0j,
                                 function_values=jnp.zeros((0,), x0j.dtype),
                                 rejects=jnp.zeros((0,), jnp.int32),
                                 n_trials=jnp.zeros((), jnp.int32))
        if cg_tol is None:
            cg_tol = os.environ.get("AAADMM_GEO_CG_TOL")
        if cg_tol is None:
            # f32 can't reach 1e-12 relative; don't spin CG at max_iters.
            # 1e-4 suffices at f32: the accept/reject safeguard keeps the
            # inexact-ADMM iteration monotone and the converged error
            # metrics match the C++ (bench quality gates + golden-head
            # parity at this tolerance); tighten via AAADMM_GEO_CG_TOL.
            cg_tol = 1e-12 if self.dtype == np.float64 else 1e-4
        if chunk_iters is None:
            chunk_iters = int(os.environ.get("AAADMM_GEO_CHUNK", "0"))
        chunk = int(chunk_iters) if chunk_iters else int(max_iter)
        chunk = max(1, min(chunk, int(max_iter)))
        # Delta-form anchors: D x0 and A x0 in f64 on host once per solve.
        x0_np = np.asarray(init_x, np.float64)
        t0_h = tuple(jnp.asarray(b.transform_host(x0_np).astype(self.dtype))
                     for b in self.hard)
        t0_s = tuple(jnp.asarray(b.transform_host(x0_np).astype(self.dtype))
                     for b in self.soft)
        Ax0 = np.asarray(self._A_host @ x0_np)
        bsr_kw = {}
        # The blocked operator trades gathered bytes for streamed dense
        # bytes — a win on the TPU's gather unit, a large loss on CPU
        # (where the flat ELL gather is already fast); keep ELL there.
        # AAADMM_FORCE_BSR=1 bypasses both gates (sharded-BSR parity tests
        # on the virtual CPU mesh).
        if (self.system.solver is None
                and (os.environ.get("AAADMM_FORCE_BSR") == "1"
                     or (self.system.n_verts >= self.bsr_threshold
                         and jax.default_backend() != "cpu"))):
            if getattr(self, "_bsr", None) is None:
                # deg_cap trades zero-padding bandwidth in a_loc against
                # COO spill size: 9 streams 25% fewer a_loc bytes per
                # matvec than 12 for the same converged quality (measured;
                # AAADMM_BSR_CAP to experiment).
                cap = int(os.environ.get("AAADMM_BSR_CAP", "9"))
                self._bsr = BsrMatrix.from_csr(self._A_host, self.dtype,
                                               x0_np, deg_cap=cap)
                n_pad = self._bsr.n_pad
                diag_b = np.ones(n_pad)
                diag = np.asarray(self._A_host.diagonal())
                iperm = np.asarray(self._bsr.iperm)
                diag_b[iperm] = np.maximum(diag, 1e-12)
                self._diag_b = jnp.asarray(diag_b.astype(self.dtype))
                self._mg_b = None
                if self.system.mg is not None:
                    mg = self.system.mg
                    agg_b = np.zeros(n_pad, np.int32)
                    agg_b[iperm] = np.asarray(mg.agg)
                    invd_b = np.zeros(n_pad)
                    invd_b[iperm] = np.asarray(mg.inv_diag)
                    self._mg_b = dataclasses.replace(
                        mg, agg=jnp.asarray(agg_b),
                        inv_diag=jnp.asarray(invd_b.astype(self.dtype)))
            bsr_kw = dict(bsr=self._bsr, precond_diag_b=self._diag_b,
                          mg_b=self._mg_b)
        # Gather-form scatter adjoints (PERF.md r5): on the accelerator the
        # per-trial rhs assembly scatters cost ~49 ms/trial at wiremesh
        # scale through the slow 12-byte-row scatter path; the padded
        # per-vertex gather form runs ~3x faster (wiremesh 35.2 -> 31.5 s).
        # AT-SCALE (BSR-path) SOLVES ONLY: the small planarity scenes are
        # latency-bound (no win) and the changed f32 summation order
        # measurably perturbs their chaotic accept/reject + cp-cache-slack
        # trajectories (airport3k went 7x slower via chronic refreshes when
        # this was armed globally). Built once per solver (cached — the
        # pytree structure change would otherwise recompile every solve).
        # The sharded path keeps segment_sum (its psum structure is the
        # multichip contract), as does CPU.
        if (bool(bsr_kw)
                and self.system.vert_sharding is None
                and jax.default_backend() != "cpu"
                and os.environ.get("AAADMM_GATHER_SCATTER", "1") != "0"):
            if getattr(self, "_armed_batches", None) is None:
                from ..ops.constraints import with_gather_adjoint
                self._armed_batches = (
                    tuple(with_gather_adjoint(b, self.system.n_verts)
                          for b in self.system.hard),
                    tuple(with_gather_adjoint(b, self.system.n_verts)
                          for b in self.system.soft))
            self.system = dataclasses.replace(
                self.system, hard=self._armed_batches[0],
                soft=self._armed_batches[1])
        self.system = dataclasses.replace(
            self.system, max_iter=chunk,
            anderson_m=int(anderson_m), accel=anderson_m > 0,
            cg_tol=float(cg_tol),
            cg_max_iters=int(cg_max_iters or self.system.cg_max_iters),
            x0=jnp.asarray(x0_np.astype(self.dtype)),
            t0_hard=t0_h, t0_soft=t0_s,
            Ax0=jnp.asarray(Ax0.astype(self.dtype)),
            **bsr_kw)
        if self.system.vert_sharding is not None:
            # shard() ran before the per-solve anchor/BSR construction:
            # re-place so the delta anchors and the blocked operator/
            # preconditioner rows are device-sharded too (idempotent).
            from ..parallel.geometry import shard_geometry_system
            self.system = shard_geometry_system(
                self.system, self.system.vert_sharding.mesh)
        x0 = jnp.asarray(np.asarray(init_x, self.dtype))
        e0 = float(soft_energy_delta(self.system, jnp.zeros_like(x0)))
        print(f"Init energy = {e0}")

        state = _alm_init_state(self.system, x0)
        # One global runaway budget over the whole solve, like the
        # reference's single accept-counting loop (not per chunk).
        state["max_trials"] = jnp.asarray(2 * int(max_iter) + 4, jnp.int32)
        # Warm the chunk program with a zero-iteration dispatch so the solve
        # timer measures solving, not XLA compilation (the analogue of the
        # reference's prefactorization being outside its solve loop; on the
        # tunneled TPU a fresh compile is tens of seconds).
        warm = dict(state)
        warm["limit"] = jnp.zeros((), jnp.int32)
        jax.block_until_ready(solve_alm_chunk(self.system, warm)["x"])
        t = MicroTimer()
        fvs, rjs, times = [], [], [0.0]
        done, trials = 0, 0
        while done < int(max_iter):
            lim = min(chunk, int(max_iter) - done)
            state["limit"] = jnp.asarray(lim, jnp.int32)
            state["it"] = jnp.zeros((), jnp.int32)
            state["fv"] = jnp.full((chunk,), jnp.nan, x0.dtype)
            state["rj"] = jnp.zeros((chunk,), jnp.int32)
            state["cgit"] = jnp.zeros((), jnp.int32)
            state = solve_alm_chunk(self.system, state)
            # One transfer for everything the host needs — on a tunneled TPU
            # each separate fetch pays a full round trip.
            h_it, h_trial, h_fv, h_rj, h_cg = jax.device_get(
                (state["it"], state["trial"], state["fv"], state["rj"],
                 state["cgit"]))
            n_acc = int(h_it)
            trials = int(h_trial)  # cumulative: carried across chunks
            fvs.append(np.asarray(h_fv)[:n_acc])
            rjs.append(np.asarray(h_rj)[:n_acc])
            times.append(t.elapsed_s())
            done += lim
            if chunk < int(max_iter) and os.environ.get("AAADMM_GEO_VERBOSE"):
                print(f"  chunk done: iters {done}/{max_iter}, "
                      f"cg iters this chunk = {int(h_cg)}, "
                      f"t = {times[-1]:.1f}s", flush=True)
            if n_acc < lim:   # trial bound hit — no progress possible
                break
        total = times[-1]
        delta = state["dx"]
        # Absolute solution reconstructed in f64 on host: x0 was kept exact.
        self._solution = x0_np + np.asarray(delta, np.float64)
        # Trace.x holds absolute positions (not the internal delta state).
        trace = GeometryTrace(x=jnp.asarray(self._solution.astype(self.dtype)),
                              function_values=jnp.asarray(np.concatenate(fvs)),
                              rejects=jnp.asarray(np.concatenate(rjs)),
                              n_trials=jnp.asarray(trials, jnp.int32))
        fv = np.asarray(trace.function_values)
        valid = ~np.isnan(fv)
        n = int(valid.sum())
        self.function_values = [float(v) for v in fv[valid]]
        # Interpolate iteration timestamps within each chunk window.
        self.elapsed_time = []
        t_prev, i_seen = 0.0, 0
        for chunk_fv, t_end in zip(fvs, times[1:]):
            k = len(chunk_fv)
            for j in range(k):
                self.elapsed_time.append(
                    t_prev + (t_end - t_prev) * (j + 1) / max(k, 1))
            t_prev = t_end
            i_seen += k
        self.elapsed_time = self.elapsed_time[:n]
        self.anderson_reset = [int(r) for r in np.asarray(trace.rejects)[valid]]
        ef = float(soft_energy_delta(self.system, delta))
        print(f"final energy = {ef}")
        print(f"solve time = {total:.3f}s for {n} accepted iterations")
        return trace

    def shard(self, mesh):
        """Shard the compiled system over a device mesh (call after
        setup_ADMM, before solve_ADMM). Multi-chip global step: ELL matvec
        rows + CG vectors + constraint blocks sharded over 'elem', CG dots
        and residual norms psum'd — see parallel/geometry.py."""
        assert self.system is not None, "setup_ADMM first"
        from ..parallel.geometry import shard_geometry_system
        self.system = shard_geometry_system(self.system, mesh)

    def get_solution(self) -> np.ndarray:
        return self._solution

    def output_iteration_history(self):
        for i, (t, v) in enumerate(zip(self.elapsed_time, self.function_values)):
            line = f"Iteration {i}: {t:.6f} secs,  target value {v:.16g}"
            if i < len(self.anderson_reset) and self.anderson_reset[i]:
                line += " (reject accelerator)"
            print(line)

    def save(self, anderson_m: int, result_dir: str = "result"):
        name = (f"residual-{anderson_m}.txt" if anderson_m > 0
                else "residual-no.txt")
        save_residual_file(os.path.join(result_dir, name),
                           self.elapsed_time, self.function_values)
