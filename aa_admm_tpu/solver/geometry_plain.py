"""Plain AA-ADMM geometry solver — the alternate formulation
(Geometry/GeometrySolver.h:52-460; compiled but not used by the shipped
mains; kept as a first-class config in the reference and here).

Differences from the ALM solver (solver/geometry.py):
  * one unified unweighted reduction D over hard AND soft constraints;
  * soft constraints are folded into the z-update by blending projection and
    input with a = rho/(w^2+rho) (Constraint::project_and_combine,
    Constraint.h:118-130);
  * global matrix rho D^T D + L^T L; dual update over the full z block;
  * residual = ||D x - z|| gates accept/reject; AA over (u, x) with
    *effective dimension = u only* (GeometrySolver.h:170-176);
  * every trial counts as an iteration (iter_count++ unconditional,
    GeometrySolver.h:214-224) -> the loop is a fixed-length scan.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.constraints import assemble_geometry_node_matrix
from . import anderson
from .linear import DenseInverseSolver, dense_inverse
from .geometry import RegRows, _flatten, _unflatten, _sqnorm_all


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlainGeometrySystem:
    hard: tuple
    soft: tuple
    solver: Optional[DenseInverseSolver]
    rhs_fixed: jnp.ndarray
    n_verts: int = _static(default=0)
    rho: float = _static(default=1.0)
    max_iter: int = _static(default=100)
    anderson_m: int = _static(default=5)
    accel: bool = _static(default=True)


class PlainTrace(NamedTuple):
    x: jnp.ndarray
    function_values: jnp.ndarray
    resets: jnp.ndarray


def _transform_all(system, x):
    return (tuple(b.transform(x) for b in system.hard),
            tuple(b.transform(x) for b in system.soft))


def _z_update(system, dx_h, dx_s, u_h, u_s):
    """Hard: project(Dx+u). Soft: blend a*(Dx+u) + (1-a)*proj(Dx+u) with
    a = rho/(w^2+rho) (GeometrySolver::ADMM_z_update, :425-439)."""
    z_h = tuple(b.project(d + ui) for b, d, ui in zip(system.hard, dx_h, u_h))
    z_s = []
    for b, d, ui in zip(system.soft, dx_s, u_s):
        inp = d + ui
        p = b.project(inp)
        w2 = (b.w ** 2).reshape(b.w.shape + (1,) * (inp.ndim - 1))
        a = system.rho / (w2 + system.rho)
        z_s.append(a * inp + (1.0 - a) * p)
    return z_h, tuple(z_s)


def _solve_x(system, z_h, z_s, u_h, u_s):
    rhs = system.rhs_fixed
    s = jnp.zeros_like(rhs)
    for b, zb, ub in zip(system.hard + system.soft, z_h + z_s, u_h + u_s):
        s = s + b.scatter(zb - ub, system.n_verts)
    return system.solver.solve(rhs + system.rho * s)


@jax.jit
def solve_plain(system: PlainGeometrySystem, init_x) -> PlainTrace:
    """GeometrySolver::solve_ADMM (GeometrySolver.h:158-258)."""
    x0 = init_x
    u_h0 = tuple(jnp.zeros(b.block_shape, x0.dtype) for b in system.hard)
    u_s0 = tuple(jnp.zeros(b.block_shape, x0.dtype) for b in system.soft)

    def flat_ux(u_h, u_s, x):
        return jnp.concatenate([_flatten(u_h + u_s), x.ravel()])

    usize = sum(int(np.prod(b.block_shape)) for b in system.hard) \
        + sum(int(np.prod(b.block_shape)) for b in system.soft)

    # ADMM_init_variables (GeometrySolver.h:404-430): one full sweep.
    dx_h, dx_s = _transform_all(system, x0)
    z_h, z_s = _z_update(system, dx_h, dx_s, u_h0, u_s0)
    dx1 = _solve_x(system, z_h, z_s, u_h0, u_s0)
    dh1, ds1 = _transform_all(system, dx1)
    u_h = tuple(u + d - z for u, d, z in zip(u_h0, dh1, z_h))
    u_s = tuple(u + d - z for u, d, z in zip(u_s0, ds1, z_s))
    cx, cu_h, cu_s = dx1, u_h, u_s
    dxh_cur, dxs_cur = dh1, ds1

    aa0 = anderson.init(max(system.anderson_m, 1),
                        flat_ux(cu_h, cu_s, cx), effective_dim=usize)
    accel = system.accel

    init = dict(x=cx, uh=cu_h, us=cu_s, dx=cx, duh=cu_h, dus=cu_s,
                txh=dxh_cur, txs=dxs_cur,
                prev=jnp.asarray(np.finfo(np.float64).max, x0.dtype),
                aa=aa0, resets=jnp.zeros((), jnp.int32))

    def body(st, _):
        z_h, z_s = _z_update(system, st["txh"], st["txs"], st["uh"], st["us"])
        res = jnp.sqrt(
            _sqnorm_all(tuple(d - z for d, z in zip(st["txh"] + st["txs"],
                                                    z_h + z_s))))

        def do_reset(args):
            z_h, z_s, res, st2 = args
            # swap current <-> default; replace AA iterate; recompute
            cx2, cuh2, cus2 = st2["dx"], st2["duh"], st2["dus"]
            aa2 = anderson.replace(st2["aa"], flat_ux(cuh2, cus2, cx2))
            th, ts = _transform_all(system, cx2)
            zh2, zs2 = _z_update(system, th, ts, cuh2, cus2)
            res2 = jnp.sqrt(_sqnorm_all(tuple(
                d - z for d, z in zip(th + ts, zh2 + zs2))))
            new = dict(st2, x=cx2, uh=cuh2, us=cus2,
                       dx=st2["x"], duh=st2["uh"], dus=st2["us"],
                       txh=th, txs=ts, aa=aa2,
                       resets=st2["resets"] + 1)
            return zh2, zs2, res2, new

        need_reset = accel & (res > st["prev"])
        z_h, z_s, res, st = jax.lax.cond(
            need_reset, do_reset, lambda a: a, (z_h, z_s, res, st))

        prev = res
        dx_new = _solve_x(system, z_h, z_s, st["uh"], st["us"])
        th, ts = _transform_all(system, dx_new)
        duh = tuple(u + d - z for u, d, z in zip(st["uh"], th, z_h))
        dus = tuple(u + d - z for u, d, z in zip(st["us"], ts, z_s))
        if accel:
            aa, mixed = anderson.compute(st["aa"], flat_ux(duh, dus, dx_new))
            u_all = _unflatten(mixed[:usize], duh + dus)
            cuh = u_all[:len(duh)]
            cus = u_all[len(duh):]
            cx = mixed[usize:].reshape(dx_new.shape)
        else:
            aa, cuh, cus, cx = st["aa"], duh, dus, dx_new
        txh, txs = _transform_all(system, cx)
        new = dict(x=cx, uh=cuh, us=cus, dx=dx_new, duh=duh, dus=dus,
                   txh=txh, txs=txs, prev=prev, aa=aa, resets=st["resets"])
        return new, res

    st, residuals = jax.lax.scan(body, init, None, length=system.max_iter)
    return PlainTrace(x=st["x"], function_values=residuals,
                      resets=st["resets"])


class GeometrySolver:
    """Host API of the plain variant (GeometrySolver.h:52-460)."""

    def __init__(self, dense_threshold: int = 12000):
        self.hard: List = []
        self.soft: List = []
        self.reg_rows = []
        self.system = None
        self.dense_threshold = dense_threshold
        self._solution = None
        self.function_values: List[float] = []
        self.elapsed_time: List[float] = []
        self.dtype = np.float64

    add_hard_constraint = lambda self, b: self.hard.append(b)  # noqa: E731
    add_soft_constraint = lambda self, b: self.soft.append(b)  # noqa: E731

    def setup_ADMM(self, n_points: int, penalty_param: float) -> bool:
        rhs_fixed = np.zeros((n_points, 3))
        reg = None
        if self.reg_rows:
            raise NotImplementedError(
                "regularization rows: use the ALM solver for regularized runs")
        # Unified unweighted D over hard + soft, scaled by rho.
        A = assemble_geometry_node_matrix(
            n_points, list(self.hard) + list(self.soft), [],  # all "hard"
            penalty_param, reg_rows=reg)
        solver = DenseInverseSolver(Ainv=dense_inverse(A, dtype=self.dtype))
        self.system = PlainGeometrySystem(
            hard=tuple(self.hard), soft=tuple(self.soft),
            solver=solver,
            rhs_fixed=jnp.asarray(rhs_fixed.astype(self.dtype)),
            n_verts=n_points, rho=float(penalty_param))
        return True

    def solve_ADMM(self, init_x, rel_residual_eps, max_iter, anderson_m):
        from ..core.timers import MicroTimer
        self.system = dataclasses.replace(
            self.system, max_iter=int(max_iter), anderson_m=int(anderson_m),
            accel=anderson_m > 0)
        t = MicroTimer()
        trace = solve_plain(self.system, jnp.asarray(
            np.asarray(init_x, self.dtype)))
        trace.x.block_until_ready()
        total = t.elapsed_s()
        self._solution = np.asarray(trace.x)
        fv = np.asarray(trace.function_values)
        self.function_values = [float(v) for v in fv]
        n = len(fv)
        self.elapsed_time = [total * (i + 1) / max(n, 1) for i in range(n)]
        return trace

    def get_solution(self):
        return self._solution
