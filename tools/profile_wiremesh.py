"""Per-component TPU timing of the wiremesh ALM iteration (VERDICT r3 #1/#2).

Attributes the ~0.7 s/iteration of the MaleTorso solve across
{BSR matvec x CG iters, two-level precond, cp-cache fast path/refresh,
hard projections, AA} with value-fetch syncing (block_until_ready does not
sync on the axon backend — CLAUDE.md).

Usage:  python tools/profile_wiremesh.py [n_warm_iters]
Env:    AAADMM_DTYPE (default float32), AAADMM_PLATFORM=cpu to force CPU.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REF = "/root/reference/Geometry/Geometry_model"


def tsync(tree):
    """Force execution: fetch one scalar from each leaf (axon round trip)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jax.device_get(jnp.ravel(leaves[0])[0])


def timeit(fn, *args, n=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    tsync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    tsync(out)
    dt = (time.perf_counter() - t0) / n
    return dt, out


def main():
    n_warm = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = np.dtype(os.environ.get("AAADMM_DTYPE", "float32"))
    if os.environ.get("AAADMM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["AAADMM_PLATFORM"])
    print(f"backend: {jax.default_backend()}, dtype {dtype}", flush=True)

    from aa_admm_tpu.core.meshio import load_obj, load_obj_poly
    from aa_admm_tpu.core.polymesh import PolyMesh, subdivide_and_smooth
    from aa_admm_tpu.ops.constraints import (AngleBatch, EdgeLengthBatch,
                                             RefSurfaceBatch)
    from aa_admm_tpu.solver import anderson
    from aa_admm_tpu.solver.geometry import (ALMGeometrySolver,
                                             _alm_init_state, _flatten,
                                             _solve_x, solve_alm_chunk)
    from aa_admm_tpu.solver.linear import pcg

    t0 = time.time()
    verts, faces = load_obj_poly(f"{REF}/WireMeshData/MaleTorso.obj")
    mesh = PolyMesh(verts=verts, faces=faces)
    ref = load_obj(f"{REF}/WireMeshData/MaleTorso_target.obj")
    edge_length = mesh.average_edge_length()
    sub = subdivide_and_smooth(mesh)
    edge_length *= 0.5
    print(f"subdivide: {time.time()-t0:.1f}s  n={sub.n_verts()}", flush=True)

    from aa_admm_tpu.apps.wire_mesh_opt import optimize_mesh
    t0 = time.time()
    solver = optimize_mesh(sub, ref.verts, ref.faces, max_iter=n_warm,
                           anderson_m=5, edge_length=edge_length,
                           dtype=dtype, chunk_iters=4)
    # optimize_mesh applied the f32 CG budget (AAADMM_GEO_CG_ITERS); the
    # system below carries it.
    print(f"setup+warm solve ({n_warm} iters): {time.time()-t0:.1f}s",
          flush=True)

    system = solver.system
    # Rebuild a representative mid-solve state: run n_warm iterations from
    # scratch through the already-compiled chunk program, keep the state.
    x0 = jnp.asarray(np.zeros((system.n_verts, 3), dtype))
    st = _alm_init_state(system, x0)
    st["limit"] = jnp.asarray(4, jnp.int32)
    report = {}

    t0 = time.perf_counter()
    st = solve_alm_chunk(system, st)
    tsync(st["x"])
    report["chunk4_first_s"] = time.perf_counter() - t0
    cg_first = int(jax.device_get(st["cgit"]))
    st["it"] = jnp.zeros((), jnp.int32)
    st["cgit"] = jnp.zeros((), jnp.int32)
    t0 = time.perf_counter()
    st = solve_alm_chunk(system, st)
    tsync(st["x"])
    report["chunk4_second_s"] = time.perf_counter() - t0
    report["cg_iters_chunk1"] = cg_first
    report["cg_iters_chunk2"] = int(jax.device_get(st["cgit"]))
    print(f"chunk4: first {report['chunk4_first_s']:.2f}s "
          f"(cg {cg_first}), second {report['chunk4_second_s']:.2f}s "
          f"(cg {report['cg_iters_chunk2']})", flush=True)

    cx, cu, cps = st["x"], st["u"], st["cp"]

    # --- component timings ---
    dx_hard = jax.jit(lambda d: system.dx_hard(d))
    dt, dxh = timeit(dx_hard, cx)
    report["dx_hard_ms"] = dt * 1e3

    dx_soft = jax.jit(lambda d: system.dx_soft(d))
    dt, dxs = timeit(dx_soft, cx)
    report["dx_soft_ms"] = dt * 1e3

    for name, b, d in [("angle", system.hard[0], dxh[0]),
                       ("edge", system.hard[1], dxh[1])]:
        proj = jax.jit(b.project)
        dt, _ = timeit(proj, d)
        report[f"proj_{name}_ms"] = dt * 1e3

    # soft closest-point: fast path (valid cache) and forced refresh
    b = system.soft[0]
    cache = cps[0]
    fast = jax.jit(lambda p, c: b.project_cached(p, c))
    dt, _ = timeit(fast, dxs[0], cache)
    report["cp_fast_ms"] = dt * 1e3
    bad = cache._replace(slack=jnp.full_like(cache.slack, -jnp.inf))
    dt, _ = timeit(fast, dxs[0], bad, n=3)
    report["cp_refresh_ms"] = dt * 1e3

    # global step
    z_h = tuple(bb.project(d + ui)
                for bb, d, ui in zip(system.hard, dxh, cu))
    z_s = tuple(bb.project_cached(d, c)[0]
                for bb, d, c in zip(system.soft, dxs, cps))
    solvex = jax.jit(lambda zh, u, zs, xw: _solve_x(system, zh, u, zs,
                                                    x_warm=xw,
                                                    with_iters=True))
    dt, (xs, ncg) = timeit(solvex, z_h, cu, z_s, cx, n=5)
    report["solve_x_ms"] = dt * 1e3
    report["solve_x_cg_iters"] = int(jax.device_get(ncg))

    if system.bsr is not None:
        vb = system.bsr.to_blocked(cx)
        mv = jax.jit(system.bsr.apply_blocked)
        dt, _ = timeit(mv, vb, n=20)
        report["bsr_matvec_ms"] = dt * 1e3
        if system.mg_b is not None:
            pa = jax.jit(system.mg_b.apply)
            dt, _ = timeit(pa, vb, n=20)
            report["precond_ms"] = dt * 1e3

    # AA compute on the (u, x) vector
    aa = st["aa"]
    flat = jnp.concatenate([_flatten(cu), cx.ravel()])
    report["aa_dim"] = int(flat.shape[0])
    aac = jax.jit(anderson.compute)
    dt, _ = timeit(aac, aa, flat)
    report["aa_compute_ms"] = dt * 1e3

    # residual norms
    def resid(dxh2, zh):
        return (sum(jnp.sum((d - z) ** 2) for d, z in zip(dxh2, zh))
                + sum(jnp.sum((d - p) ** 2) for d, p in zip(dxh2, dxh)))
    rs = jax.jit(resid)
    dt, _ = timeit(rs, dxh, z_h)
    report["residual_ms"] = dt * 1e3

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in report.items()}, indent=1), flush=True)


if __name__ == "__main__":
    main()
