"""Wiremesh global-step experiments (VERDICT r3 #1): candidate fixes for the
~0.7s/iter ALM iteration, measured on the real TPU.

A) cp-cache fast path with resident candidate coordinates (new) — time it.
B) BSR matvec block-shape sweep: (block, deg_cap) in {(16,12), (8,10), (8,8)}.
C) bf16 coarse-inverse preconditioner apply.
D) CG iteration budgets (dynamic, no recompile): residual trajectory + time
   for cg_max_iters in {400, 30, 15} over 3 chunks of 4 iterations.

Usage: python tools/experiment_wiremesh.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

REF = "/root/reference/Geometry/Geometry_model"


def tsync(tree):
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
    return (time.perf_counter() - t0) / n, out


def main():
    dtype = np.dtype(os.environ.get("AAADMM_DTYPE", "float32"))
    print(f"backend: {jax.default_backend()}", flush=True)

    from aa_admm_tpu.core.meshio import load_obj, load_obj_poly
    from aa_admm_tpu.core.polymesh import PolyMesh, subdivide_and_smooth
    from aa_admm_tpu.apps.wire_mesh_opt import optimize_mesh
    from aa_admm_tpu.solver.geometry import (BsrMatrix, _alm_init_state,
                                             solve_alm_chunk)

    verts, faces = load_obj_poly(f"{REF}/WireMeshData/MaleTorso.obj")
    mesh = PolyMesh(verts=verts, faces=faces)
    ref = load_obj(f"{REF}/WireMeshData/MaleTorso_target.obj")
    edge_length = mesh.average_edge_length() * 0.5
    sub = subdivide_and_smooth(mesh)

    t0 = time.time()
    solver = optimize_mesh(sub, ref.verts, ref.faces, max_iter=4,
                           anderson_m=5, edge_length=edge_length,
                           dtype=dtype, chunk_iters=4)
    print(f"setup+4 iters: {time.time()-t0:.1f}s", flush=True)
    system = solver.system
    report = {}

    # ---- A: cp fast path with resident candidates ----
    st = _alm_init_state(system, jnp.zeros((system.n_verts, 3), dtype))
    st["limit"] = jnp.asarray(4, jnp.int32)
    st = solve_alm_chunk(system, st)
    tsync(st["x"])
    b = system.soft[0]
    dxs = jax.jit(lambda d: system.dx_soft(d))(st["x"])
    fast = jax.jit(lambda p, c: b.project_cached(p, c))
    dt, _ = timeit(fast, dxs[0], st["cp"][0])
    report["cp_fast_ms"] = dt * 1e3
    print(f"A: cp_fast {dt*1e3:.1f} ms", flush=True)

    # ---- B: BSR block shapes ----
    A_csr = solver._A_host
    x0_np = np.asarray(sub.verts, np.float64)
    for blk, cap in [(16, 12), (8, 10), (8, 8), (32, 8)]:
        t0 = time.time()
        bsr = BsrMatrix.from_csr(A_csr, dtype, x0_np, block=blk, deg_cap=cap)
        build_s = time.time() - t0
        spill = int(np.sum(np.asarray(bsr.sblk_a) != 0))
        vb = bsr.to_blocked(jnp.asarray(x0_np.astype(dtype)))
        mv = jax.jit(bsr.apply_blocked)
        dt, _ = timeit(mv, vb, n=20)
        mb = bsr.a_loc.size * bsr.a_loc.dtype.itemsize / 1e6
        report[f"bsr_{blk}x{cap}_ms"] = dt * 1e3
        print(f"B: bsr block={blk} cap={cap}: {dt*1e3:.2f} ms "
              f"(a_loc {mb:.0f} MB, spill {spill}, build {build_s:.1f}s)",
              flush=True)

    # ---- C: bf16 coarse inverse ----
    mgb = system.mg_b
    if mgb is not None:
        vb = system.bsr.to_blocked(st["x"])
        dt, _ = timeit(jax.jit(mgb.apply), vb, n=20)
        report["precond_f32_ms"] = dt * 1e3
        mgb16 = dataclasses.replace(mgb,
                                    Ac_inv=mgb.Ac_inv.astype(jnp.bfloat16))

        def apply16(r):
            rc = jax.ops.segment_sum(r, mgb16.agg,
                                     num_segments=mgb16.Ac_inv.shape[0])
            yc = (mgb16.Ac_inv @ rc.astype(jnp.bfloat16)).astype(r.dtype)
            return mgb16.inv_diag[:, None] * r + yc[mgb16.agg]

        dt, _ = timeit(jax.jit(apply16), vb, n=20)
        report["precond_bf16_ms"] = dt * 1e3
        print(f"C: precond f32 {report['precond_f32_ms']:.2f} ms, "
              f"bf16 {report['precond_bf16_ms']:.2f} ms", flush=True)

    # ---- D: CG budgets ----
    for budget in [400, 30, 15]:
        sysb = dataclasses.replace(system, cg_max_iters=budget)
        stb = _alm_init_state(sysb, jnp.zeros((system.n_verts, 3), dtype))
        fvs, cg_tot = [], 0
        t0 = time.perf_counter()
        for chunk in range(3):
            stb["limit"] = jnp.asarray(4, jnp.int32)
            stb["it"] = jnp.zeros((), jnp.int32)
            stb["cgit"] = jnp.zeros((), jnp.int32)
            stb["fv"] = jnp.full((4,), jnp.nan, dtype)
            stb = solve_alm_chunk(sysb, stb)
            h_fv, h_cg = jax.device_get((stb["fv"], stb["cgit"]))
            fvs.extend([float(v) for v in h_fv if v == v])
            cg_tot += int(h_cg)
        el = time.perf_counter() - t0
        report[f"budget{budget}_s"] = el
        report[f"budget{budget}_cg"] = cg_tot
        report[f"budget{budget}_fv"] = fvs
        print(f"D: cg_max_iters={budget}: 12 iters in {el:.2f}s "
              f"({cg_tot} cg iters), fv[0]={fvs[0]:.4g} "
              f"fv[-1]={fvs[-1]:.4g}", flush=True)

    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith("_fv")}), flush=True)


if __name__ == "__main__":
    main()
