"""Capture a jax.profiler trace of wiremesh ALM chunks (PERF.md kernel
tables). Writes the xplane to /tmp/xprof_wire; parse with
tools/parse_xplane.py."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REF = "/root/reference/Geometry/Geometry_model"


def tsync(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jax.device_get(jnp.ravel(leaves[0])[0])


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_wire"
    dtype = np.dtype(os.environ.get("AAADMM_DTYPE", "float32"))
    from aa_admm_tpu.core.meshio import load_obj, load_obj_poly
    from aa_admm_tpu.core.polymesh import PolyMesh, subdivide_and_smooth
    from aa_admm_tpu.apps.wire_mesh_opt import optimize_mesh
    from aa_admm_tpu.solver.geometry import _alm_init_state, solve_alm_chunk

    verts, faces = load_obj_poly(f"{REF}/WireMeshData/MaleTorso.obj")
    mesh = PolyMesh(verts=verts, faces=faces)
    ref = load_obj(f"{REF}/WireMeshData/MaleTorso_target.obj")
    edge_length = mesh.average_edge_length() * 0.5
    sub = subdivide_and_smooth(mesh)

    t0 = time.time()
    solver = optimize_mesh(sub, ref.verts, ref.faces, max_iter=8,
                           anderson_m=5, edge_length=edge_length,
                           dtype=dtype, chunk_iters=4)
    print(f"setup+8 iters: {time.time()-t0:.1f}s", flush=True)
    system = solver.system

    st = _alm_init_state(system, jnp.zeros((system.n_verts, 3), dtype))
    st["limit"] = jnp.asarray(4, jnp.int32)
    st = solve_alm_chunk(system, st)
    tsync(st["x"])
    st["it"] = jnp.zeros((), jnp.int32)

    with jax.profiler.trace(out_dir):
        st = solve_alm_chunk(system, st)
        tsync(st["x"])
    print("trace written to", out_dir, flush=True)


if __name__ == "__main__":
    main()
