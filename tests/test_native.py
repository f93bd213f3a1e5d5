"""Native host library (BVH closest point, fast mesh IO) vs NumPy/JAX."""

import os

import numpy as np
import pytest

from aa_admm_tpu import native


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_bvh_matches_bruteforce():
    rng = np.random.default_rng(0)
    ref_v = rng.normal(size=(60, 3))
    ref_f = rng.integers(0, 60, size=(100, 3)).astype(np.int32)
    q = rng.normal(size=(40, 3)) * 2.0

    tree = native.AabbTree(ref_v, ref_f)
    pts, sqd = tree.closest_points(q)

    import jax.numpy as jnp
    from aa_admm_tpu.ops.closest_point import closest_point_on_mesh
    ref = np.asarray(closest_point_on_mesh(jnp.asarray(q),
                                           jnp.asarray(ref_v[ref_f])))
    d_ref = np.sum((q - ref) ** 2, axis=1)
    # Distances must agree (points may differ when equidistant).
    assert np.allclose(sqd, d_ref, rtol=1e-10, atol=1e-12)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_obj_parse(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                 "f 1/1/1 2/2/2 3/3/3 4/4/4\n")
    out = native.load_obj_native(str(p))
    assert out is not None
    verts, tris = out
    assert verts.shape == (4, 3)
    assert tris.shape == (2, 3)  # quad fan-split
    from aa_admm_tpu.core.meshio import load_obj
    py = load_obj(str(p))
    assert np.allclose(verts, py.verts)
    assert np.array_equal(tris, py.faces)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_elenode_parse(tmp_path):
    from aa_admm_tpu.core.factory import make_tet_blocks
    from aa_admm_tpu.core.meshio import save_elenode, load_elenode
    mesh = make_tet_blocks(2, 1, 1)
    base = str(tmp_path / "m")
    save_elenode(base, mesh)
    out = native.load_elenode_native(base)
    assert out is not None
    verts, tets = out
    py = load_elenode(base)
    assert np.allclose(verts, py.verts)
    assert np.array_equal(tets, py.tets)


DATA = "/root/reference/Geometry/Geometry_model"


@pytest.mark.skipif(not native.available() or not os.path.exists(DATA),
                    reason="native lib or data unavailable")
def test_native_parses_real_mesh():
    out = native.load_obj_native(
        os.path.join(DATA, "PQMeshData/trimesh/costa2k_tri.obj"))
    assert out is not None
    verts, tris = out
    assert len(verts) > 1000
    assert tris.min() >= 0 and tris.max() < len(verts)
