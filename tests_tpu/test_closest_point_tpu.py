"""Closest-point accuracy on the REAL accelerator (AAADMM_TPU_TESTS=1).

The CPU lowering of ``approx_min_k`` is an exact sort, so only a run on
the chip can catch TPU recall misses in the 2-stage prefilter; the group
cache's block gathers and top-k selection likewise only exercise their
TPU lowerings here. Queries and bounds at f32 on the real MaleTorso
target mesh (40,756 triangles — the wiremesh soft-constraint surface)."""

import os

import numpy as np
import pytest

GEO = "/root/reference/Geometry/Geometry_model"

needs_geo = pytest.mark.skipif(not os.path.exists(GEO),
                               reason="reference data not mounted")


@needs_geo
def test_2stage_and_group_cache_match_bruteforce_tpu():
    import jax.numpy as jnp
    from aa_admm_tpu.core.meshio import load_obj
    from aa_admm_tpu.ops.closest_point import (build_tri_groups,
                                               closest_point_cached_group,
                                               closest_point_on_mesh,
                                               closest_point_on_mesh_2stage,
                                               cp_cache_group_init)

    ref = load_obj(GEO + "/WireMeshData/MaleTorso_target.obj")
    tv = ref.verts[ref.faces].astype(np.float32)
    rng = np.random.default_rng(11)
    lo, hi = ref.verts.min(0), ref.verts.max(0)
    q = jnp.asarray((lo + (hi - lo) * rng.random((2000, 3)))
                    .astype(np.float32))
    tri = jnp.asarray(tv)

    d_brute = np.linalg.norm(np.asarray(q) - np.asarray(
        closest_point_on_mesh(q, tri)), axis=1)

    # MXU coarse-to-fine (approx_min_k prefilter)
    d_2s = np.linalg.norm(np.asarray(q) - np.asarray(
        closest_point_on_mesh_2stage(q, tri, k=48)), axis=1)
    np.testing.assert_allclose(d_2s, d_brute, rtol=2e-5, atol=1e-4)

    # group cache: refresh then fast path after a small motion
    S = 64
    tp, cent, rad, gc, gr = build_tri_groups(tv, group_size=S)
    G = len(gc)
    args = (jnp.asarray(tp.reshape(G, S, 3, 3), jnp.float32),
            jnp.asarray(cent.reshape(G, S, 3), jnp.float32),
            jnp.asarray(rad.reshape(G, S), jnp.float32),
            jnp.asarray(gc, jnp.float32), jnp.asarray(gr, jnp.float32))
    cache = cp_cache_group_init(2000, 6, np.float32)
    out, cache = closest_point_cached_group(q, *args, cache)
    d_g = np.linalg.norm(np.asarray(q) - np.asarray(out), axis=1)
    np.testing.assert_allclose(d_g, d_brute, rtol=2e-5, atol=1e-4)

    # fast path on a small motion stays exact
    sl = np.asarray(cache.slack)
    step = 0.1 * max(float(np.median(sl)), 1e-3)
    q2 = q + jnp.asarray([step, 0.0, 0.0], jnp.float32)
    out2, _ = closest_point_cached_group(q2, *args, cache)
    d2_brute = np.linalg.norm(np.asarray(q2) - np.asarray(
        closest_point_on_mesh(q2, tri)), axis=1)
    d2 = np.linalg.norm(np.asarray(q2) - np.asarray(out2), axis=1)
    np.testing.assert_allclose(d2, d2_brute, rtol=2e-5, atol=1e-4)
