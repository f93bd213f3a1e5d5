"""Closest-point accuracy on the REAL accelerator (AAADMM_TPU_TESTS=1).

The CPU lowering of ``approx_min_k`` is an exact sort, so only a run on
the chip can catch TPU recall misses in the 2-stage prefilter; the group
cache's block gathers and top-k selection likewise only exercise their
TPU lowerings here. Queries at f32 against the real MaleTorso target
mesh (40,756 triangles — the wiremesh soft-constraint surface).

Two regimes, asserted separately:
* NEAR-surface queries (surface points + noise of ~2 edge lengths) —
  the solver regime (ADMM vertices converging onto the reference): must
  match brute force to f32 roundoff. This is the correctness contract
  the in-loop projections rely on.
* FAR-field queries (random box points, tens of edge lengths away,
  where many clamped-zero lower bounds tie): approx_min_k recall misses
  make ~1% of queries land on a slightly-farther triangle. Measured
  r4: 17/2000 affected, worst 3.2% relative. Asserted as a
  characterization bound (<=2% affected, <=6% relative) so a recall
  regression is caught without overclaiming exactness."""

import os

import numpy as np
import pytest

GEO = "/root/reference/Geometry/Geometry_model"

needs_geo = pytest.mark.skipif(not os.path.exists(GEO),
                               reason="reference data not mounted")


def _load():
    import jax.numpy as jnp
    from aa_admm_tpu.core.meshio import load_obj
    ref = load_obj(GEO + "/WireMeshData/MaleTorso_target.obj")
    tv = ref.verts[ref.faces].astype(np.float32)
    return ref, tv, jnp.asarray(tv)


def _dist(q, pts):
    return np.linalg.norm(np.asarray(q) - np.asarray(pts), axis=1)


@needs_geo
def test_near_surface_exact_vs_bruteforce_tpu():
    import jax.numpy as jnp
    from aa_admm_tpu.ops.closest_point import (build_tri_groups,
                                               closest_point_cached_group,
                                               closest_point_on_mesh,
                                               closest_point_on_mesh_2stage,
                                               cp_cache_group_init)

    ref, tv, tri = _load()
    rng = np.random.default_rng(11)
    edge = float(np.linalg.norm(tv[:, 0] - tv[:, 1], axis=1).mean())
    base = tv[rng.integers(0, len(tv), 2000)].mean(axis=1)
    q = jnp.asarray((base + 2.0 * edge * rng.standard_normal((2000, 3)))
                    .astype(np.float32))

    d_brute = _dist(q, closest_point_on_mesh(q, tri))
    d_2s = _dist(q, closest_point_on_mesh_2stage(q, tri, k=48))
    np.testing.assert_allclose(d_2s, d_brute, rtol=2e-5, atol=1e-4)

    # group cache: refresh, then the fast path after a small motion
    S = 64
    tp, cent, rad, gc, gr = build_tri_groups(tv, group_size=S)
    G = len(gc)
    args = (jnp.asarray(tp.reshape(G, S, 3, 3), jnp.float32),
            jnp.asarray(cent.reshape(G, S, 3), jnp.float32),
            jnp.asarray(rad.reshape(G, S), jnp.float32),
            jnp.asarray(gc, jnp.float32), jnp.asarray(gr, jnp.float32))
    cache = cp_cache_group_init(2000, 6, np.float32)
    out, cache = closest_point_cached_group(q, *args, cache)
    np.testing.assert_allclose(_dist(q, out), d_brute, rtol=2e-5, atol=1e-4)

    sl = np.asarray(cache.slack)
    assert np.median(sl) > 0
    step = min(0.1 * float(np.median(sl)), 0.2 * edge)
    q2 = q + jnp.asarray([step, 0.0, 0.0], jnp.float32)
    out2, _ = closest_point_cached_group(q2, *args, cache)
    d2_brute = _dist(q2, closest_point_on_mesh(q2, tri))
    np.testing.assert_allclose(_dist(q2, out2), d2_brute,
                               rtol=2e-5, atol=1e-4)


@needs_geo
def test_far_field_recall_characterization_tpu():
    import jax.numpy as jnp
    from aa_admm_tpu.ops.closest_point import (closest_point_on_mesh,
                                               closest_point_on_mesh_2stage)

    ref, tv, tri = _load()
    rng = np.random.default_rng(11)
    lo, hi = ref.verts.min(0), ref.verts.max(0)
    q = jnp.asarray((lo + (hi - lo) * rng.random((2000, 3)))
                    .astype(np.float32))
    d_brute = _dist(q, closest_point_on_mesh(q, tri))
    d_2s = _dist(q, closest_point_on_mesh_2stage(q, tri, k=48))
    rel = np.abs(d_2s - d_brute) / np.maximum(d_brute, 1e-6)
    frac_off = float((rel > 1e-4).mean())
    assert frac_off <= 0.02, f"recall regression: {frac_off:.3%} off"
    assert float(rel.max()) <= 0.06, f"worst far-field error {rel.max():.3%}"
