"""ALM geometry solver tests: planarity optimization on a noisy quad grid,
edge-length/angle constraints, regularization, and AA accept/reject."""

import numpy as np
import pytest

from aa_admm_tpu.ops.constraints import (AngleBatch, ClosenessBatch,
                                         EdgeLengthBatch, PlaneBatch,
                                         RefSurfaceBatch)
from aa_admm_tpu.solver.geometry import ALMGeometrySolver


def _noisy_quad_grid(nx=4, ny=4, noise=0.2, seed=0):
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.arange(nx + 1, dtype=float),
                         np.arange(ny + 1, dtype=float), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(),
                      noise * rng.normal(size=xs.size)], axis=1)
    faces = []
    def vid(i, j):
        return i * (ny + 1) + j
    for i in range(nx):
        for j in range(ny):
            faces.append([vid(i, j), vid(i + 1, j), vid(i + 1, j + 1),
                          vid(i, j + 1)])
    return verts, faces


def _planarity_err(verts, faces):
    errs = []
    for f in faces:
        p = verts[f]
        c = p - p.mean(0)
        _, s, _ = np.linalg.svd(c, full_matrices=False)
        errs.append(s[-1])
    return np.max(errs)


def test_planarity_optimization():
    verts, faces = _noisy_quad_grid()
    solver = ALMGeometrySolver()
    solver.add_hard_constraint(PlaneBatch.create(faces, weight=1.0))
    # Soft closeness to the noisy input keeps the mesh from collapsing.
    solver.add_soft_constraint(ClosenessBatch.create(
        list(range(len(verts))), weight=1.0, targets=verts))
    solver.setup_ADMM(len(verts), penalty_param=1e3)
    solver.solve_ADMM(verts, rel_residual_eps=1e-10, max_iter=100,
                      anderson_m=5)
    out = solver.get_solution()
    e0 = _planarity_err(verts, faces)
    e1 = _planarity_err(out, faces)
    assert e1 < e0 * 1e-2
    # the solution stays near the input (soft term)
    assert np.abs(out - verts).max() < 1.0
    # residual history recorded and decreasing overall
    fv = solver.function_values
    assert len(fv) == 100
    assert fv[-1] < fv[0]


def test_planarity_aa_beats_plain():
    verts, faces = _noisy_quad_grid(5, 5, 0.3, seed=1)

    def run(m):
        s = ALMGeometrySolver()
        s.add_hard_constraint(PlaneBatch.create(faces, weight=1.0))
        s.add_soft_constraint(ClosenessBatch.create(
            list(range(len(verts))), weight=1.0, targets=verts))
        s.setup_ADMM(len(verts), penalty_param=1e3)
        s.solve_ADMM(verts, 1e-10, 60, m)
        return s.function_values

    fv_plain = run(0)
    fv_aa = run(5)
    assert fv_aa[-1] < fv_plain[-1]


def test_edge_length_constraint():
    # Two points pulled to unit distance by a hard edge constraint + soft
    # closeness anchors.
    verts = np.array([[0.0, 0, 0], [3.0, 0, 0]])
    solver = ALMGeometrySolver()
    solver.add_hard_constraint(EdgeLengthBatch.create(
        [[0, 1]], weight=1.0, target_length=1.0))
    solver.add_soft_constraint(ClosenessBatch.create([0, 1], 1.0, verts))
    solver.setup_ADMM(2, penalty_param=1e4)
    solver.solve_ADMM(verts, 1e-12, 200, 0)
    out = solver.get_solution()
    assert abs(np.linalg.norm(out[1] - out[0]) - 1.0) < 1e-3


def test_angle_constraint_opens_angle():
    # Narrow V: tip at origin, sides at ~10 degrees; clamp to [45, 135] deg.
    verts = np.array([[0.0, 0, 0], [1.0, 0, 0],
                      [np.cos(np.deg2rad(10)), np.sin(np.deg2rad(10)), 0]])
    solver = ALMGeometrySolver()
    solver.add_hard_constraint(AngleBatch.create(
        [[0, 1, 2]], weight=1.0, min_radian=np.pi / 4,
        max_radian=3 * np.pi / 4))
    solver.add_soft_constraint(ClosenessBatch.create([0, 1, 2], 1.0, verts))
    solver.setup_ADMM(3, penalty_param=1e4)
    solver.solve_ADMM(verts, 1e-12, 300, 0)
    out = solver.get_solution()
    v1, v2 = out[1] - out[0], out[2] - out[0]
    ang = np.arccos(np.dot(v1, v2) / np.linalg.norm(v1) / np.linalg.norm(v2))
    assert ang > np.pi / 4 - 1e-2


def test_ref_surface_constraint():
    # Project points onto the z=0 unit square surface (two triangles).
    ref_v = np.array([[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]])
    ref_f = np.array([[0, 1, 2], [0, 2, 3]])
    verts = np.array([[0.3, 0.4, 0.5], [0.8, 0.2, -0.7]])
    solver = ALMGeometrySolver()
    # hard: keep edge length; soft: stick to surface
    solver.add_soft_constraint(RefSurfaceBatch.create(
        [0, 1], weight=10.0, ref_verts=ref_v, ref_faces=ref_f))
    solver.add_hard_constraint(EdgeLengthBatch.create(
        [[0, 1]], weight=1.0,
        target_length=np.linalg.norm(verts[1] - verts[0])))
    solver.setup_ADMM(2, penalty_param=100.0)
    solver.solve_ADMM(verts, 1e-12, 150, 3)
    out = solver.get_solution()
    assert np.abs(out[:, 2]).max() < 5e-2  # near the z=0 surface


def test_laplacian_regularization_smooths():
    rng = np.random.default_rng(3)
    n = 20
    line = np.stack([np.arange(n, dtype=float),
                     rng.normal(size=n) * 0.5, np.zeros(n)], axis=1)
    solver = ALMGeometrySolver()
    # Hard constraints required by the formulation: pin ends via closeness.
    solver.add_hard_constraint(ClosenessBatch.create(
        [0, n - 1], 1.0, line[[0, n - 1]]))
    for i in range(1, n - 1):
        solver.add_uniform_laplacian([i, i - 1, i + 1], weight=10.0)
    solver.add_soft_constraint(ClosenessBatch.create(
        list(range(n)), weight=0.01, targets=line))
    solver.setup_ADMM(n, penalty_param=1e3)
    solver.solve_ADMM(line, 1e-12, 100, 0)
    out = solver.get_solution()
    rough = np.abs(np.diff(out[:, 1], 2)).max()
    rough0 = np.abs(np.diff(line[:, 1], 2)).max()
    assert rough < rough0 * 0.1


def test_closest_point_2stage_matches_bruteforce():
    """The MXU coarse-to-fine path must be exact on *uniform* surface meshes
    (the candidate bound assumes bounded triangle size, which real reference
    surfaces satisfy; a random triangle soup with giant slivers does not)."""
    import jax.numpy as jnp
    from aa_admm_tpu.ops.closest_point import (closest_point_on_mesh,
                                               closest_point_on_mesh_2stage)
    rng = np.random.default_rng(7)
    # Structured bumpy sphere triangulation (uniform triangle sizes).
    n_u, n_v = 60, 30
    us = np.linspace(0, 2 * np.pi, n_u, endpoint=False)
    vs = np.linspace(0.05, np.pi - 0.05, n_v)
    U, V = np.meshgrid(us, vs, indexing="ij")
    r = 1.0 + 0.1 * np.sin(3 * U) * np.cos(2 * V)
    verts = np.stack([r * np.sin(V) * np.cos(U), r * np.sin(V) * np.sin(U),
                      r * np.cos(V)], axis=-1).reshape(-1, 3)
    faces = []
    for i in range(n_u):
        for j in range(n_v - 1):
            a = i * n_v + j
            b = ((i + 1) % n_u) * n_v + j
            faces.append([a, b, a + 1])
            faces.append([b, b + 1, a + 1])
    tri = jnp.asarray(verts[np.asarray(faces)])
    q = jnp.asarray(rng.normal(size=(400, 3)) * 1.3)
    exact = np.asarray(closest_point_on_mesh(q, tri))
    fast = np.asarray(closest_point_on_mesh_2stage(q, tri, k=48))
    d_e = np.linalg.norm(np.asarray(q) - exact, axis=1)
    d_f = np.linalg.norm(np.asarray(q) - fast, axis=1)
    assert np.allclose(d_f, d_e, rtol=1e-9, atol=1e-11)


DATA_GEO = "/root/reference/Geometry/Geometry_model"


@pytest.mark.skipif(not __import__("os").path.exists(DATA_GEO),
                    reason="reference data not mounted")
def test_closest_point_2stage_exact_on_real_mesh():
    import jax.numpy as jnp
    from aa_admm_tpu.core.meshio import load_obj
    from aa_admm_tpu.ops.closest_point import (closest_point_on_mesh,
                                               closest_point_on_mesh_2stage)
    ref = load_obj(DATA_GEO + "/PQMeshData/trimesh/costa2k_tri.obj")
    tri = jnp.asarray(ref.verts[ref.faces])
    rng = np.random.default_rng(1)
    lo, hi = ref.verts.min(0), ref.verts.max(0)
    q = jnp.asarray(lo + (hi - lo) * rng.random((300, 3)))
    d_e = np.linalg.norm(np.asarray(q) - np.asarray(
        closest_point_on_mesh(q, tri)), axis=1)
    d_f = np.linalg.norm(np.asarray(q) - np.asarray(
        closest_point_on_mesh_2stage(q, tri, k=48)), axis=1)
    assert np.allclose(d_f, d_e, rtol=1e-9, atol=1e-11)


def test_sparse_assembly_matches_dense():
    """ELL/CSR assembly (the large-mesh PCG matvec) must equal the dense
    global matrix over every constraint type + regularization rows."""
    import jax.numpy as jnp
    from aa_admm_tpu.ops.constraints import (
        AngleBatch, EdgeLengthBatch, PlaneBatch, ClosenessBatch,
        assemble_geometry_node_matrix, assemble_geometry_node_matrix_sparse)
    from aa_admm_tpu.solver.geometry import EllMatrix

    rng = np.random.default_rng(3)
    n = 24
    hard = [
        AngleBatch.create(
            rng.integers(0, n, size=(10, 3)), 1.0, np.pi / 4, 3 * np.pi / 4),
        EdgeLengthBatch.create(rng.integers(0, n, size=(12, 2)), 1.0, 1.0),
        PlaneBatch.create([list(rng.choice(n, size=4, replace=False))
                           for _ in range(6)], 1.0),
    ]
    soft = [ClosenessBatch.create([1, 5, 7], 2.5,
                                  rng.normal(size=(3, 3)))]
    R, K = 5, 3
    reg = (rng.integers(0, n, size=(R, K)),
           rng.normal(size=(R, K)),
           np.ones((R, K), bool))

    dense = assemble_geometry_node_matrix(n, hard, soft, 37.0, reg_rows=reg)
    csr = assemble_geometry_node_matrix_sparse(n, hard, soft, 37.0,
                                               reg_rows=reg)
    np.testing.assert_allclose(csr.toarray(), dense, rtol=0, atol=1e-12)

    ell = EllMatrix.from_csr(csr, np.float64)
    v = rng.normal(size=(n, 3))
    np.testing.assert_allclose(np.asarray(ell.apply(jnp.asarray(v))),
                               dense @ v, rtol=1e-12, atol=1e-12)


def test_sparse_assembly_empty():
    """No constraints at all: the sparse assembler must return an all-zero
    matrix like the dense one, not crash on empty concatenation."""
    from aa_admm_tpu.ops.constraints import (
        assemble_geometry_node_matrix_sparse)
    A = assemble_geometry_node_matrix_sparse(5, [], [], 1.0, reg_rows=None)
    assert A.shape == (5, 5)
    assert A.nnz == 0


def test_solve_admm_zero_iterations():
    """max_iter=0 returns the input unchanged (no IndexError on the empty
    chunk history)."""
    verts, faces = _noisy_quad_grid(3, 3, 0.1, seed=2)
    solver = ALMGeometrySolver()
    solver.add_hard_constraint(PlaneBatch.create(faces, weight=1.0))
    solver.add_soft_constraint(ClosenessBatch.create(
        list(range(len(verts))), weight=1.0, targets=verts))
    solver.setup_ADMM(len(verts), penalty_param=1e3)
    trace = solver.solve_ADMM(verts, 1e-10, 0, 5)
    np.testing.assert_allclose(solver.get_solution(), verts)
    assert trace.function_values.shape == (0,)
    assert solver.function_values == []


def test_chunked_matches_single_dispatch():
    """Chunked dispatch must reproduce the single-dispatch trajectory exactly,
    including the accept/reject sequence and the global runaway-trial budget
    (the trial counter is carried across chunks, not reset per chunk)."""
    verts, faces = _noisy_quad_grid(4, 4, 0.25, seed=5)

    def run(chunk):
        s = ALMGeometrySolver()
        s.add_hard_constraint(PlaneBatch.create(faces, weight=1.0))
        s.add_soft_constraint(ClosenessBatch.create(
            list(range(len(verts))), weight=1.0, targets=verts))
        s.setup_ADMM(len(verts), penalty_param=1e3)
        trace = s.solve_ADMM(verts, 1e-10, 40, 5, chunk_iters=chunk)
        return s, trace

    s1, t1 = run(None)          # single dispatch
    s2, t2 = run(7)             # 7-iteration chunks (uneven split of 40)
    assert s1.function_values == s2.function_values
    assert s1.anderson_reset == s2.anderson_reset
    assert int(t1.n_trials) == int(t2.n_trials)
    np.testing.assert_allclose(s2.get_solution(), s1.get_solution(),
                               rtol=0, atol=0)
    # Trace.x is the absolute solution, not the internal delta state.
    np.testing.assert_allclose(np.asarray(t2.x), s2.get_solution(),
                               rtol=0, atol=1e-12)


@pytest.mark.skipif(not __import__("os").path.exists(DATA_GEO),
                    reason="reference data not mounted")
def test_closest_point_cached_group_exact_and_refreshes():
    """The group-granular movement-bounded candidate cache must (a) equal
    brute force right after a refresh, (b) stay exact on the fast path for
    small motions, and (c) self-refresh (stay exact) after a large motion
    that invalidates every slack bound."""
    import jax.numpy as jnp
    from aa_admm_tpu.core.meshio import load_obj
    from aa_admm_tpu.ops.closest_point import (build_tri_groups,
                                               closest_point_cached_group,
                                               closest_point_on_mesh,
                                               cp_cache_group_init)
    ref = load_obj(DATA_GEO + "/PQMeshData/trimesh/costa2k_tri.obj")
    S = 64
    tp, cent, rad, gc, gr = build_tri_groups(ref.verts[ref.faces],
                                             group_size=S)
    tb = jnp.asarray(tp.reshape(-1, S, 3, 3))
    cb = jnp.asarray(cent.reshape(-1, S, 3))
    rb = jnp.asarray(rad.reshape(-1, S))
    gc, gr = jnp.asarray(gc), jnp.asarray(gr)
    rng = np.random.default_rng(5)
    lo, hi = ref.verts.min(0), ref.verts.max(0)
    q = jnp.asarray(lo + (hi - lo) * rng.random((300, 3)))
    tri = jnp.asarray(ref.verts[ref.faces])

    cache = cp_cache_group_init(300, 8, np.float64)
    out, cache = closest_point_cached_group(q, tb, cb, rb, gc, gr, cache)
    d_brute = np.linalg.norm(np.asarray(q) - np.asarray(
        closest_point_on_mesh(q, tri)), axis=1)
    d = np.linalg.norm(np.asarray(q) - np.asarray(out), axis=1)
    np.testing.assert_allclose(d, d_brute, rtol=1e-9, atol=1e-11)

    # (b) near-surface queries (the solver's steady state: vertices
    # converging onto the reference) must have positive slack, so a small
    # motion takes the fast path and stays exact.
    qn = jnp.asarray(np.asarray(out) + 0.02 * (np.asarray(q) -
                                               np.asarray(out)))
    cache_n = cp_cache_group_init(300, 8, np.float64)
    _, cache_n = closest_point_cached_group(qn, tb, cb, rb, gc, gr, cache_n)
    assert np.median(np.asarray(cache_n.slack)) > 0
    step = 0.2 * float(np.median(np.asarray(cache_n.slack)))
    q2 = qn + step * jnp.asarray([1.0, 0.0, 0.0])
    out2, cache2 = closest_point_cached_group(q2, tb, cb, rb, gc, gr, cache_n)
    d2b = np.linalg.norm(np.asarray(q2) - np.asarray(
        closest_point_on_mesh(q2, tri)), axis=1)
    d2 = np.linalg.norm(np.asarray(q2) - np.asarray(out2), axis=1)
    np.testing.assert_allclose(d2, d2b, rtol=1e-9, atol=1e-11)

    # (c) large motion -> refresh fires, still exact, cache re-anchored
    q3 = qn + 0.5 * (hi - lo)
    out3, cache3 = closest_point_cached_group(q3, tb, cb, rb, gc, gr, cache2)
    d3b = np.linalg.norm(np.asarray(q3) - np.asarray(
        closest_point_on_mesh(q3, tri)), axis=1)
    d3 = np.linalg.norm(np.asarray(q3) - np.asarray(out3), axis=1)
    np.testing.assert_allclose(d3, d3b, rtol=1e-9, atol=1e-11)
    assert np.array_equal(np.asarray(cache3.p0), np.asarray(q3))


def test_bsr_matvec_matches_dense():
    """Morton-blocked SpMV (BsrMatrix) must equal the dense matvec for
    mesh-like SPD matrices, across block padding (n % B != 0), deg_cap
    spills, and multiple rhs columns."""
    import scipy.sparse as sp
    import jax.numpy as jnp
    from aa_admm_tpu.solver.geometry import BsrMatrix

    rng = np.random.default_rng(11)
    n = 1003                      # not a multiple of the block size
    verts = rng.normal(size=(n, 3))
    # random symmetric sparse matrix with mesh-like locality + a few
    # long-range entries (these exercise the deg_cap spill path)
    from scipy.spatial import cKDTree
    tree = cKDTree(verts)
    pairs = tree.query_pairs(0.35, output_type="ndarray")
    far = rng.integers(0, n, (40, 2))
    pairs = np.concatenate([pairs, far], axis=0)
    vals = rng.normal(size=len(pairs))
    A = sp.coo_matrix((vals, (pairs[:, 0], pairs[:, 1])), shape=(n, n))
    A = (A + A.T).tocsr()
    A = A + sp.diags(np.abs(A).sum(axis=1).A.ravel() + 1.0)

    bsr = BsrMatrix.from_csr(A.tocsr(), np.float64, verts, block=16,
                             deg_cap=4)   # tiny cap -> real spill traffic
    v = rng.normal(size=(n, 3))
    ref = A @ v
    got = np.asarray(bsr.apply(jnp.asarray(v)))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)
    # blocked round trip
    vb = bsr.to_blocked(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(bsr.from_blocked(vb, n)), v)


@pytest.mark.skipif(not __import__("os").path.exists(DATA_GEO),
                    reason="reference data not mounted")
def test_flat_cache_slack_positive_for_on_surface_queries():
    """Regression guard for the airport3k refresh storm (round 4): the
    flat candidate cache's slack must stay strictly positive even for
    queries ON the reference surface, where bound-only margins collapse
    to zero (dozens of triangle bounding spheres contain the point) and
    a single non-positive query forces a whole-batch refresh every
    iteration. The exact-distance slack ((k+1)-th exact distance capped
    by the 2k-th lower bound) keeps it positive."""
    import jax.numpy as jnp
    from aa_admm_tpu.core.meshio import load_obj
    from aa_admm_tpu.ops.closest_point import (closest_point_cached,
                                               cp_cache_init)
    ref = load_obj(DATA_GEO + "/PQMeshData/trimesh/airport3k_tri.obj")
    tri = jnp.asarray(ref.verts[ref.faces])
    # On-surface queries: triangle centroids (worst case for bound-only
    # slack) plus the airport3k scenario itself (mesh starts on surface).
    q = jnp.asarray(ref.verts[ref.faces].mean(axis=1)[:2000])
    cache = cp_cache_init(int(q.shape[0]), 48, np.float64)
    out, cache = closest_point_cached(q, tri, cache)
    sl = np.asarray(cache.slack)
    assert sl.min() > 0, f"non-positive slack: min {sl.min()}"
    # and the refresh value is the true closest point (distance ~0 here)
    d = np.linalg.norm(np.asarray(q) - np.asarray(out), axis=1)
    assert d.max() < 1e-9


def test_gather_adjoint_scatter_matches_segment_sum():
    """with_gather_adjoint must reproduce the segment_sum scatter exactly
    (f64) for every batch type that supports it — the TPU hot path swaps
    the 12-byte-row scatter for a padded per-vertex gather (PERF.md r5)."""
    import numpy as np
    import jax.numpy as jnp
    from aa_admm_tpu.ops.constraints import (AngleBatch, EdgeLengthBatch,
                                             PlaneBatch, with_gather_adjoint)

    rng = np.random.default_rng(11)
    n = 40
    tri = rng.integers(0, n, (25, 3))
    edges = rng.integers(0, n, (30, 2))
    faces = [list(rng.choice(n, size=rng.integers(3, 6), replace=False))
             for _ in range(12)]

    batches = [
        (AngleBatch.create(tri, 1.0, 0.3, 2.8), (25, 2, 3)),
        (EdgeLengthBatch.create(edges, 1.0, 0.9), (30, 1, 3)),
        (PlaneBatch.create(faces, 1.0), None),
    ]
    for b, shape in batches:
        shape = shape or b.block_shape
        t = jnp.asarray(rng.standard_normal(shape))
        ref = np.asarray(b.scatter(t, n))
        armed = with_gather_adjoint(b, n)
        assert armed.inv_idx is not None
        out = np.asarray(armed.scatter(t, n))
        np.testing.assert_allclose(out, ref, rtol=1e-13, atol=1e-13), type(b)


def test_gather_adjoint_respects_cast_dtype():
    """Arming a cast_floats'ed batch must take the DEVICE dtype, not the
    f64 host mirror's — an f64 inv_mask poisons the f32 loop carry (the
    exact leak that broke the planarity scenes when first shipped; the
    CPU-gated scenes tests cannot catch it because arming is
    accelerator-only)."""
    import numpy as np
    from aa_admm_tpu.ops.constraints import (AngleBatch, cast_floats,
                                             with_gather_adjoint)
    rng = np.random.default_rng(5)
    b = AngleBatch.create(rng.integers(0, 20, (10, 3)), 1.0, 0.3, 2.8,
                          dtype=np.float64)
    b32 = cast_floats(b, np.float32)
    armed = with_gather_adjoint(b32, 20)
    assert armed.inv_mask.dtype == np.float32, armed.inv_mask.dtype
