"""Mesh colliders: PassiveMesh tet-mesh SDF and dynamic TetMeshCollision."""

import jax.numpy as jnp
import numpy as np

from aa_admm_tpu.core.factory import make_tet_blocks
from aa_admm_tpu.ops.collider import (DynamicTetCollider, TetMeshSdf,
                                      barycoords_tet, detect, point_in_tets)
from aa_admm_tpu.ops.sdf import SdfSceneBuilder


def test_barycoords():
    v0, v1 = np.zeros(3), np.array([1.0, 0, 0])
    v2, v3 = np.array([0.0, 1, 0]), np.array([0.0, 0, 1])
    b = np.asarray(barycoords_tet(jnp.asarray([0.25, 0.25, 0.25]),
                                  *map(jnp.asarray, (v0, v1, v2, v3))))
    assert np.allclose(b, [0.25, 0.25, 0.25, 0.25])


def test_point_in_tets():
    mesh = make_tet_blocks(1, 1, 1)  # unit cube, 5 tets
    tv = jnp.asarray(mesh.verts[mesh.tets])
    pts = jnp.asarray([[0.5, 0.5, 0.5], [2.0, 0.5, 0.5], [0.01, 0.01, 0.01]])
    inside, first, barys = point_in_tets(pts, tv)
    assert bool(inside[0]) and bool(inside[2])
    assert not bool(inside[1])
    assert np.all(np.asarray(barys[0]) >= -1e-12)


def test_passive_mesh_sdf():
    # Single unit cube: the 5-tet split's internal faces are shared and
    # excluded; only the 12 boundary triangles remain. (Multi-cube blocks
    # have mismatched interface diagonals, so interface triangles correctly
    # count as boundary there.)
    mesh = make_tet_blocks(1, 1, 1)
    sdf = TetMeshSdf.create(mesh.verts, mesh.tets)
    pts = jnp.asarray([[0.5, 0.5, 0.5],    # center: inside, depth 0.5
                       [0.5, 0.5, 0.1],    # near z=0 face: inside, depth .1
                       [2.0, 0.5, 0.5]])   # outside
    d, q = sdf.signed_distance(pts)
    d, q = np.asarray(d), np.asarray(q)
    assert abs(d[0] + 0.5) < 1e-10
    assert abs(d[1] + 0.1) < 1e-10
    assert d[2] > 1e10                     # outside -> untouched sentinel
    assert abs(q[1][2] - 0.0) < 1e-10      # projected to z=0 face


def test_dynamic_tet_collider_rest_mapping():
    mesh = make_tet_blocks(1, 1, 1)
    dc = DynamicTetCollider.create(mesh.verts, mesh.tets)
    # Deform: stretch the cube 2x in x. A point inside the deformed cube
    # maps back to the rest pose at half its x coordinate.
    x_all = jnp.asarray(mesh.verts * np.array([2.0, 1.0, 1.0]))
    q = jnp.asarray([[1.0, 0.5, 0.5]])     # deformed center
    hit = dc.detect(q, x_all)
    assert bool(hit.hit[0])
    # Rest point = (0.5, 0.5, 0.5) -> nearest rest surface at distance 0.5,
    # projected to a face of the unit cube.
    p = np.asarray(hit.point[0])
    assert np.isclose(np.min([p.min(), 1 - p.max()]), 0.0, atol=1e-9)
    # Own-vertex exclusion: a query at a mesh vertex with its id skips tets
    # containing that vertex.
    q2 = jnp.asarray(mesh.verts[:1] * np.array([2.0, 1.0, 1.0]))
    hit2 = dc.detect(q2, x_all, query_ids=jnp.asarray([0]))
    assert not bool(hit2.hit[0])


def test_detect_combines_scene_and_mesh():
    box = make_tet_blocks(1, 1, 1)
    box.verts = box.verts + np.array([5.0, 0.0, 0.0])
    sdf = TetMeshSdf.create(box.verts, box.tets)
    scene = SdfSceneBuilder().add_floor(0.0).build()
    pts = jnp.asarray([[0.0, -0.5, 0.0],   # below floor
                       [5.5, 0.5, 0.5],    # inside box
                       [0.0, 2.0, 0.0]])   # free
    passive, _ = detect(pts, scene=scene, mesh_sdfs=[sdf])
    hit = np.asarray(passive.hit)
    assert hit.tolist() == [True, True, False]
    assert np.asarray(passive.dx)[0] < 0


def test_zxu_mesh_obstacle():
    """A box dropped onto a static tet-mesh obstacle via add_obstacle('mesh')."""
    from aa_admm_tpu.core.config import Lame, Settings
    from aa_admm_tpu.solver.physics import PhysicsSolver, UpdateOrder

    falling = make_tet_blocks(1, 1, 1)
    falling.verts = falling.verts + np.array([0.0, 2.0, 0.0])
    # Obstacle must be a CONFORMING tet mesh (like the reference's tetgen
    # assets): a single 5-tet cube scaled into a slab. Multi-cube factory
    # blocks have non-conforming interface diagonals, so count-based surface
    # extraction keeps internal walls (same artifact as mclscene's factory).
    obstacle = make_tet_blocks(1, 1, 1)
    obstacle.verts = (obstacle.verts * np.array([3.0, 1.0, 3.0])
                      + np.array([-1.0, -1.5, -1.0]))

    s = Settings()
    s.admm_iters = 15
    s.verbose = 0
    solver = PhysicsSolver(order=UpdateOrder.ZXU)
    solver.add_tetmesh(falling.verts, falling.tets, Lame.rubber())
    solver.add_obstacle("mesh", verts=obstacle.verts, tets=obstacle.tets)
    solver.set_collisions(list(range(len(falling.verts))))
    solver.initialize(s)
    for _ in range(40):
        solver.step()
    # Obstacle top surface is y=-0.5; the box must rest on/above it
    # (small penetration tolerated), not fall through.
    assert solver.x[:, 1].min() > -0.8
    assert solver.x[:, 1].min() < 0.2
    assert np.all(np.isfinite(solver.x))


def test_hash_grid_matches_dense():
    """HashGridTetCollider must reproduce DynamicTetCollider.detect exactly
    (same hits, same payload) on a deformed multi-block mesh."""
    from aa_admm_tpu.ops.collider import HashGridTetCollider

    mesh = make_tet_blocks(4, 2, 3)
    rng = np.random.default_rng(3)
    dc = DynamicTetCollider.create(mesh.verts, mesh.tets)
    hc = HashGridTetCollider.create(mesh.verts, mesh.tets, cap=48)
    x_all = jnp.asarray(mesh.verts
                        + 0.15 * rng.normal(size=mesh.verts.shape))
    q = jnp.asarray(np.concatenate([
        mesh.verts * 0.9 + 0.05,                          # mostly inside
        rng.uniform(-1, 5, size=(64, 3)),                 # scattered
    ]))
    ids = jnp.asarray(np.concatenate([
        np.arange(len(mesh.verts)), np.full(64, -1)]).astype(np.int32))
    d = dc.detect(q, x_all, query_ids=ids)
    h = hc.detect(q, x_all, query_ids=ids)
    assert np.array_equal(np.asarray(d.hit), np.asarray(h.hit))
    assert np.array_equal(np.asarray(d.face)[np.asarray(d.hit)],
                          np.asarray(h.face)[np.asarray(d.hit)])
    np.testing.assert_allclose(np.asarray(d.point), np.asarray(h.point),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.normal), np.asarray(h.normal),
                               atol=1e-12)


def test_hash_grid_overflow_flag():
    """detect_with_overflow must report candidate truncation: with every
    tet forced into one bucket (n_buckets=1) and a tiny cap, the flag fires
    and hits may be missed; with a sufficient cap it stays False and the
    result matches the dense collider."""
    from aa_admm_tpu.ops.collider import HashGridTetCollider

    mesh = make_tet_blocks(3, 1, 1)
    x_all = jnp.asarray(mesh.verts)
    q = jnp.asarray(mesh.verts * 0.9 + 0.03)
    small = HashGridTetCollider.create(mesh.verts, mesh.tets,
                                       n_buckets=1, cap=2)
    _, ovf = small.detect_with_overflow(q, x_all)
    assert bool(ovf)

    big = HashGridTetCollider.create(mesh.verts, mesh.tets,
                                     n_buckets=1, cap=len(mesh.tets))
    h, ovf2 = big.detect_with_overflow(q, x_all)
    assert not bool(ovf2)
    d = DynamicTetCollider.create(mesh.verts, mesh.tets).detect(q, x_all)
    assert np.array_equal(np.asarray(d.hit), np.asarray(h.hit))
