"""Dynamic (self/mutual) collision via the spatial-hash collider wired into
the zxu solver path (TetMeshCollision equivalent)."""

import numpy as np

from aa_admm_tpu.core.config import Lame, Settings
from aa_admm_tpu.core.factory import make_tet_blocks
from aa_admm_tpu.solver.physics import PhysicsSolver, UpdateOrder


def test_two_blocks_mutual_collision():
    """A block dropped onto a pinned block must collide with it (contacts
    fire, it rebounds) and never tunnel through — the hard-snap contact
    response is elastic, like the reference's collision prox."""
    bottom = make_tet_blocks(2, 1, 2)
    top = make_tet_blocks(1, 1, 1)
    top.verts = top.verts + np.array([0.5, 2.0, 0.5])

    s = Settings()
    s.admm_iters = 10
    s.verbose = 0
    solver = PhysicsSolver(order=UpdateOrder.ZXU)
    o0 = solver.add_tetmesh(bottom.verts, bottom.tets, Lame.rubber(),
                            self_collision=True)
    solver.add_tetmesh(top.verts, top.tets, Lame.rubber(),
                       self_collision=True)
    # Pin the bottom block in place entirely.
    solver.set_pins(list(range(o0, o0 + len(bottom.verts))))
    assert solver.initialize(s)

    nb = len(bottom.verts)
    top_ids = np.arange(nb, nb + len(top.verts))
    saw_contact = False
    ymin_ever = np.inf
    for _ in range(30):
        solver.step()
        b = solver.system.batches[solver._selfcol_index]
        saw_contact |= bool(np.asarray(b.active).any())
        ymin_ever = min(ymin_ever, solver.x[top_ids, 1].min())

    # Bottom slab occupies y in [0, 1]: the top block fell (left y=2),
    # contacts fired, and it never tunneled through the slab.
    assert saw_contact, "no contact ever detected"
    assert ymin_ever < 1.4, f"did not fall: min y = {ymin_ever}"
    assert ymin_ever > 0.5, f"fell through: min y = {ymin_ever}"
    assert np.all(np.isfinite(solver.x))


def test_no_dynamic_collider_with_xzu():
    import pytest
    mesh = make_tet_blocks(1, 1, 1)
    solver = PhysicsSolver(order=UpdateOrder.XZU)
    solver.add_tetmesh(mesh.verts, mesh.tets, Lame.rubber(),
                       self_collision=True)
    with pytest.raises(ValueError):
        solver.initialize(Settings())


def test_overflow_escalates_to_exact():
    """A solver whose hash collider overflows (1 bucket, cap=1) must
    escalate (grow cap / fall back dense) instead of silently missing
    contacts: its contact set must match a dense-collider run exactly."""
    import jax.numpy as jnp
    from aa_admm_tpu.ops.collider import (DynamicTetCollider,
                                          HashGridTetCollider)

    bottom = make_tet_blocks(2, 1, 2)
    top = make_tet_blocks(1, 1, 1)
    top.verts = top.verts + np.array([0.5, 0.95, 0.5])  # already touching

    def build(overflowing):
        s = Settings()
        s.admm_iters = 5
        s.verbose = 0
        solver = PhysicsSolver(order=UpdateOrder.ZXU)
        o0 = solver.add_tetmesh(bottom.verts, bottom.tets, Lame.rubber())
        solver.add_tetmesh(top.verts, top.tets, Lame.rubber())
        solver.set_pins(list(range(o0, o0 + len(bottom.verts))))
        n = len(bottom.verts) + len(top.verts)
        if overflowing:
            solver.add_dynamic_collider(bottom.verts, bottom.tets,
                                        vert_offset=0, n_buckets=1, cap=1)
            solver.add_dynamic_collider(top.verts, top.tets,
                                        vert_offset=len(bottom.verts),
                                        n_buckets=1, cap=1)
        else:
            solver.dynamic_colliders = [
                DynamicTetCollider.create(bottom.verts, bottom.tets,
                                          vert_offset=0),
                DynamicTetCollider.create(top.verts, top.tets,
                                          vert_offset=len(bottom.verts))]
        assert solver.initialize(s)
        return solver

    ref = build(overflowing=False)
    ref._refresh_self_contacts()
    b_ref = ref.system.batches[ref._selfcol_index]

    ov = build(overflowing=True)
    assert any(isinstance(dc, HashGridTetCollider)
               for dc in ov.dynamic_colliders)
    ov._refresh_self_contacts()
    b_ov = ov.system.batches[ov._selfcol_index]

    assert np.asarray(b_ref.active).any(), "scene must actually touch"
    assert np.array_equal(np.asarray(b_ov.active), np.asarray(b_ref.active))
    np.testing.assert_allclose(np.asarray(b_ov.target),
                               np.asarray(b_ref.target), atol=1e-12)
