"""plinkohit — horse759 tet mesh dropped onto a plane-and-half-sphere
obstacle with per-vertex hard collision terms, zxu order
(admm_anderson_hard_zxu/samples/Asia2019/plinkohit.cpp:39-123, headless).
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.config import Lame, Settings
from ..core.meshio import load_elenode
from ..solver.physics import PhysicsSolver, UpdateOrder
from ._data import find_data


def build_scene(settings: Settings, mesh_path: str | None = None):
    mesh = load_elenode(mesh_path or find_data("horse759"))
    # xform: scale 13, translate (0.25, 2.5, 0) (plinkohit.cpp:47-50).
    # The reference stores mesh vertices as float32 (mcl::TetMesh Vec3f) and
    # applies an XForm<float>; replicate that rounding so initial state
    # matches the C++ build bit-for-bit when cast back to f64.
    v32 = mesh.verts.astype(np.float32)
    mesh.verts = (np.float32(13.0) * v32
                  + np.array([0.25, 2.5, 0.0], np.float32)).astype(np.float64)

    solver = PhysicsSolver(order=UpdateOrder.ZXU)
    solver.add_tetmesh(mesh.verts, mesh.tets, Lame.rubber(), kind="linear")
    # Plane+half-sphere at y=-3, r=1 (plinkohit.cpp:87-92)
    solver.add_obstacle("plane_half_sphere", center=[0.0, -3.0, 0.0], rad=1.0)
    # Hard collision terms on every vertex (set_collision, plinkohit.cpp:103-123)
    solver.set_collisions(list(range(len(mesh.verts))))
    solver.initialize(settings)
    return solver


def main(argv=None, n_frames: int = 10, result_dir: str = "result"):
    settings = Settings()
    settings.admm_iters = 13
    if settings.parse_args(argv or sys.argv[1:]):
        return 0
    solver = build_scene(settings)
    for _ in range(n_frames):
        solver.step()
    solver.save(result_dir)
    return solver


if __name__ == "__main__":
    main()
