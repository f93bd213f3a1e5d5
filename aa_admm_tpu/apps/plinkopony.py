"""plinkopony — horse759 dropped through a 2-layer grid of cylinder pegs
onto a tilted slide floor, zxu order
(admm_anderson_hard_zxu/samples/Asia2019/plinkopony.cpp:28-110, headless).
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
    # f32 transform to match the reference's XForm<float> rounding
    # (plinkopony.cpp:39-42); see plinkohit.build_scene.
    v32 = mesh.verts.astype(np.float32)
    mesh.verts = (np.float32(13.0) * v32
                  + np.array([0.25, 5.0, 0.0], np.float32)).astype(np.float64)

    solver = PhysicsSolver(order=UpdateOrder.ZXU)
    solver.add_tetmesh(mesh.verts, mesh.tets, Lame.rubber(), kind="linear")
    # 3x5 + 2x4 cylinder pegs (plinkopony.cpp:56-80)
    for j in range(3):
        for i in range(5):
            solver.add_obstacle("cylinder",
                                center=[i * 1.5 - 3.0, j * 3.0 - 3.0, 0.0],
                                rad=0.4)
    for j in range(2):
        for i in range(4):
            solver.add_obstacle("cylinder",
                                center=[i * 1.5 - 2.25, j * 3.0 - 1.5, 0.0],
                                rad=0.4)
    # Tilted slide floor at y=-6.5 with normal (0.5, sqrt(3)/2, 0)
    solver.add_obstacle("slide_floor", center=[0.0, -6.5, 0.0],
                        normal=[0.5, np.sqrt(3.0) / 2.0, 0.0])
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
