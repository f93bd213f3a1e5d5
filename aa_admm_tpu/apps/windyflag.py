"""windyflag — cloth under wind with strain limiting, zxu order
(admm_anderson_hard_zxu/samples/Asia2019/windyflag.cpp:63-183, headless).

cloth.obj triangle mesh, Lame(50, 0.1) with strain limits [0.95, 1.05], two
corner pins on the min-x edge, Wejchert-Haumann wind (10,0,2)*2.5,
admm_iters=100, penalty=1.0.
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.config import Lame, Settings
from ..core.meshio import load_obj
from ..solver.physics import PhysicsSolver, UpdateOrder
from ._data import find_data


def get_pins(verts):
    """windyflag.cpp:27-60: among min-x vertices, the min-y and max-y ones."""
    min_x = verts[:, 0].min() + 1e-3
    up_idx = down_idx = -1
    curr_max_y, curr_min_y = -99999.0, 99999.0
    for i, v in enumerate(verts):
        if v[0] > min_x:
            continue
        if v[1] < curr_min_y:
            up_idx, curr_min_y = i, v[1]
        elif v[1] > curr_max_y:
            down_idx, curr_max_y = i, v[1]
    if up_idx < 0 or down_idx < 0:
        raise RuntimeError("Failed to find pin locations")
    return [up_idx, down_idx]


def build_scene(settings: Settings, mesh_path: str | None = None,
                wind_mode: str = "jacobi"):
    """wind_mode: 'jacobi' (deterministic fused kick, TPU default) or
    'sequential' (exact 1-thread reference wind-loop semantics) — see
    WindForce. The reference's own wind-ON result is thread-schedule-
    dependent; 'sequential' reproduces its single-thread run to ~2e-7
    (tests/test_parity.py)."""
    mesh = load_obj(mesh_path or find_data("cloth.obj"))
    lame = Lame.from_young_poisson(50, 0.1, limit_min=0.95, limit_max=1.05)

    solver = PhysicsSolver(order=UpdateOrder.ZXU)
    solver.add_trimesh(mesh.verts, mesh.faces, lame)
    solver.set_pins(get_pins(mesh.verts))
    solver.set_wind(mesh.faces, np.array([10.0, 0.0, 2.0]) * 2.5,
                    mode=wind_mode)
    solver.initialize(settings)
    return solver


def main(argv=None, n_frames: int = 10, result_dir: str = "result"):
    settings = Settings()
    settings.admm_iters = 100
    settings.penalty = 1.0
    if settings.parse_args(argv or sys.argv[1:]):
        return 0
    solver = build_scene(settings)
    for _ in range(n_frames):
        solver.step()
    solver.save(result_dir)
    return solver


if __name__ == "__main__":
    main()
