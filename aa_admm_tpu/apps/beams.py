"""beams — the reference's headline benchmark scene
(admm_anderson_xzu/samples/Asia2019/beams.cpp:94-167, headless).

Three 12x3x3 tet-block beams (Linear / NeoHookean / StVK, soft rubber),
end-pinned, with the pins stretched +/- x by 1 m/s each frame
(stretch_beams, beams.cpp:66-92). Runs the xzu solver; writes
result/residual-{m|no}.txt like the reference's testAndersonADMM harness.
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.config import Lame, Settings
from ..core.factory import make_tet_blocks
from ..solver.physics import PhysicsSolver, UpdateOrder


def build_scene(settings: Settings, order=UpdateOrder.XZU):
    dim = 3
    kinds = ["linear", "neohookean", "stvk"]
    offsets_y = [1.75, 0.0, -1.75]
    soft_rubber = Lame.from_young_poisson(10000000, 0.399)

    solver = PhysicsSolver(order=order)
    pin_ids, pin_labels, pin_points = [], [], []
    for kind, oy in zip(kinds, offsets_y):
        mesh = make_tet_blocks(dim * 4, dim, dim)
        lo, hi = mesh.bounds()
        center = 0.5 * (lo + hi)
        scale = 1.0 / (hi - lo)[1]          # each beam 1 m tall
        mesh.verts = (mesh.verts - center) * scale + np.array([0.0, oy, 0.0])
        offset = solver.add_tetmesh(mesh.verts, mesh.tets, soft_rubber,
                                    kind=kind)
        # find_pins (beams.cpp:37-60): extreme-x vertices of each beam.
        min_x = mesh.verts[:, 0].min() + 1e-2
        max_x = mesh.verts[:, 0].max() - 1e-2
        for j, v in enumerate(mesh.verts):
            if v[0] < min_x:
                pin_ids.append(j + offset)
                pin_labels.append(0)
                pin_points.append(v.copy())
            elif v[0] > max_x:
                pin_ids.append(j + offset)
                pin_labels.append(1)
                pin_points.append(v.copy())

    def stretch(dt):
        """stretch_beams (beams.cpp:66-92): move pins +/- 1 m/s in x.
        Reads the solver's current pin positions, so it composes with the
        fused rollout driver (run(n, pin_vel) advances solver.pins too)."""
        move = np.array([1.0, 0.0, 0.0]) * dt
        pts = []
        for pid, lab, p0 in zip(pin_ids, pin_labels, pin_points):
            cur = solver.pins.get(pid, p0)
            pts.append(cur + (move if lab else -move))
        solver.set_pins(pin_ids, pts)

    stretch(settings.timestep_s)  # initial pin placement (beams.cpp:160)
    solver.initialize(settings)
    # Constant pin velocity field for the fused rollout driver
    # (PhysicsSolver.run(n, pin_vel=stretch.pin_velocity) ==
    #  n x [stretch(dt); step()]).
    vel = np.zeros((solver.n_verts, 3))
    for pid, lab in zip(pin_ids, pin_labels):
        vel[pid, 0] = 1.0 if lab else -1.0
    stretch.pin_velocity = vel
    return solver, stretch


def log_x_star(settings: Settings, result_dir: str = "result",
               star_iters: int = 2000):
    """Convergence-vs-ground-truth logging (SolverLog.hpp:28-71, VERDICT r4
    #8): run the FIRST beams timestep to convergence (star_iters, no
    acceleration — the exact minimizer of that step's ADMM objective), then
    re-run the same step with the configured settings feeding a SolverLog,
    and write ``result/solverlog-{m|no}.txt`` with one
    ``runtime_ms  normalized_error`` row per iteration
    (error = ||x*-x|| / ||x*-x0||, SolverLog::add).

    Returns the SolverLog (errors/runtimes populated)."""
    import copy
    import os

    from ..core.solverlog import SolverLog

    star_settings = copy.deepcopy(settings)
    star_settings.admm_iters = star_iters
    from ..core.config import AccelType
    star_settings.acceleration_type = AccelType.NOACC
    ref_solver, ref_stretch = build_scene(star_settings)
    ref_stretch(star_settings.timestep_s)
    ref_solver.step()
    x_star = np.asarray(ref_solver.x, np.float64).ravel()

    log = SolverLog()
    log.x_star = x_star
    solver, stretch = build_scene(settings)
    stretch(settings.timestep_s)
    solver.step_instrumented(log=log)

    os.makedirs(result_dir, exist_ok=True)
    from ..core.config import AccelType as _A
    tag = (str(settings.anderson_m)
           if settings.acceleration_type == _A.ANDERSON else "no")
    path = os.path.join(result_dir, f"solverlog-{tag}.txt")
    with open(path, "w") as f:
        for t, e in zip(log.runtimes, log.errors):
            f.write(f"{t}\t{e:.16g}\n")
    return log


def main(argv=None, n_frames: int = 10, result_dir: str = "result"):
    argv = list(argv if argv is not None else sys.argv[1:])
    want_log = "--log-x-star" in argv
    if want_log:
        argv.remove("--log-x-star")
    settings = Settings()
    settings.admm_iters = 100
    if settings.parse_args(argv):
        return 0
    if want_log:
        log_x_star(settings, result_dir)
    solver, stretch = build_scene(settings)
    for _ in range(n_frames):
        stretch(settings.timestep_s)
        solver.step()
    solver.save(result_dir)
    return solver


if __name__ == "__main__":
    main()
