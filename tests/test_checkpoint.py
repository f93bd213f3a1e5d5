import numpy as np

from aa_admm_tpu.core.checkpoint import (load_admm_state_text,
                                         save_admm_state_text,
                                         load_solver_npz, save_solver_npz)
from aa_admm_tpu.core.solverlog import SolverLog


def test_text_state_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    z, u, lz = rng.normal(size=(3, 50))
    x = rng.normal(size=30)
    f1, f2 = str(tmp_path / "zu.txt"), str(tmp_path / "x.txt")
    save_admm_state_text(f1, f2, z, u, lz, x)
    z2, u2, lz2, x2 = load_admm_state_text(f1, f2)
    assert np.allclose(z, z2, rtol=1e-14)
    assert np.allclose(u, u2, rtol=1e-14)
    assert np.allclose(lz, lz2, rtol=1e-14)
    assert np.allclose(x, x2, rtol=1e-14)


def test_npz_roundtrip(tmp_path):
    p = str(tmp_path / "ck.npz")
    save_solver_npz(p, x=np.arange(6.0).reshape(2, 3), it=np.int64(7))
    d = load_solver_npz(p)
    assert np.allclose(d["x"], np.arange(6.0).reshape(2, 3))
    assert int(d["it"]) == 7


def test_solverlog():
    log = SolverLog()
    x_star = np.ones(5)
    log.add(np.zeros(5))  # skipped: x_star unset
    assert log.errors == []
    log.x_star = x_star
    log.add(np.zeros(5))
    log.add(0.5 * np.ones(5))
    log.add(np.ones(5))
    assert np.allclose(log.errors, [1.0, 0.5, 0.0])
    log.finalize(lambda x: 2.0 * x, np.ones(5), 2.0 * np.ones(5))
    assert log.final_r == 0.0


def test_save_matrix(tmp_path):
    from aa_admm_tpu.core.config import Lame, Settings
    from aa_admm_tpu.core.factory import make_tet_blocks
    from aa_admm_tpu.solver.physics import PhysicsSolver
    import numpy as np

    mesh = make_tet_blocks(2, 1, 1)
    s = Settings(); s.verbose = 0; s.admm_iters = 5
    solver = PhysicsSolver()
    solver.add_tetmesh(mesh.verts, mesh.tets,
                       Lame.from_young_poisson(1e6, 0.3))
    solver.set_pins([0])
    solver.initialize(s)
    p = str(tmp_path / "A.txt")
    solver.save_matrix(p)
    A = np.loadtxt(p)
    nf = solver.system.n_free
    assert A.shape == (nf, nf)
    assert np.allclose(A, A.T)
    assert np.all(np.linalg.eigvalsh(A) > 0)  # SPD
