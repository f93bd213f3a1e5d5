"""aa_admm_tpu — a TPU-native Anderson-Accelerated ADMM framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
reference AA-ADMM codebase (Zhang, Peng, Ouyang, Deng, "Accelerating ADMM for
Efficient Simulation and Optimization", SIGGRAPH Asia 2019): physics
simulation of elastic tets/cloth with two ADMM update orders (x->z->u and
z->x->u), and constraint-based geometry optimization (planarity / wire-mesh),
all accelerated by safeguarded Anderson acceleration.

Design stance (TPU-first, not a port):
  * arrays, not objects — per-type element batches, vmapped prox kernels
  * matrix-free or dense-inverse (single MXU matmul) global step instead of
    sparse Cholesky backsolves
  * Anderson acceleration as a pure function of fixed-shape carried state
  * the ADMM loop is a single compiled ``lax.scan``
  * multi-chip scaling via ``jax.sharding`` meshes (new capability; the
    reference is OpenMP shared-memory only)
"""

import jax as _jax

# The reference computes in float64 throughout (Geometry/Types.h:37-41).
# Enabling x64 makes f64 *available*; every array in this package carries an
# explicit dtype so TPU runs can choose f32/bf16 via config.
_jax.config.update("jax_enable_x64", True)

# TPU matmuls default to bf16 inputs (8-bit mantissa). For a simulation
# framework that is catastrophic: the global-step solve (Ainv @ rhs) and the
# coarse-phase closest-point distances (p @ cent.T with coordinates ~1e2-1e3)
# pick up absolute errors large enough to break convergence and candidate
# selection (measured: WireMeshOpt init energy 2.0e6 instead of 449 on a
# v5e). 'highest' keeps f32 matmuls true-f32 on the MXU (multi-pass); the
# element-local hot path is unrolled VPU arithmetic (ops/mat3.py) and is
# unaffected. Override with AAADMM_MATMUL_PRECISION if a study wants bf16.
import os as _os
_jax.config.update("jax_default_matmul_precision",
                   _os.environ.get("AAADMM_MATMUL_PRECISION", "highest"))

# Persistent compilation cache: the big geometry programs take minutes to
# (remote-)compile on a tunneled TPU; caching makes every repeat run skip
# that. Disable with AAADMM_COMP_CACHE=0.
if _os.environ.get("AAADMM_COMP_CACHE", "1") != "0":
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/aa_admm_tpu/jax_cache"))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

__version__ = "0.1.0"

from .core.config import Settings, Parameters, AccelType  # noqa: E402,F401
from .solver.physics import PhysicsSolver, UpdateOrder  # noqa: E402,F401
from .solver.geometry import ALMGeometrySolver  # noqa: E402,F401
