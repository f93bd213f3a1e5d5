"""Configuration surfaces mirroring the reference's two mechanisms.

* ``Settings`` — physics CLI flags (``-dt -v -it -g -ck -a -am -ab -ap``),
  defaults matching ``admm_anderson_*/src/Solver.hpp:46-67``.
* ``Parameters`` — geometry option files (whitespace ``key value`` lines,
  ``#`` comments), keys per ``Geometry/Parameters.h:59-90,232-238``.

Reference command lines translate 1:1 onto these.
"""

from __future__ import annotations

import dataclasses
import enum
import os
from typing import Optional

import numpy as np


class AccelType(enum.IntEnum):
    NOACC = 0
    ANDERSON = 1


def default_dtype():
    """f64 matches the reference; override with AAADMM_DTYPE=float32 on TPU."""
    name = os.environ.get("AAADMM_DTYPE", "float64")
    return np.dtype(name)


@dataclasses.dataclass
class Settings:
    """Physics solver settings (reference admm::Solver::Settings).

    Defaults per admm_anderson_hard_zxu/src/Solver.hpp:63-66: dt=1/30,
    verbose=1, admm_iters=500, gravity=-9.8, m=2, penalty=1.0, NOACC.
    """

    timestep_s: float = 1.0 / 30.0       # -dt
    verbose: int = 1                     # -v
    admm_iters: int = 500                # -it
    gravity: float = -9.8                # -g
    # -ck: parsed for CLI compatibility but vestigial, like the reference:
    # constraint_w only scales ConstraintSet::make_matrix's linear collision
    # rows (ConstraintSet.hpp:67), a path that is dead with the LDLT solver
    # the shipped scenes use (collisions go through CollisionEnergyTerm
    # instead, whose weight is sqrt(2*bulk(soft_rubber)) and not -ck-scaled).
    constraint_w: float = -1.0           # -ck (vestigial, see above)
    anderson_m: int = 2                  # -am (setting it turns acceleration on)
    beta: float = 1.0                    # -ab (xzu only; vestigial in reference)
    penalty: float = 1.0                 # -ap (zxu only)
    acceleration_type: AccelType = AccelType.NOACC  # -a {0,1}
    dtype: np.dtype = dataclasses.field(default_factory=default_dtype)
    # TPU additions (no reference equivalent):
    collect_comb_residual: bool = True   # diagnostic combined residual per iter
    linear_solver: str = "auto"          # auto | dense | cg
    cg_tol: float = 1e-12
    cg_max_iters: int = 400
    # Residual-timestamp fidelity: 0 = one fused scan per step (fastest;
    # per-iteration times in result/residual-*.txt are spread uniformly
    # over the measured step). k > 0 = dispatch the ADMM loop in timed
    # chunks of k iterations, so the artifact's time column is measured at
    # chunk granularity (k=1 reproduces the reference's per-iteration
    # timestamps, Solver.hpp:126-151, at the cost of per-iter dispatch).
    trace_chunk: int = 0

    def parse_args(self, argv) -> bool:
        """Parse reference-style flags. Returns True if help was requested
        (mirrors Solver::Settings::parse_args, Solver.cpp:510-534). A
        non-numeric value raises ValueError naming the flag."""
        args = list(argv)
        i = 0
        while i < len(args):
            arg = args[i]
            if arg in ("-help", "--help", "-h"):
                print(self.help())
                return True
            nxt = args[i + 1] if i + 1 < len(args) else None
            if nxt is not None and arg in ("-dt", "-v", "-it", "-g", "-ck",
                                           "-a", "-am", "-ab", "-ap"):
                try:
                    float(nxt)
                except ValueError:
                    raise ValueError(
                        f"invalid value for {arg}: '{nxt}' (expected a number)"
                    ) from None
            if arg == "-dt" and nxt:
                self.timestep_s = float(nxt); i += 1
            elif arg == "-v" and nxt:
                self.verbose = int(nxt); i += 1
            elif arg == "-it" and nxt:
                self.admm_iters = int(nxt); i += 1
            elif arg == "-g" and nxt:
                self.gravity = float(nxt); i += 1
            elif arg == "-ck" and nxt:
                self.constraint_w = float(nxt); i += 1
            elif arg == "-a" and nxt:
                self.acceleration_type = (
                    AccelType.NOACC if int(nxt) == 0 else AccelType.ANDERSON
                ); i += 1
            elif arg == "-am" and nxt:
                self.anderson_m = int(nxt)
                self.acceleration_type = AccelType.ANDERSON
                i += 1
            elif arg == "-ab" and nxt:
                self.beta = float(nxt); i += 1
            elif arg == "-ap" and nxt:
                self.penalty = float(nxt); i += 1
            i += 1
        return False

    @staticmethod
    def help() -> str:
        return (
            "\n==========================================\nArgs:\n"
            "\t-dt: time step (s)\n"
            "\t-v: verbosity (higher -> show more)\n"
            "\t-it: # admm iters\n"
            "\t-g: gravity (m/s^2)\n"
            "\t-ck: constraint weights (-1 = auto)\n"
            "\t-a: acceleration type (0=NoAcc, 1=Anderson)\n"
            "\t-am: anderson window size (>0, int)\n"
            "\t-ap: admm penalty parameter (zxu)\n"
            "==========================================\n"
        )

    @property
    def accelerated(self) -> bool:
        return self.acceleration_type == AccelType.ANDERSON and self.anderson_m > 0


@dataclasses.dataclass
class Parameters:
    """Geometry option file (reference Geometry/Parameters.h:36-254).

    Defaults: iter=1, anderson_m=5 (Parameters.h:39-45)."""

    iterations: int = 1
    anderson_m: int = 5
    square_elasticity: bool = False
    time_step: float = 0.0

    _KEYS = {
        "iterations": ("iterations", int),
        "andersonm": ("anderson_m", int),
        "squareelasticity": ("square_elasticity", lambda v: bool(int(v))),
        "timestep": ("time_step", float),
    }

    @classmethod
    def load(cls, path: str) -> "Parameters":
        p = cls()
        with open(path, "r") as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                if not line:
                    continue
                parts = line.split()
                if len(parts) < 2:
                    continue
                key = parts[0].lower()
                if key in cls._KEYS:
                    attr, conv = cls._KEYS[key]
                    setattr(p, attr, conv(parts[1]))
        return p

    def valid(self) -> bool:
        return self.iterations > 0 and self.anderson_m >= 0 and self.time_step >= 0

    def output(self) -> str:
        return (
            f"Iterations {self.iterations}\n"
            f"AndersonM {self.anderson_m}\n"
            f"SquareElasticity {int(self.square_elasticity)}\n"
            f"TimeStep {self.time_step}\n"
        )


@dataclasses.dataclass
class Lame:
    """Material parameters (reference admm_anderson_xzu/src/EnergyTerm.hpp:35-61).

    mu = k/(2(1+v)), lambda = k*v/((1+v)(1-2v)) from Young's modulus k and
    Poisson ratio v; bulk modulus = lambda + (2/3) mu.
    """

    mu: float
    lam: float
    limit_min: float = -100.0
    limit_max: float = 100.0

    @classmethod
    def from_young_poisson(cls, k: float, v: float,
                           limit_min: float = -100.0,
                           limit_max: float = 100.0) -> "Lame":
        return cls(
            mu=k / (2.0 * (1.0 + v)),
            lam=k * v / ((1.0 + v) * (1.0 - 2.0 * v)),
            limit_min=limit_min,
            limit_max=limit_max,
        )

    @classmethod
    def rubber(cls) -> "Lame":
        return cls.from_young_poisson(10000000, 0.499)

    @classmethod
    def soft_rubber(cls) -> "Lame":
        return cls.from_young_poisson(10000000, 0.399)

    @classmethod
    def very_soft_rubber(cls) -> "Lame":
        return cls.from_young_poisson(1000000, 0.299)

    @property
    def bulk_modulus(self) -> float:
        return self.lam + (2.0 / 3.0) * self.mu
