"""Locating the reference data assets (meshes) for the benchmark scenes.

The standard scenes are defined by the data files shipped with the reference
(admm_anderson_hard_zxu/samples/data/, Geometry/Geometry_model/). Resolution
order: $AAADMM_DATA, ./data, the read-only reference mount."""

import os

_CANDIDATES = [
    os.environ.get("AAADMM_DATA", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "data"),
    "/root/reference/admm_anderson_hard_zxu/samples/data",
    "/root/reference/Geometry/Geometry_model",
]


def find_data(relpath: str) -> str:
    for base in _CANDIDATES:
        if not base:
            continue
        p = os.path.join(base, relpath)
        if os.path.exists(p) or os.path.exists(p + ".ele"):
            return p
    raise FileNotFoundError(
        f"data asset '{relpath}' not found; set AAADMM_DATA")
