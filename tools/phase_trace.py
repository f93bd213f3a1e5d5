"""Device-true per-phase timing for the physics scenes (VERDICT r4 #5).

Captures a jax.profiler trace of ONE fused step of a scene, parses the
xplane device timeline, and buckets every leaf device op ("XLA Ops" line)
into the reference's RuntimeData phases (global / local / acceleration,
Solver.cpp:551-564). The mapping comes from the compiled module's own
metadata: solver/physics.py wraps the phase regions in
``jax.named_scope("phase_*")``, which lands in each HLO instruction's
``op_name`` — the trace events carry only instruction names, so the
compiled HLO text supplies instruction -> phase.

Caveats (honest accounting): fusions are attributed by their
representative op's scope; control-flow containers (the scan while,
conditionals) are skipped — their bodies appear as separately-tagged leaf
events; async copies are excluded (overlapped). Bucket sums match the
module wall time to ~2% (beams: 43.7 vs 44.8 ms).

Usage:
  python tools/phase_trace.py beams|windyflag|plinkohit|plinkopony [--debug]
"""

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PHASES = ("phase_global", "phase_local", "phase_acceleration")


def _load_xspace(root):
    from _xplane import load_xplane_pb2
    xplane_pb2 = load_xplane_pb2()
    paths = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise RuntimeError(f"no .xplane.pb under {root}")
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


_HLO_LINE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s.*metadata=\{[^}]*op_name=\"([^\"]*)\"")


def hlo_phase_map(hlo_text):
    """instruction name -> phase (or None), from compiled-HLO metadata."""
    out = {}
    for line in hlo_text.splitlines():
        m = _HLO_LINE.match(line)
        if not m:
            continue
        name, op = m.group(1), m.group(2)
        phase = next((p for p in PHASES if p in op), None)
        out[name] = phase
    return out


def phase_split_from_trace(root, name_to_phase, debug=False):
    """Bucket the 'XLA Ops' leaf events of the device plane by phase.
    Returns {phase: ms, 'other': ms, 'unmapped': ms, 'module_ms': ms}."""
    xs = _load_xspace(root)
    out = {p: 0.0 for p in PHASES}
    out["other"] = 0.0
    out["unmapped"] = 0.0
    module_ms = 0.0
    # Control-flow containers (the scan while, conditionals) are skipped
    # entirely: their body ops appear as separate leaf events that already
    # carry the right phase tags (the named_scope wraps the whole cond,
    # so branch bodies inherit it) — counting the container too double
    # counts (measured +20% vs module time).
    container = re.compile(r"^(while|conditional)\.")
    for plane in xs.planes:
        if "TPU" not in (plane.name or ""):
            continue
        ev_meta = dict(plane.event_metadata.items())
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ms += sum(ev.duration_ps for ev in line.events) / 1e9
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                ename = meta.name if meta is not None else ""
                instr = ename.split(" = ")[0].lstrip("%").strip()
                ms = ev.duration_ps / 1e9
                phase = name_to_phase.get(instr, "<missing>")
                if container.match(instr):
                    continue
                if phase in PHASES:
                    out[phase] += ms
                elif phase == "<missing>":
                    out["unmapped"] += ms
                else:
                    out["other"] += ms
                if debug and ms > 0.2:
                    print(f"  [{ms:9.3f} ms] {phase} {instr}")
    out["module_ms"] = module_ms
    return out


def device_phase_split(solver, iters):
    """Compile + trace one fused step of an already-built PhysicsSolver and
    return the per-phase device split (used by bench.py's
    phase_ms_per_iter_device)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from aa_admm_tpu.solver.physics import step_xzu, step_zxu

    dt = solver.settings.dtype
    fn = step_xzu if solver.order.value == "xzu" else step_zxu
    args = (solver.system, jnp.asarray(solver.x, dt),
            jnp.asarray(solver.v, dt), jnp.asarray(solver.pin_pos, dt))
    compiled = jax.jit(fn).lower(*args).compile()
    nmap = hlo_phase_map(compiled.as_text())
    out = compiled(*args)
    jax.device_get(jnp.sum(out[0]))
    root = tempfile.mkdtemp(prefix="phase_bench_")
    with jax.profiler.trace(root):
        out = compiled(*args)
        jax.device_get(jnp.sum(out[0]))
    s = phase_split_from_trace(root, nmap)
    return {"global": round(s["phase_global"] / iters, 4),
            "local": round(s["phase_local"] / iters, 4),
            "acceleration": round(s["phase_acceleration"] / iters, 4),
            "other": round((s["other"] + s["unmapped"]) / iters, 4),
            "device_step_ms": round(s["module_ms"], 3)}


def run_scene(scene):
    """Build the scene, compile ONE fused step, trace it, and return
    (trace_dir, iters, name->phase map)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aa_admm_tpu.core.config import AccelType, Settings
    from aa_admm_tpu.solver.physics import step_xzu, step_zxu

    s = Settings()
    s.verbose = 0
    s.acceleration_type = AccelType.ANDERSON
    s.anderson_m = 5
    s.dtype = np.dtype("float32")
    s.collect_comb_residual = True
    if scene == "beams":
        s.admm_iters = 100
        from aa_admm_tpu.apps.beams import build_scene
        solver, stretch = build_scene(s)
        stretch(s.timestep_s)
    else:
        s.admm_iters = 100 if scene == "windyflag" else 13
        mod = __import__(f"aa_admm_tpu.apps.{scene}",
                         fromlist=["build_scene"])
        solver = mod.build_scene(s)
    fn = step_xzu if solver.order.value == "xzu" else step_zxu
    args = (solver.system, jnp.asarray(solver.x, s.dtype),
            jnp.asarray(solver.v, s.dtype),
            jnp.asarray(solver.pin_pos, s.dtype))
    compiled = jax.jit(fn).lower(*args).compile()
    nmap = hlo_phase_map(compiled.as_text())
    out = compiled(*args)
    jax.device_get(jnp.sum(out[0]))            # warm + first fetch
    import tempfile
    root = tempfile.mkdtemp(prefix=f"phase_{scene}_")
    with jax.profiler.trace(root):
        out = compiled(*args)
        jax.device_get(jnp.sum(out[0]))
    return root, s.admm_iters, nmap


if __name__ == "__main__":
    scene = sys.argv[1]
    debug = "--debug" in sys.argv
    root, iters, nmap = run_scene(scene)
    n_tagged = sum(1 for v in nmap.values() if v)
    print(f"{scene}: trace {root}; {len(nmap)} instrs, {n_tagged} tagged")
    split = phase_split_from_trace(root, nmap, debug=debug)
    for k, v in split.items():
        per = f"  ({v/iters:.4f} ms/iter)" if k != "module_ms" else ""
        print(f"  {k:20s} {v:9.3f} ms{per}")
