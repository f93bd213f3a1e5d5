"""Aggregate a phase_trace run into top-instructions-by-total-ms.

Like tools/phase_trace.py --debug, but aggregates every leaf device op by
instruction name (a 13-iteration scan repeats each body op 13x, so no
single event crosses the old 0.2 ms print threshold) and prints the top-N
with full op_name scope paths from the compiled HLO metadata, so the
"other" bucket can be attributed.

Usage: python tools/top_ops.py <scene> [N]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from phase_trace import _load_xspace, PHASES  # noqa: E402

_HLO_LINE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s.*metadata=\{[^}]*op_name=\"([^\"]*)\"")


def hlo_opname_map(hlo_text):
    out = {}
    for line in hlo_text.splitlines():
        m = _HLO_LINE.match(line)
        if m:
            out[m.group(1)] = m.group(2)
    return out


def run_scene_full(scene):
    import tempfile

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
        mod = __import__(f"aa_admm_tpu.apps.{scene}", fromlist=["build_scene"])
        solver = mod.build_scene(s)
    fn = step_xzu if solver.order.value == "xzu" else step_zxu
    args = (solver.system, jnp.asarray(solver.x, s.dtype),
            jnp.asarray(solver.v, s.dtype),
            jnp.asarray(solver.pin_pos, s.dtype))
    compiled = jax.jit(fn).lower(*args).compile()
    opmap = hlo_opname_map(compiled.as_text())
    out = compiled(*args)
    jax.device_get(jnp.sum(out[0]))
    root = tempfile.mkdtemp(prefix=f"topops_{scene}_")
    with jax.profiler.trace(root):
        out = compiled(*args)
        jax.device_get(jnp.sum(out[0]))
    return root, s.admm_iters, opmap


def main():
    scene = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    root, iters, opmap = run_scene_full(scene)
    xs = _load_xspace(root)
    agg = {}  # instr -> [total_ms, count]
    container = re.compile(r"^(while|conditional)\.")
    for plane in xs.planes:
        if "TPU" not in (plane.name or ""):
            continue
        ev_meta = dict(plane.event_metadata.items())
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                ename = meta.name if meta is not None else ""
                instr = ename.split(" = ")[0].lstrip("%").strip()
                if container.match(instr):
                    continue
                a = agg.setdefault(instr, [0.0, 0])
                a[0] += ev.duration_ps / 1e9
                a[1] += 1
    total = sum(v[0] for v in agg.values())
    print(f"{scene}: {len(agg)} distinct leaf instrs, {total:.2f} ms total "
          f"({total/iters:.4f} ms/iter); top {topn}:")
    for instr, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:topn]:
        op = opmap.get(instr, "<?>")
        phase = next((p for p in PHASES if p in op), "other")
        print(f"  {ms:8.3f} ms x{n:4d}  [{phase[6:]:13s}] {instr:28s} {op[:110]}")


if __name__ == "__main__":
    main()
