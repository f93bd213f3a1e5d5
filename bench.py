"""Benchmark driver: the full BASELINE.md scene matrix on the available
accelerator. Prints ONE JSON line:

  {"metric": "suite_geomean_speedup", "value": G, "unit": "x",
   "vs_baseline": G, "platform": "...", "scenes": {...per-scene...}}

Scenes (BASELINE.md / SURVEY.md section 6; C++ OpenMP baselines measured on
this host in BASELINE_local.json):
  beams      xzu,  3 tet beams, 100 iters/step, AA m=5   -> iters/s
  windyflag  zxu,  cloth + wind + strain limits, 100 it  -> iters/s
  plinkohit  zxu,  horse759 on plane+half-sphere, 13 it  -> iters/s
  plinkopony zxu,  horse759 through cylinder pegs, 13 it -> iters/s
  costa2k    ALM planarity (PlanarityOpt), 100 iters     -> solve seconds
  airport3k  ALM planarity, second PQ benchmark mesh     -> solve seconds
  wiremesh   ALM wire mesh (MaleTorso, 230k verts after
             subdivision)                                -> solve seconds

vs_baseline per scene = (our iters/s / C++ iters/s) or (C++ s / our s);
the aggregate is the geometric mean over the scenes that ran AND passed
their quality gate. Each scene runs in its own try/except — one failure
records {"error": ...} for that scene and the suite continues; a TPU
backend that fails to initialize falls back to CPU (recorded in
"platform"). Golden-trajectory parity of every scene is pinned separately
in tests/ and tests_tpu/; the quality gates here are loose sanity bounds
so a fast-but-wrong run can never post a speedup.

Env:
  AAADMM_BENCH_SCENES  comma list (default: all seven)
  AAADMM_PLATFORM      cpu to force CPU (TPU otherwise, via axon)
  AAADMM_DTYPE         float32 (default) | float64
"""

import json
import os
import sys
import time
import traceback

import numpy as np

REF = "/root/reference/Geometry/Geometry_model"

# C++ after-optimization quality anchors (BASELINE_local.json); a bench run
# whose converged errors exceed LOOSE x these must not post a speedup.
_QUALITY_LOOSE = 3.0
_COSTA2K_PLANARITY_MAX = 0.00408527
_AIRPORT3K_PLANARITY_MAX = 0.00281271
_WIREMESH_EDGE_MAX = 0.00212871
_WIREMESH_ANGLE_MAX = 0.142833


def _settings(iters, accel=True, m=5):
    from aa_admm_tpu.core.config import AccelType, Settings
    s = Settings()
    s.admm_iters = iters
    s.verbose = 0
    if accel:
        s.acceleration_type = AccelType.ANDERSON
        s.anderson_m = m
    s.collect_comb_residual = True
    s.dtype = np.dtype(os.environ.get("AAADMM_DTYPE", "float32"))
    return s


def _timed_steps(solver, n_steps, pre=None):
    # Warmup: compile + first device->host fetch (tunneled transports pay a
    # large one-time latency on the first readback; keep it out of timing).
    if pre:
        pre()
    tr = solver.step()
    _ = np.asarray(tr.reset_count)
    solver.flush_traces()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        if pre:
            pre()
        solver.step()
    elapsed = time.perf_counter() - t0
    solver.flush_traces()
    assert solver.step_prim and all(p == p for p in solver.step_prim), \
        "non-finite residuals"
    return elapsed


def _physics_quality(solver, iters):
    """Loose sanity on the last timed step: finite residuals and the primal
    residual dropped within the step (ADMM converging, not diverging)."""
    prim = np.asarray(solver.step_prim[-iters:], np.float64)
    ok = bool(np.all(np.isfinite(prim))
              and (prim[-1] < prim[0] or prim[-1] < 1e-6))
    return ok, {"prim_first": float(prim[0]), "prim_last": float(prim[-1])}


def _prim_ok(prim):
    """Residual-trace health check. NaN entries mark iterations the
    eps-break skipped, so they are legitimate — but the FIRST iterate of
    every frame always runs, and nothing that ran may be non-finite. The
    previous form (`isfinite(prim[~isnan(prim)])`) masked NaNs before the
    check, so an all-NaN (diverged) trace passed vacuously (ADVICE r4)."""
    prim = np.asarray(prim, np.float64)
    first = prim[..., 0]
    return bool(np.all(np.isfinite(first))) and not bool(np.any(np.isinf(prim)))


GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tests", "golden")


def _early_phase_gate(prim, golden_name, rel=1.2e-2):
    """In-bench golden-trajectory gate (VERDICT r3 weak #3): the step-1
    primal residual head must track the unmodified C++ build's
    tests/golden file while the C++ residual is above 1e-2 x initial —
    the same check tests_tpu pins tightly. Bound 1.2e-2 = ~2.5x the
    measured r5 errors (beams 4.6e-3 after the plane-form f32 reorder,
    windyflag 1.0e-3; BENCH_local_r05.json — the prior 5e-3 bound left
    beams only 8% headroom against compiler-version drift). Still fails
    a mis-parameterized solver by orders of magnitude (wrong
    penalty/gravity proven in tests/test_bench_gates.py)."""
    cpp = np.loadtxt(os.path.join(GOLDEN, golden_name))
    prim = np.asarray(prim, np.float64)
    n = min(len(prim), len(cpp))
    ref = cpp[:n, 1]
    mask = ref > 1e-2 * ref[0]
    relerr = float(np.max(np.abs(prim[:n][mask] - ref[mask]) / ref[mask]))
    return relerr < rel, {"golden_head_rel_err": round(relerr, 6)}


def _ensemble_bench(build, iters, n_rep=8, n_frames=10, pin_vel=None):
    """Scenario-ensemble throughput on the single chip (SURVEY section 2.4's
    new-capability row): n_rep scene replicas vmapped over the leading axis
    through the fused multi-frame rollout — ONE dispatch for
    n_rep x n_frames x iters ADMM iterations. Small scenes are dispatch-
    latency-bound (~800 fused iters/s); batching replicas is the designed
    TPU answer (VERDICT r3 #3). Consistency: every replica runs the same
    scene and must land on the single-scene rollout's end state."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from aa_admm_tpu.solver.physics import run_frames

    solver = build(_settings(iters))
    if pin_vel is not None:
        pin_vel = jnp.asarray(pin_vel, solver.settings.dtype)
    system = solver.system
    dt = solver.settings.dtype
    x = jnp.asarray(solver.x, dt)
    v = jnp.asarray(solver.v, dt)
    pp = jnp.asarray(solver.pin_pos, dt)
    xs = jnp.broadcast_to(x, (n_rep,) + x.shape)
    vs = jnp.broadcast_to(v, (n_rep,) + v.shape)
    pps = jnp.broadcast_to(pp, (n_rep,) + pp.shape)

    single = partial(run_frames, n_frames=n_frames, pin_vel=pin_vel)
    ens = jax.jit(jax.vmap(single, in_axes=(None, 0, 0, 0)))
    x1, _, _, tr1 = single(system, x, v, pp)
    xe, _, _, tre = ens(system, xs, vs, pps)          # warm/compile
    np.asarray(xe[0, 0, 0])
    t0 = time.perf_counter()
    xe, _, _, tre = ens(system, xs, vs, pps)
    np.asarray(xe[0, 0, 0])                           # fetch-sync
    elapsed = time.perf_counter() - t0
    rate = n_rep * n_frames * iters / elapsed

    err = float(np.max(np.abs(np.asarray(xe) - np.asarray(x1)[None])))
    prim = np.asarray(tre.prim, np.float64)
    ok = (_prim_ok(prim)
          and err < 1e-4 * max(1.0, float(np.max(np.abs(np.asarray(x1))))))
    return ok, {"ensemble_iters_per_s": round(rate, 3),
                "ensemble_n_rep": n_rep,
                "ensemble_consistency_err": round(err, 8)}


def _endstate_gate(build, golden_name, bound, n_frames=30,
                   cpu_bound=None):
    """30-frame rollout end-state vs the C++ golden final positions (fresh
    solver; reuses the already-warm fused-rollout compile). Contact-heavy
    f32 rollouts drift measurably more on XLA:CPU than on TPU (plinkohit:
    5.1e-3 vs 3.3e-4 — different fusion/FMA contraction order), so the
    CPU-fallback path may carry its own (looser, still tight) bound."""
    import jax
    if cpu_bound is not None and jax.devices()[0].platform == "cpu":
        bound = cpu_bound
    solver = build(_settings(13))
    solver.run(n_frames)
    xref = np.loadtxt(os.path.join(GOLDEN, golden_name)).reshape(-1, 3)
    err = float(np.max(np.linalg.norm(solver.x - xref, axis=1)))
    return err < bound, {"golden_endstate_err": round(err, 6)}


def _maybe_profile(solver, name):
    """AAADMM_PROFILE=<dir>: capture a jax.profiler trace of one fused step
    (SURVEY section 5.1 — per-op TPU timeline; view with xprof/tensorboard)."""
    pdir = os.environ.get("AAADMM_PROFILE")
    if not pdir:
        return
    import jax
    with jax.profiler.trace(os.path.join(pdir, name)):
        solver.step()
        solver.flush_traces()


def _phase_device(solver, iters, pre=None):
    """Trace-derived per-phase split (VERDICT r4 #5): one fused step under
    jax.profiler, device events bucketed into the reference's
    global/local/acceleration RuntimeData phases via the phase_* named
    scopes in solver/physics.py (tools/phase_trace.py). Unlike
    phase_ms_per_iter (host-loop dispatch-sync upper bounds) these are
    device-timeline kernel times."""
    import jax
    if jax.devices()[0].platform == "cpu":
        return {}
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        import phase_trace
        if pre:
            pre()
        return {"phase_ms_per_iter_device":
                phase_trace.device_phase_split(solver, iters)}
    except Exception as e:                       # diagnostic only
        return {"phase_ms_per_iter_device": {"error": str(e)}}


def _phase_breakdown(solver, iters):
    """One instrumented step (per-phase dispatches — RuntimeData::print
    parity, Solver.cpp:551-564). Upper bounds on TPU (each phase pays its
    own dispatch sync), but they localize where a thin margin goes."""
    from aa_admm_tpu.core.timers import RuntimeData
    saved = solver.runtime
    try:
        solver.runtime = RuntimeData()
        solver.step_instrumented()       # warm the per-phase dispatch path
        solver.runtime = RuntimeData()
        solver.step_instrumented()
        r = solver.runtime
        return {"phase_ms_per_iter": {
            "global": round(r.global_ms / iters, 3),
            "local": round(r.local_ms / iters, 3),
            "acceleration": round(r.acceleration_ms / iters, 3),
            "initialization": round(r.initialization_ms, 3)}}
    except Exception as e:                      # diagnostic only
        return {"phase_ms_per_iter": {"error": str(e)}}
    finally:
        solver.runtime = saved


def bench_beams():
    from aa_admm_tpu.apps.beams import build_scene
    s = _settings(100)
    solver, stretch = build_scene(s)
    n_steps = 10
    elapsed = _timed_steps(solver, n_steps,
                           pre=lambda: stretch(s.timestep_s))
    out = {"iters_per_s": round(n_steps * s.admm_iters / elapsed, 3)}
    ok, q = _physics_quality(solver, s.admm_iters)
    out.update(q)
    # Fused rollout with constant-velocity pin motion carried in the scan
    # (run(n, pin_vel) == n x [stretch; step], pinned by tests).
    solver.run(n_steps, pin_vel=stretch.pin_velocity)
    solver.flush_traces()
    t0 = time.perf_counter()
    traces = solver.run(n_steps, pin_vel=stretch.pin_velocity)
    tf = time.perf_counter() - t0
    solver.flush_traces()
    out["iters_per_s_fused"] = round(n_steps * s.admm_iters / tf, 3)
    prim = np.asarray(traces.prim, np.float64)
    ok = ok and _prim_ok(prim)
    out.update(_phase_breakdown(solver, s.admm_iters))
    out.update(_phase_device(solver, s.admm_iters,
                             pre=lambda: stretch(s.timestep_s)))
    _maybe_profile(solver, "beams")
    # Measured time-to-tolerance (combined residual < 1e-5 x initial) with
    # honest chunk-boundary timestamps. The chunked dispatch path compiles
    # separately from the fused scan — warm it with one untimed step first
    # so tt measures solve time, not compilation (VERDICT r2 weak #3).
    solver.settings.trace_chunk = 10
    stretch(s.timestep_s)
    solver.step()
    solver.flush_traces()
    n0 = len(solver.step_comb)
    stretch(s.timestep_s)
    solver.step()
    solver.flush_traces()
    comb = np.asarray(solver.step_comb[n0:])
    t = np.asarray(solver.step_times[n0:]) - solver.step_times[n0 - 1]
    hit = np.nonzero(comb < 1e-5 * comb[0])[0]
    if hit.size:
        out["tt_comb_rel1e-5_ms"] = round(float(t[hit[0]]), 3)
    # Golden-head gate: one fresh non-accelerated step vs the C++ golden
    # (the m=5 bench config has no golden — AA reject schedules amplify f32
    # noise; the no-accel trajectory is the pinned correctness surface).
    g_solver, g_stretch = build_scene(_settings(100, accel=False))
    g_stretch(s.timestep_s)
    gtr = g_solver.step()
    gok, ginfo = _early_phase_gate(np.asarray(gtr.prim),
                                   "beams_step1_residual_no_cpp.txt")
    out.update(ginfo)
    ok = ok and gok
    eok, einfo = _ensemble_bench(lambda st: build_scene(st)[0], s.admm_iters,
                                 pin_vel=stretch.pin_velocity)
    out.update(einfo)
    return out, "beams_iters_per_s", _zxu_value(out), ok and eok


def _zxu_scene(build, iters, n_steps):
    s = _settings(iters)
    solver = build(s)
    elapsed = _timed_steps(solver, n_steps)
    out = {"iters_per_s": round(n_steps * iters / elapsed, 3)}
    ok, q = _physics_quality(solver, iters)
    out.update(q)
    # Fused rollout (PhysicsSolver.run): the TPU-first driver — all
    # n_steps frames in ONE dispatch, paying per-step dispatch/host-sync
    # once. Same simulation work as the C++ step loop (pinned to the
    # stepwise trajectory by tests/test_physics.py); warm the scan-length-
    # specific compile first.
    solver.run(n_steps)
    solver.flush_traces()
    t0 = time.perf_counter()
    traces = solver.run(n_steps)
    tf = time.perf_counter() - t0
    solver.flush_traces()
    out["iters_per_s_fused"] = round(n_steps * iters / tf, 3)
    prim = np.asarray(traces.prim, np.float64)
    ok = ok and _prim_ok(prim)
    out.update(_phase_breakdown(solver, iters))
    out.update(_phase_device(solver, iters))
    _maybe_profile(solver, "zxu")
    return out, ok


def _zxu_value(out):
    return max(out["iters_per_s"], out.get("iters_per_s_fused", 0.0))


def bench_windyflag():
    from aa_admm_tpu.apps.windyflag import build_scene
    out, ok = _zxu_scene(build_scene, 100, 10)
    # Golden-head gate: wind off + no accel (the deterministic C++ config —
    # the reference's wind scatter loop is thread-schedule-dependent).
    g = build_scene(_settings(100, accel=False))
    g.wind = None
    g.initialize(_settings(100, accel=False))
    gtr = g.step()
    gok, ginfo = _early_phase_gate(
        np.asarray(gtr.prim), "windy_nowind_step1_residual_no_cpp.txt")
    out.update(ginfo)
    return out, "windyflag_iters_per_s", _zxu_value(out), ok and gok


def bench_plinkohit():
    from aa_admm_tpu.apps.plinkohit import build_scene
    out, ok = _zxu_scene(build_scene, 13, 30)
    # Bound 2e-3 = ~6x the measured r4 TPU error 3.3e-4 (VERDICT r4 #6;
    # was 1e-1, 300x headroom — a 50x-inflated end state sailed through).
    # CPU fallback: 2e-2 = ~4x the measured CPU-f32 drift 5.1e-3.
    gok, ginfo = _endstate_gate(build_scene,
                                "plinkohit_final_x_30f_m5_cpp.txt", 2e-3,
                                cpu_bound=2e-2)
    out.update(ginfo)
    eok, einfo = _ensemble_bench(build_scene, 13)
    out.update(einfo)
    return out, "plinkohit_iters_per_s", _zxu_value(out), ok and gok and eok


def bench_plinkopony():
    from aa_admm_tpu.apps.plinkopony import build_scene
    out, ok = _zxu_scene(build_scene, 13, 30)
    # Contact events through the peg grid amplify precision differences;
    # f32 drift measured 2.4e-2 on CPU / 3.0e-2 on TPU (BENCH_r04.json).
    # Bound 1e-1 = ~3x measured (VERDICT r4 #6 tightened from 2.5e-1).
    gok, ginfo = _endstate_gate(build_scene,
                                "plinkopony_final_x_30f_m5_cpp.txt", 1e-1)
    out.update(ginfo)
    return out, "plinkopony_iters_per_s", _zxu_value(out), ok and gok


def _planarity_scene(name, planarity_max_cpp):
    from aa_admm_tpu.apps.planarity_opt import (check_planarity_error,
                                                optimize_mesh)
    from aa_admm_tpu.core.meshio import load_obj, load_obj_poly
    from aa_admm_tpu.core.polymesh import PolyMesh
    verts, faces = load_obj_poly(
        f"{REF}/PQMeshData/polymesh/{name}_poly.obj")
    mesh = PolyMesh(verts=verts, faces=faces)
    ref = load_obj(f"{REF}/PQMeshData/trimesh/{name}_tri.obj")
    dtype = np.dtype(os.environ.get("AAADMM_DTYPE", "float32"))
    solver = optimize_mesh(mesh, ref.verts, ref.faces, 100, 5, dtype=dtype)
    solve_s = solver.elapsed_time[-1] if solver.elapsed_time else float("inf")
    pl_after, _ = check_planarity_error(mesh, solver.get_solution())
    pl_max = float(np.max(pl_after))
    ok = pl_max <= _QUALITY_LOOSE * planarity_max_cpp
    return ({"solve_s": round(float(solve_s), 3),
             "planarity_err_max": pl_max,
             "planarity_err_max_cpp": planarity_max_cpp},
            f"{name}_planarity_100iters_s", float(solve_s), ok)


def bench_costa2k():
    return _planarity_scene("costa2k", _COSTA2K_PLANARITY_MAX)


def bench_airport3k():
    return _planarity_scene("airport3k", _AIRPORT3K_PLANARITY_MAX)


def bench_wiremesh():
    from aa_admm_tpu.apps import wire_mesh_opt as w
    import tempfile
    opts = os.path.join(tempfile.gettempdir(), "bench_wire_opts.txt")
    with open(opts, "w") as f:
        f.write("Iterations 100\nAndersonM 5\nPenalty 1000\n")
    dtype = np.dtype(os.environ.get("AAADMM_DTYPE", "float32"))
    # Chunked dispatch: a single multi-minute TPU dispatch can exceed the
    # tunnel's execution window (CLAUDE.md) — at ~3s/iteration (round 2)
    # a 25-iter chunk did exactly that. 8-iter chunks (~3.5s at the
    # current ~0.42s/iter) stay well inside it, give measured residual
    # timestamps for the tt metric, and halve the ~75ms-per-boundary
    # fetch+redispatch cost vs 4-iter chunks.
    chunk = int(os.environ.get("AAADMM_WIRE_CHUNK", "8"))
    solver = w.main([f"{REF}/WireMeshData/MaleTorso.obj",
                     f"{REF}/WireMeshData/MaleTorso_target.obj",
                     opts, os.path.join(tempfile.gettempdir(),
                                        "bench_wire_out.obj")],
                    dtype=dtype, return_solver=True, chunk_iters=chunk)
    solve_s = solver.elapsed_time[-1] if solver.elapsed_time else float("inf")
    out = {"solve_s": round(float(solve_s), 3)}
    out.update({k: round(v, 8) for k, v in solver.after_metrics.items()})
    ok = (out["edge_err_max"] <= _QUALITY_LOOSE * _WIREMESH_EDGE_MAX
          and out["angle_err_max"] <= _QUALITY_LOOSE * _WIREMESH_ANGLE_MAX)
    # Measured time-to-tolerance: first iteration whose combined residual is
    # < 1e-3 x the first accepted one (the C++ run reaches ~1.2e-4 total in
    # 100 iters, hitting 1e-3 at iter 37 / 54.8s — golden trajectory),
    # timestamped at the *measured* chunk boundary containing it
    # (within-chunk times are interpolated; the boundary is a real
    # wall-clock reading -> conservative upper bound).
    fv = np.asarray(solver.function_values, np.float64)
    tms = np.asarray(solver.elapsed_time, np.float64)
    if fv.size:
        hit = np.nonzero(fv < 1e-3 * fv[0])[0]
        if hit.size:
            bidx = min(((int(hit[0]) // chunk) + 1) * chunk, fv.size) - 1
            out["tt_comb_rel1e-3_s"] = round(float(tms[bidx]), 3)
            out["tt_comb_rel1e-3_s_cpp"] = 54.78
    return out, "maletorso_wiremesh_100iters_s", float(solve_s), ok


SCENES = {
    "beams": bench_beams,
    "windyflag": bench_windyflag,
    "plinkohit": bench_plinkohit,
    "plinkopony": bench_plinkopony,
    "costa2k": bench_costa2k,
    "airport3k": bench_airport3k,
    "wiremesh": bench_wiremesh,
}

# baseline keys measured in seconds: speedup = baseline / ours
_TIME_METRICS = {"costa2k_planarity_100iters_s",
                 "airport3k_planarity_100iters_s",
                 "maletorso_wiremesh_100iters_s"}


def _init_platform():
    """Select the accelerator, falling back to CPU if the TPU backend fails
    to initialize (e.g. a tunnel outage — VERDICT r2: a transient axon
    failure must degrade the run, not zero it)."""
    import jax
    forced = os.environ.get("AAADMM_PLATFORM")
    if forced:
        # The axon plugin force-selects its platform; override at the
        # config level, not via JAX_PLATFORMS.
        jax.config.update("jax_platforms", forced)
        return jax.devices()[0].platform
    try:
        return jax.devices()[0].platform
    except Exception as e:
        print(f"# accelerator init failed ({e!r}); falling back to CPU",
              file=sys.stderr, flush=True)
        jax.config.update("jax_platforms", "cpu")
        return jax.devices()[0].platform


def main():
    os.environ.setdefault("AAADMM_DTYPE", "float32")
    platform = _init_platform()

    wanted = os.environ.get("AAADMM_BENCH_SCENES")
    names = ([n.strip() for n in wanted.split(",") if n.strip()]
             if wanted else list(SCENES))

    base_path = os.path.join(os.path.dirname(__file__),
                             "BASELINE_local.json")
    base = {}
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)

    import contextlib
    scenes, speedups = {}, []
    for name in names:
        try:
            # Library narration (solver prints) must not pollute the
            # one-JSON-line stdout contract.
            with contextlib.redirect_stdout(sys.stderr):
                out, key, value, quality_ok = SCENES[name]()
            out["quality_ok"] = quality_ok
            ref = base.get(key)
            if ref:
                ratio = (ref / value) if key in _TIME_METRICS \
                    else (value / ref)
                out["vs_baseline"] = round(ratio, 3)
                if quality_ok:
                    speedups.append(ratio)
        except Exception:
            tb = traceback.format_exc(limit=20)
            print(tb, file=sys.stderr, flush=True)
            out = {"error": tb.strip().splitlines()[-1]}
        scenes[name] = out
        print(f"# {name}: {out}", file=sys.stderr, flush=True)

    geomean = (float(np.exp(np.mean(np.log(speedups))))
               if speedups else 0.0)
    print(json.dumps({
        "metric": "suite_geomean_speedup",
        "value": round(geomean, 3),
        "unit": "x_vs_cpp",
        "vs_baseline": round(geomean, 3),
        "platform": platform,
        "dtype": os.environ["AAADMM_DTYPE"],
        "n_scenes_ok": len(speedups),
        "scenes": scenes,
    }))


if __name__ == "__main__":
    sys.exit(main())
