"""Benchmark: frame time of the flagship post-processing stack.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): full SSGI+HBAO+TRAA+motion-blur stack
at 1080p in < 8 ms/frame on one v5e chip. vs_baseline = baseline_ms /
measured_ms (>1 means faster than target).

MEASUREMENT VALIDITY (r3 + r4 methodology fixes): on this TPU tunnel,
``block_until_ready()`` alone does NOT force execution until the process
has performed at least one device->host readback — before that, frames
are silently queued and "blocked" timings report ~1 ms for work that
really takes seconds (the r3 fix; see CLAUDE.md rule 2). The r4
refinement: once the process IS in synchronous mode, every sync
(readback or block_until_ready) carries a ~29 ms host<->device
round-trip latency floor (measured: a 1-element jitted add times 28.8 ms
per readback-synced call, while 32 back-to-back dispatches of a ~36 ms
kernel + ONE final readback time 35.9 ms/frame — the device was truly
busy, so amortization is honest, not queue-hiding). Per-frame-synced
timing therefore cannot measure anything below ~29 ms and overstates
real frame cost by that constant. The timing loop below renders frames
back-to-back (each frame's state feeds the next, so frames serialize on
device) and reads back ONE scalar per batch: reported ms/frame =
batch wall time / frames. That is the true device throughput — and the
number a production render loop (which never round-trips the host
mid-stream) actually achieves. The per-sync latency floor is measured
and printed to stderr for transparency. Numbers recorded before round 3
understate true cost by orders of magnitude; r3 numbers overstate
per-stage cost by the ~29 ms sync floor.

``--config N`` (1..5) instead runs one of BASELINE.md's staged configs:
  1: VelocityDepthNormal + TRAA at 512x512
  2: HBAO + Poisson denoise (4 iterations) at 1080p, static scene
  3: Motion blur + TRAA, animated orbit at 1080p
  4: SSGI (steps=20/refine=5) + temporal + denoiser at 1080p
  5: full stack + importance sampling, dynamic scene at 4K

``--breakdown`` prints one JSON line per pass (raster+shade, ssgi, hbao,
motion_blur, traa) plus the pipelined total — BASELINE.json's
"ms/frame per pass" metric. Per-pass numbers are measured with a device
sync after each stage, so their sum slightly exceeds the pipelined total.

``--scene sponza`` runs the flagship stack at 1080p on the reference's
262k-triangle Draco-compressed Sponza (real-geometry workload;
combine with ``--breakdown`` for per-pass numbers).

``--trace march|sweep`` picks the discretization of the gather-heavy
kernels (default sweep). "sweep" is the TPU-native direction-binned
roll sweep — for the SSGI trace (`ops/ssgi_sweep.py`) AND the motion
blur line integral (`ops/motion_blur.motion_blur_sweep`): every fetch
is a whole-frame roll instead of a per-pixel priced gather, same
hit/integral law, converges to the reference discretization through
the temporal filter (pinned by `test_ssgi.py::TestSweepTrace` /
`test_motion_blur.py::TestMotionBlurSweep`). "march" is the
reference's exact per-pixel gather formulation (`ssgi.frag:441-503`,
`motion_blur.frag:23-42`) — its executed full-resolution gathers are
priced per index (CLAUDE.md rule 2b) and dominate the frame on this
hardware.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_MS = 8.0
TRACE = "sweep"  # --trace march|sweep (see module docstring)
WIDTH, HEIGHT = 1920, 1080
WARMUP = 2
ITERS = 12       # frames per amortized batch
BATCHES = 4      # batches (one readback each); headline = best batch

# v5e datasheet peaks for the roofline/MFU statement in --json artifacts
PEAK_FLOPS = 197e12   # bf16 MXU peak, FLOP/s
PEAK_HBM = 819e9      # HBM bandwidth, B/s

#: all emitted metric records (mirrored to --json PATH)
_RECORDS: list[dict] = []


def emit(d: dict):
    print(json.dumps(d))
    _RECORDS.append(d)


def _mb():
    """Motion blur effect matching the --trace discretization choice."""
    from realism_effects_tpu import MotionBlurEffect

    return MotionBlurEffect(mode="sweep" if TRACE == "sweep" else "taps")


def _sync(img) -> float:
    """Force execution of everything ``img`` depends on.

    A scalar readback is the only reliable execution barrier on this
    tunnel (see module docstring); returns the scalar so callers can
    sanity-check frames differ."""
    import jax.numpy as jnp

    return float(jnp.max(img))


def sync_floor_ms(samples: int = 6) -> float:
    """Measured per-sync host<->device round-trip latency (~29 ms on the
    axon tunnel): the time to read back a scalar from an array that is
    ALREADY materialized on device, i.e. pure transport, zero compute."""
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.float32) + 1.0
    _sync(x)  # materialize + enter synchronous mode
    times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        _sync(x)
        times.append((time.perf_counter() - t0) * 1000.0)
    return float(np.min(times))


def _measure(composer, animate, warmup=WARMUP, iters=ITERS,
             batches=BATCHES):
    """Best-batch amortized ms/frame (see module docstring).

    Warmup frames each force a readback (entering synchronous mode and
    draining the lazy queue — the r3 fix). Timed batches then render
    ``iters`` frames back-to-back with ONE readback at the end; frames
    serialize on device because each frame consumes the previous frame's
    donated state. Best batch is reported (device program is identical
    every frame, so inter-batch spread is host scheduling noise; the
    median batch is also computed for the breakdown artifact)."""
    for f in range(warmup):
        if animate:
            animate(f)
        _sync(composer.render(dt=1 / 60))
    batch_ms = []
    frame = warmup
    img = None
    for _b in range(batches):
        t0 = time.perf_counter()
        for _k in range(iters):
            if animate:
                animate(frame)
            img = composer.render(dt=1 / 60)
            frame += 1
        _sync(img)
        batch_ms.append((time.perf_counter() - t0) * 1000.0 / iters)
    _measure.last_median = float(np.median(batch_ms))
    return float(np.min(batch_ms))


def _measure_stages(composer, animate, start_frame, iters=ITERS):
    """Best-of-N per-stage ms via the composer's staged path.

    Valid only after _measure (the process is in synchronous mode, so
    the per-stage ``block_until_ready`` calls actually block); the final
    image is still read back each frame as a belt-and-braces barrier.
    Each stage boundary pays the ~29 ms sync latency floor, so the
    measured floor is subtracted from every stage (clamped at 0); the
    raw stage time is floor + value. Per-stage minima are taken
    independently across frames, so the breakdown need not sum to any
    single measured frame (it brackets the pipelined total from above:
    staged execution also loses inter-stage fusion)."""
    floor = sync_floor_ms()
    composer.collect_timings = True
    stage_times: dict[str, list] = {}
    for f in range(iters):
        if animate:
            animate(start_frame + f)
        _sync(composer.render(dt=1 / 60))
        for k, v in composer.last_timings.items():
            stage_times.setdefault(k, []).append(v)
    composer.collect_timings = False
    return {
        k: max(float(np.min(v)) - floor, 0.0) for k, v in stage_times.items()
    }


def build_composer():
    from realism_effects_tpu import (
        EffectComposer, HBAOEffect, Material,
        PerspectiveCamera, Scene, SSGIEffect, TRAAEffect,
        build_equirect_env, make_box, make_plane, make_sphere,
        procedural_sky, translation,
    )

    scene = Scene()
    scene.environment = build_equirect_env(procedural_sky(64, 128))
    scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(make_box((1, 1, 1), Material(diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(translation(0, 0.5, 0))
    sph = scene.add(
        make_sphere(0.6, material=Material(
            diffuse=(0.2, 0.5, 0.9, 1.0), roughness=0.2, metalness=0.8))
    )
    sph.set_matrix(translation(1.5, 0.6, 0.5))
    cam = PerspectiveCamera(50, WIDTH / HEIGHT, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    composer = EffectComposer(scene, cam, WIDTH, HEIGHT)
    # the BASELINE.md flagship stack: SSGI + HBAO + TRAA + motion blur
    composer.add_effect(SSGIEffect(trace=TRACE))
    composer.add_effect(HBAOEffect())
    composer.add_effect(_mb())
    composer.add_effect(TRAAEffect())
    return composer, cam


SPONZA_GLB = ("/root/reference/example/public/gltf/"
              "sponza_no_textures.optimized.glb")


def build_sponza_composer():
    """Flagship stack at 1080p on REAL geometry: the reference's de-facto
    bench scene (`example/main.js:299-302` loads Sponza for `?ao`), a
    262k-triangle Draco-compressed asset decoded by the built-in
    decoder. The raster+shade stage dominates here, unlike the 3-mesh
    procedural scene — this is the representative asset-workload number
    (VERDICT r2 weak #4)."""
    from realism_effects_tpu import (
        EffectComposer, HBAOEffect, PerspectiveCamera,
        SSGIEffect, Scene, TRAAEffect, build_equirect_env, procedural_sky,
    )
    from realism_effects_tpu.scene.gltf import load_gltf_asset

    scene = Scene()
    scene.environment = build_equirect_env(procedural_sky(64, 128))
    asset = load_gltf_asset(SPONZA_GLB)
    for m in asset.meshes:
        scene.add(m)
    scene.sun_intensity = 1.4
    cam = PerspectiveCamera(55, WIDTH / HEIGHT, 0.05, 400)
    cam.set_position(8.0, 2.2, -0.5)
    cam.look_at((-6.0, 3.0, 0.0))
    composer = EffectComposer(scene, cam, WIDTH, HEIGHT)
    composer.add_effect(SSGIEffect(trace=TRACE))
    composer.add_effect(HBAOEffect())
    composer.add_effect(_mb())
    composer.add_effect(TRAAEffect())
    return composer, cam


def _sponza_orbit(cam, f):
    # small pan keeps velocity/motion-blur paths live without leaving
    # the colonnade
    ang = 0.01 * f
    cam.set_position(8.0 - 0.2 * np.sin(ang), 2.2, -0.5 + 0.2 * np.cos(ang))
    cam.look_at((-6.0, 3.0, 0.0))


def run_sponza(breakdown: bool):
    composer, cam = build_sponza_composer()
    animate = lambda f: _sponza_orbit(cam, f)
    total = _measure(composer, animate)
    if breakdown:
        stages = _measure_stages(composer, animate, WARMUP + ITERS)
        for k, ms in stages.items():
            emit({
                "metric": f"pass_ms_sponza_1080p.{k}",
                "value": round(ms, 3),
                "unit": "ms/frame",
                "vs_baseline": round(BASELINE_MS / total, 3),
            })
    emit({
        "metric": "frame_ms_sponza_1080p_full_stack_ssgi_hbao_traa_mb",
        "value": round(total, 3), "unit": "ms/frame",
        "vs_baseline": round(BASELINE_MS / total, 3),
    })


def build_config(n: int):
    from realism_effects_tpu import (
        EffectComposer, HBAOEffect, Material,
        PerspectiveCamera, Scene, SSGIEffect, TRAAEffect,
        build_equirect_env, make_box, make_plane, make_sphere,
        procedural_sky, rotation_y, translation,
    )
    import numpy as _np

    sizes = {1: (512, 512), 2: (1080, 1920), 3: (1080, 1920),
             4: (1080, 1920), 5: (2160, 3840)}
    h, w = sizes[n]
    scene = Scene()
    scene.environment = build_equirect_env(procedural_sky(64, 128))
    if n == 1:
        # BASELINE config 1 prescribes a demo glTF scene: round-trip the
        # procedural fixture through the GLB writer/loader
        import tempfile

        from realism_effects_tpu.scene.gltf import load_gltf, write_glb

        plane = make_plane(24, Material(diffuse=(0.6, 0.6, 0.65, 1.0)))
        box = make_box((1, 1, 1), Material(diffuse=(0.9, 0.3, 0.2, 1.0)))
        box.set_matrix(translation(0, 0.5, 0))
        sph = make_sphere(0.6, material=Material(
            diffuse=(0.2, 0.5, 0.9, 1.0), roughness=0.2, metalness=0.8))
        sph.set_matrix(translation(1.5, 0.6, 0.5))
        path = os.path.join(tempfile.gettempdir(), "re_tpu_bench.glb")
        write_glb([plane, box, sph], path)
        for m in load_gltf(path):
            scene.add(m)
        box = scene.meshes[1]
    else:
        scene.add(make_plane(24, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
        box = scene.add(make_box((1, 1, 1), Material(diffuse=(0.9, 0.3, 0.2, 1.0))))
        box.set_matrix(translation(0, 0.5, 0))
        sph = scene.add(make_sphere(0.6, material=Material(
            diffuse=(0.2, 0.5, 0.9, 1.0), roughness=0.2, metalness=0.8)))
        sph.set_matrix(translation(1.5, 0.6, 0.5))
    cam = PerspectiveCamera(50, w / h, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    composer = EffectComposer(scene, cam, w, h)
    if n == 1:
        composer.add_effect(TRAAEffect())
        animate = None
    elif n == 2:
        composer.add_effect(HBAOEffect(denoise_iterations=4))
        animate = None
    elif n == 3:
        composer.add_effect(_mb())
        composer.add_effect(TRAAEffect())

        def animate(f):
            ang = 0.6 + 0.02 * f
            cam.set_position(4 * np.sin(ang), 2.5, 4 * np.cos(ang))
            cam.look_at((0, 0.5, 0))
    elif n == 4:
        composer.add_effect(SSGIEffect(steps=20, refine_steps=5, trace=TRACE))
        animate = None
    else:
        composer.add_effect(SSGIEffect(trace=TRACE))
        composer.add_effect(HBAOEffect())
        composer.add_effect(_mb())
        composer.add_effect(TRAAEffect())

        def animate(f):
            t = f / 60.0
            box.set_matrix(
                translation(np.sin(t * 2.5) * 1.2, 0.5, 0) @ rotation_y(t * 3)
            )
            ang = 0.6 + 0.01 * f
            cam.set_position(4 * np.sin(ang), 2.5, 4 * np.cos(ang))
            cam.look_at((0, 0.5, 0))
    return composer, animate, f"baseline_config_{n}_{h}p"


def run_config(n: int):
    composer, animate, name = build_config(n)
    ms = _measure(composer, animate)
    emit({
        "metric": name, "value": round(ms, 3), "unit": "ms/frame",
        "median_ms": round(_measure.last_median, 3),
        "vs_baseline": round(BASELINE_MS / ms, 3),
    })


def _orbit(cam, f):
    ang = 0.6 + 0.01 * f
    cam.set_position(4 * np.sin(ang), 2.5, 4 * np.cos(ang))
    cam.look_at((0, 0.5, 0))


def _stage_roofline(composer, stages_ms: dict):
    """Per-stage FLOPs / bytes from XLA's compiled-program cost analysis
    -> MFU and HBM-bandwidth utilization vs the v5e datasheet peaks.

    Captures each staged jit's (fn, args) exactly like
    tests/test_gather_budget.py, then asks the compiled executable for
    its cost analysis. Both utilizations are fractions of peak; for this
    workload (stencil/roll image passes, no big matmuls) the honest
    roofline statement is the HBM number — MFU is structurally tiny."""
    captured = {}

    def wrap(name, fn):
        def wrapped(*args):
            captured[name] = (fn, args)
            return fn(*args)
        return wrapped

    composer._raster_stage = wrap("raster_shade", composer._raster_stage)
    composer._effect_stages = [
        wrap(e.name, s)
        for e, s in zip(composer.effects, composer._effect_stages)
    ]
    composer.render(dt=1 / 60)
    out = {}
    for name, (fn, args) in captured.items():
        try:
            ca = fn.lower(*args).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            byts = float(ca.get("bytes accessed", 0.0))
        except Exception:
            continue
        ms = stages_ms.get(name)
        if not ms:
            continue
        sec = ms / 1e3
        out[name] = {
            "gflops": round(flops / 1e9, 3),
            "gbytes": round(byts / 1e9, 3),
            "mfu": round(flops / sec / PEAK_FLOPS, 6),
            "hbm_util": round(byts / sec / PEAK_HBM, 4),
        }
    return out


def run_breakdown(roofline=False):
    """Per-pass ms at 1080p (BASELINE.json's prescribed metric)."""
    composer, cam = build_composer()
    animate = lambda f: _orbit(cam, f)
    # fused single-dispatch total, then per-stage with a sync per stage
    total = _measure(composer, animate)
    # dual methodology (r4 VERDICT #8): also record the r3-style
    # per-frame-synced number and the measured sync floor, so rounds
    # with different timing methodologies stay comparable
    floor = sync_floor_ms()
    synced = []
    for f in range(8):
        animate(WARMUP + ITERS + f)
        t0 = time.perf_counter()
        _sync(composer.render(dt=1 / 60))
        synced.append((time.perf_counter() - t0) * 1000.0)
    emit({
        "metric": "frame_ms_1080p_per_frame_synced",
        "value": round(float(np.min(synced)), 3),
        "unit": "ms/frame", "sync_floor_ms": round(floor, 2),
        "vs_baseline": round(BASELINE_MS / float(np.min(synced)), 3),
    })
    stages = _measure_stages(composer, animate, WARMUP + ITERS + 8)
    roof = _stage_roofline(composer, stages) if roofline else {}
    for k, ms in stages.items():
        rec = {
            "metric": f"pass_ms_1080p.{k}", "value": round(ms, 3),
            "unit": "ms/frame", "vs_baseline": round(BASELINE_MS / total, 3),
        }
        rec.update(roof.get(k, {}))
        emit(rec)
    emit({
        "metric": "frame_ms_1080p_full_stack_ssgi_hbao_traa_mb",
        "value": round(total, 3), "unit": "ms/frame",
        "median_ms": round(_measure.last_median, 3),
        "vs_baseline": round(BASELINE_MS / total, 3),
    })


def _warn_if_loaded():
    """The frame loop is host-dispatch-bound: concurrent CPU load inflates
    measured times several-fold. Flag it (stderr; stdout stays one JSON
    line for the driver)."""
    import sys
    try:
        load1 = os.getloadavg()[0]
        ncpu = os.cpu_count() or 1
    except OSError:
        return
    if load1 > 0.5 * ncpu:
        print(
            f"[bench] WARNING: 1-min loadavg {load1:.1f} on {ncpu} CPUs — "
            "concurrent load inflates these host-bound timings several-fold; "
            "re-run on an idle machine for comparable numbers.",
            file=sys.stderr,
        )


def main():
    import sys
    global TRACE
    _warn_if_loaded()
    json_path = None
    if "--json" in sys.argv:
        json_path = sys.argv[sys.argv.index("--json") + 1]
    try:
        if "--trace" in sys.argv:
            TRACE = sys.argv[sys.argv.index("--trace") + 1]
            assert TRACE in ("march", "sweep"), TRACE
        if "--config" in sys.argv:
            run_config(int(sys.argv[sys.argv.index("--config") + 1]))
        elif "--scene" in sys.argv:
            scene = sys.argv[sys.argv.index("--scene") + 1]
            if scene != "sponza":
                raise SystemExit(f"unknown bench scene {scene!r}")
            run_sponza("--breakdown" in sys.argv)
        elif "--breakdown" in sys.argv:
            run_breakdown(roofline=json_path is not None)
        else:
            composer, cam = build_composer()
            ms = _measure(composer, lambda f: _orbit(cam, f))
            emit({
                "metric": "frame_ms_1080p_full_stack_ssgi_hbao_traa_mb",
                "value": round(ms, 3),
                "unit": "ms/frame",
                "median_ms": round(_measure.last_median, 3),
                "vs_baseline": round(BASELINE_MS / ms, 3),
            })
    finally:
        if json_path and _RECORDS:
            meta = {"trace": TRACE, "statistic": "best-batch amortized "
                    "(median_ms where present; see module docstring)"}
            try:
                meta["loadavg_1min"] = round(os.getloadavg()[0], 2)
            except OSError:
                pass
            with open(json_path, "w") as f:
                json.dump({"meta": meta, "records": _RECORDS}, f, indent=1)


if __name__ == "__main__":
    main()
