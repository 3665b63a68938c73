"""Per-stage priced-gather budgets for the flagship frame.

On the target TPU the dominant frame cost is dynamic addressing: an XLA
gather is priced per *index* (~7 ns marginal), so one full-resolution
gather costs ~14 ms at 1080p — two orders of magnitude above the fused
elementwise work around it (CLAUDE.md rule 2b).  Round 3's optimization
campaign (packed tap bundles, Pallas dense-select stencils, arithmetic
winner ids, gather-free blue noise) drove each stage down to the counts
pinned here.  This test compiles every stage of the flagship
SSGI+HBAO+MB+TRAA composer and counts `gather` definitions in the
optimized HLO so a regression that re-introduces priced fetches fails
loudly instead of silently costing tens of milliseconds per frame.

Definitions inside `while` bodies (the ray march) count once even
though they execute per trip — the budget pins program shape, not
executed cost; the march trip counts are static config
(`SSGIConfig.steps`/`refine_steps`).

Round 4 moved the bounded per-pixel fetches (temporal history/probe,
HBAO taps, SSGI radiance prewarp) into Pallas window-warp kernels
(ops/pallas/warp.py). On CPU those kernels run in interpret mode, which
inlines as *thousands* of small HLO gathers that the real TPU lowering
never emits — so this test pins the HLO of the GATHER fetch path
(window flags off) and separately asserts the window flags default ON
(test_window_warp_is_production_default). The TPU-side evidence that
the window path holds the measured frame cost is the committed bench
breakdown artifact (BENCH_breakdown_r04.json).
"""

import re

import pytest

import realism_effects_tpu as re_tpu

# Budgets = current measured definition counts (see docstring).  Raise a
# budget ONLY with a measured justification that the added gathers are
# not full-resolution per-pixel fetches (or are worth their ~14 ms/frame
# at 1080p each).
BUDGETS = {
    "raster_shade": 23,
    "ssgi": 28,
    "hbao": 8,
    "motion_blur": 17,
    "traa": 6,
}

# The sweep discretizations (`--trace sweep`, the bench default) replace
# per-pixel priced fetches with whole-frame rolls: motion blur becomes
# fully gather-free; ssgi keeps its non-trace gathers (env/temporal/
# Poisson taps — but note gather *definitions* pin program shape: the
# march's defs sit inside a steps×refine loop and execute ~25×, the
# sweep's all execute once).
SWEEP_BUDGETS = {
    "ssgi": 20,
    "motion_blur": 0,
}


def _stage_hlo_texts(width=96, height=64, sweep=False):
    """Build the flagship composer, capture each stage's compiled HLO
    (gather fetch path — see module docstring)."""
    import jax

    from realism_effects_tpu.ops import ao as ao_mod
    from realism_effects_tpu.ops import ssgi as ssgi_mod
    from realism_effects_tpu.ops import temporal_reproject as tr_mod

    mods = (ao_mod, tr_mod, ssgi_mod)
    olds = [m.USE_WINDOW_WARP for m in mods]
    for m in mods:
        m.USE_WINDOW_WARP = False
    try:
        return _stage_hlo_texts_inner(width, height, sweep)
    finally:
        for m, old in zip(mods, olds):
            m.USE_WINDOW_WARP = old


def test_window_warp_is_production_default():
    """The window-warp fetch paths (whose TPU lowering contains no priced
    gathers at all) are the shipped defaults; the budgets below fence the
    shared gather-path program shape."""
    from realism_effects_tpu.ops import ao as ao_mod
    from realism_effects_tpu.ops import ssgi as ssgi_mod
    from realism_effects_tpu.ops import temporal_reproject as tr_mod

    assert ao_mod.USE_WINDOW_WARP is True
    assert tr_mod.USE_WINDOW_WARP is True
    assert ssgi_mod.USE_WINDOW_WARP is True


def _stage_hlo_texts_inner(width, height, sweep):
    import jax

    scene = re_tpu.Scene()
    scene.environment = re_tpu.build_equirect_env(
        re_tpu.procedural_sky(32, 64))
    scene.add(re_tpu.make_plane(20, re_tpu.Material(
        diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(re_tpu.make_box((1, 1, 1), re_tpu.Material(
        diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(re_tpu.translation(0, 0.5, 0))
    cam = re_tpu.PerspectiveCamera(50, width / height, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    composer = re_tpu.EffectComposer(scene, cam, width, height)
    if sweep:
        composer.add_effect(re_tpu.SSGIEffect(
            trace="sweep", sweep_dirs=8, sweep_steps=8))
    else:
        # the march/taps programs are no longer the shipped defaults
        # (sweep is); pin them explicitly so both discretizations stay
        # fenced
        composer.add_effect(re_tpu.SSGIEffect(trace="march"))
    composer.add_effect(re_tpu.HBAOEffect())
    if sweep:
        composer.add_effect(re_tpu.MotionBlurEffect(
            mode="sweep", sweep_dirs=8, sweep_steps=6))
    else:
        composer.add_effect(re_tpu.MotionBlurEffect(mode="taps"))
    composer.add_effect(re_tpu.TRAAEffect())
    # staged path (per-stage programs), not the fused single dispatch
    composer.fuse_raster = False
    composer.fuse_effects = False

    captured = {}

    def wrap(name, fn):
        def wrapped(*args):
            captured[name] = (fn, args)
            return fn(*args)
        return wrapped

    composer.render(dt=1 / 60)  # builds the stage jits
    composer._raster_stage = wrap("raster_shade", composer._raster_stage)
    composer._effect_stages = [
        wrap(e.name, s)
        for e, s in zip(composer.effects, composer._effect_stages)
    ]
    composer.render(dt=1 / 60)

    return {
        name: fn.lower(*args).compile().as_text()
        for name, (fn, args) in captured.items()
    }


def _gather_defs(hlo_text: str) -> int:
    """Count gather instruction *definitions* (operand mentions excluded)
    anywhere in the module, including fusion and while-body computations."""
    pat = re.compile(r"^\s*(?:ROOT )?\S+ = \S+ gather\(", re.MULTILINE)
    return len(pat.findall(hlo_text))


@pytest.fixture(scope="module")
def stage_hlo():
    return _stage_hlo_texts()


@pytest.mark.parametrize("stage", sorted(BUDGETS))
def test_stage_gather_budget(stage_hlo, stage):
    count = _gather_defs(stage_hlo[stage])
    assert count <= BUDGETS[stage], (
        f"{stage}: {count} gather definitions > budget {BUDGETS[stage]} — "
        "a new priced fetch entered the hot path (each full-res gather is "
        "~14 ms/frame at 1080p on the target TPU; pack it into an existing "
        "bundle, use a Pallas dense-select stencil, or justify + raise the "
        "budget)"
    )


def test_budgets_not_slack(stage_hlo):
    """Budgets track reality: fail when a stage drops well below its
    budget so the pinned numbers ratchet down with the campaign."""
    for stage, budget in BUDGETS.items():
        count = _gather_defs(stage_hlo[stage])
        assert count >= budget - 6, (
            f"{stage}: {count} gather defs is far below budget {budget} — "
            "tighten BUDGETS to lock in the win"
        )


@pytest.fixture(scope="module")
def sweep_stage_hlo():
    return _stage_hlo_texts(sweep=True)


@pytest.mark.parametrize("stage", sorted(SWEEP_BUDGETS))
def test_sweep_stage_gather_budget(sweep_stage_hlo, stage):
    count = _gather_defs(sweep_stage_hlo[stage])
    assert count <= SWEEP_BUDGETS[stage], (
        f"{stage} (sweep mode): {count} gather definitions > budget "
        f"{SWEEP_BUDGETS[stage]} — the roll-sweep path regained a priced "
        "per-pixel fetch"
    )
