"""Golden-frame regression (SURVEY.md §4(a)).

Renders a small fixed scene with the full effect stack on CPU and
compares against a committed golden frame. Regenerate intentionally with
``RE_TPU_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py``.
"""

import os

import numpy as np

from realism_effects_tpu import (
    EffectComposer, HBAOEffect, Material, MotionBlurEffect,
    PerspectiveCamera, Scene, SSGIEffect, TRAAEffect, build_equirect_env,
    make_box, make_plane, make_sphere, procedural_sky, translation,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_full_stack.npz")


def _render(frames=6, size=96):
    scene = Scene()
    scene.environment = build_equirect_env(procedural_sky(32, 64))
    scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(make_box((1, 1, 1), Material(diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(translation(0, 0.5, 0))
    ball = scene.add(make_sphere(0.5, material=Material(
        diffuse=(0.2, 0.5, 0.9, 1.0), roughness=0.2, metalness=0.8)))
    ball.set_matrix(translation(1.3, 0.5, 0.6))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    c = EffectComposer(scene, cam, size, size)
    c.add_effect(SSGIEffect(steps=8, refine_steps=2))
    c.add_effect(HBAOEffect(spp=4))
    c.add_effect(MotionBlurEffect(samples=8))
    c.add_effect(TRAAEffect())
    img = None
    for _ in range(frames):
        img = np.asarray(c.render(dt=1 / 60))  # pinned dt: deterministic blur
    return img


def test_full_stack_matches_golden():
    img = _render()
    if os.environ.get("RE_TPU_REGEN_GOLDEN") == "1" or not os.path.exists(FIXTURE):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, image=img.astype(np.float16))
        if os.environ.get("RE_TPU_REGEN_GOLDEN") == "1":
            return
    golden = np.load(FIXTURE)["image"].astype(np.float32)
    diff = np.abs(img - golden)
    rmse = float(np.sqrt(np.square(diff).mean()))
    assert rmse < 2e-2, (
        f"golden-frame RMSE {rmse:.4f}; if the change is intentional, "
        "regenerate with RE_TPU_REGEN_GOLDEN=1"
    )
