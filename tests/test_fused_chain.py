"""Fused effect chain == staged stages, across temporal feedback.

`composer.fuse_effects` (default) runs the whole chain as one program;
the math must be identical to the per-effect staged path, including the
multi-frame feedback loops (SSGI radiance, denoiser-B-as-history).
"""

import numpy as np

from realism_effects_tpu import (
    EffectComposer, HBAOEffect, Material, MotionBlurEffect,
    PerspectiveCamera, Scene, SSGIEffect, TRAAEffect, build_equirect_env,
    make_box, make_plane, procedural_sky, translation,
)


def _composer(fused: bool) -> EffectComposer:
    scene = Scene()
    scene.environment = build_equirect_env(procedural_sky(16, 32))
    scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(make_box((1, 1, 1),
                             Material(diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(translation(0, 0.5, 0))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    c = EffectComposer(scene, cam, 64, 64)
    c.add_effect(SSGIEffect(steps=4, refine_steps=2))
    c.add_effect(HBAOEffect(spp=4))
    c.add_effect(MotionBlurEffect())
    c.add_effect(TRAAEffect())
    c.fuse_effects = fused
    return c


def test_fused_equals_staged_over_feedback_frames():
    fused, staged = _composer(True), _composer(False)
    for f in range(4):
        a = np.asarray(fused.render(dt=1 / 60))
        b = np.asarray(staged.render(dt=1 / 60))
        np.testing.assert_allclose(a, b, atol=2e-6,
                                   err_msg=f"frame {f} diverged")
