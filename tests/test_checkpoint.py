"""Checkpoint/resume of the temporal state pytree."""

import numpy as np

from realism_effects_tpu import (
    EffectComposer, Material, PerspectiveCamera, Scene, TRAAEffect,
    make_box, make_plane, translation,
)


def _composer():
    scene = Scene()
    scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(make_box((1, 1, 1), Material(diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(translation(0, 0.5, 0))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    c = EffectComposer(scene, cam, 64, 64)
    c.add_effect(TRAAEffect())
    return c


def test_save_load_resumes_accumulation(tmp_path):
    c1 = _composer()
    for _ in range(6):
        c1.render()
    path = str(tmp_path / "ckpt.npz")
    c1.save_state(path)
    ref = np.asarray(c1.render())
    alpha_ref = np.asarray(c1.state("traa")["history"])[..., 3].max()

    # fresh composer, same stack: resume and render the same next frame
    c2 = _composer()
    c2.render()  # build stages/state
    c2.load_state(path)
    assert c2.frame == 6
    out = np.asarray(c2.render())
    alpha2 = np.asarray(c2.state("traa")["history"])[..., 3].max()
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert abs(alpha2 - alpha_ref) < 1e-3
    # accumulation continued (not reset): effective sample count > 2
    assert alpha2 > 2.0
