"""End-to-end TRAA tests: temporal convergence + reprojection under motion.

Implements SURVEY.md §4's temporal-convergence strategy: with a static
camera, the accumulated effective sample count must grow and the output
must stabilize; with a moving camera, history must follow reprojection
without gross ghosting.
"""

import numpy as np
import pytest

from realism_effects_tpu.composer import EffectComposer
from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.effects.taa import TAAPass
from realism_effects_tpu.effects.traa import TRAAEffect
from realism_effects_tpu.scene.geometry import (
    Material, make_box, make_plane, translation,
)
from realism_effects_tpu.scene.scene import Scene


def _make(width=96, height=96, effect=None):
    scene = Scene()
    scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(make_box((1, 1, 1), Material(diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(translation(0, 0.5, 0))
    cam = PerspectiveCamera(50, width / height, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    composer = EffectComposer(scene, cam, width, height)
    composer.add_effect(effect or TRAAEffect())
    return scene, cam, composer


class TestTRAA:
    def test_static_camera_converges(self):
        _, _, composer = _make()
        frames = [np.asarray(composer.render()) for _ in range(8)]
        # per-frame change must shrink as accumulation builds up
        d_early = np.abs(frames[2] - frames[1]).mean()
        d_late = np.abs(frames[7] - frames[6]).mean()
        assert d_late < d_early * 0.7 or d_late < 1e-4
        # effective sample count grows
        hist = np.asarray(composer.state("traa")["history"])
        assert hist[..., 3].max() > 2.0

    def test_first_frame_is_finite_and_close_to_input(self):
        _, _, composer = _make()
        img = np.asarray(composer.render())
        assert np.isfinite(img).all()
        assert img.min() >= 0.0

    def test_reset_discards_history(self):
        _, _, composer = _make()
        for _ in range(5):
            composer.render()
        alpha_before = np.asarray(composer.state("traa")["history"])[..., 3].max()
        composer.reset()
        composer.render()
        alpha_after = np.asarray(composer.state("traa")["history"])[..., 3].max()
        assert alpha_before > 1.5
        assert alpha_after <= 1.0 + 1e-3  # keepData=0 capped the blend

    def test_moving_camera_no_ghosting(self):
        """Orbit the camera; accumulated output must track the scene.

        With broken reprojection the accumulated image lags the raster,
        giving a large difference against the current-frame render.
        """
        scene, cam, composer = _make(128, 128)
        last = None
        for f in range(10):
            ang = 0.6 + 0.02 * f
            cam.set_position(4 * np.sin(ang), 2.5, 4 * np.cos(ang))
            cam.look_at((0, 0.5, 0))
            last = np.asarray(composer.render())
        # render the same pose without TRAA for reference
        from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer
        from realism_effects_tpu.scene.shading import shade_direct
        cam.clear_view_offset()
        m = cam.matrices()
        gb = rasterize_gbuffer(
            composer._packed, scene.model_matrices(),
            m.projection_view_matrix, 128, 128,
        )
        ref = np.asarray(shade_direct(gb, m, scene.lighting_params()))
        err = np.abs(last - ref).mean()
        assert err < 0.05, f"ghosting: mean err {err}"

    def test_jitter_produces_antialiasing(self):
        """Edge pixels must converge to intermediate coverage values."""
        _, _, composer = _make(96, 96)
        for _ in range(16):
            img = np.asarray(composer.render())
        # find edge of the red box: pixels where accumulated red is partial
        red = img[..., 0] / (img.sum(-1) + 1e-6)
        frac = ((red > 0.4) & (red < 0.58)).sum()
        assert frac > 10  # some blended edge pixels exist


class TestTAA:
    def test_static_accumulation_and_reset_on_move(self):
        scene, cam, composer = _make(effect=TAAPass())
        f0 = np.asarray(composer.render())
        for _ in range(6):
            f = np.asarray(composer.render())
        # accumulated: changes get small
        f_prev = f
        f = np.asarray(composer.render())
        assert np.abs(f - f_prev).mean() < 0.01
        # move the camera -> accumulation resets to raw frame
        cam.set_position(3.5, 2.5, 4)
        cam.look_at((0, 0.5, 0))
        moved = np.asarray(composer.render())
        assert np.isfinite(moved).all()
        assert composer.camera_not_moved_frames == 0
