"""Post-FX companions: ACES tone mapping, bloom, vignette, 3D LUT.

The reference demo stacks these postprocessing-package effects around
realism-effects (`/root/reference/example/main.js:465-476,510-539`).
"""

import os

import numpy as np
import pytest

from realism_effects_tpu import (
    BloomEffect, EffectComposer, LUT3DEffect, Material, PerspectiveCamera,
    Scene, SSGIEffect, ToneMappingEffect, TRAAEffect, VignetteEffect,
    build_equirect_env, load_lut_3dl, make_box, make_plane, procedural_sky,
    translation,
)
from realism_effects_tpu.effects.postfx import aces_filmic

REF_LUT = "/root/reference/example/public/lut_v2.3dl"


def _scene(emissive=False):
    scene = Scene()
    scene.environment = build_equirect_env(procedural_sky(32, 64))
    scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
    mat = (Material(diffuse=(1, 1, 1, 1), emissive=(30.0, 25.0, 18.0))
           if emissive else Material(diffuse=(0.9, 0.3, 0.2, 1.0)))
    box = scene.add(make_box((1, 1, 1), mat))
    box.set_matrix(translation(0, 0.5, 0))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    return scene, cam


class TestAcesFilmic:
    def test_range_and_monotonic(self):
        x = np.linspace(0.0, 20.0, 64, dtype=np.float32)
        gray = np.stack([x, x, x], -1)[None]
        out = np.asarray(aces_filmic(gray))
        assert out.min() >= 0.0 and out.max() <= 1.0
        lum = out[0, :, 0]
        assert (np.diff(lum) >= -1e-6).all()      # monotone
        assert lum[0] < 1e-4                       # black stays black
        assert lum[-1] > 0.95                      # highlights roll to white

    def test_exposure_brightens(self):
        c = np.full((4, 4, 3), 0.18, np.float32)
        lo = np.asarray(aces_filmic(c, exposure=0.5))
        hi = np.asarray(aces_filmic(c, exposure=2.0))
        assert (hi > lo).all()


class TestVignette:
    def test_darkens_corners_not_center(self):
        scene, cam = _scene()
        plain = np.asarray(EffectComposer(scene, cam, 96, 96).render())
        c = EffectComposer(scene, cam, 96, 96)
        c.add_effect(VignetteEffect(offset=0.3, darkness=0.8))
        img = np.asarray(c.render())
        assert np.allclose(img[44:52, 44:52], plain[44:52, 44:52], atol=1e-3)
        assert img[:6, :6].mean() < plain[:6, :6].mean() * 0.6


class TestBloom:
    def test_bright_emitter_spreads_light(self):
        scene, cam = _scene(emissive=True)
        plain = np.asarray(EffectComposer(scene, cam, 96, 96).render())
        c = EffectComposer(scene, cam, 96, 96)
        c.add_effect(BloomEffect(intensity=1.0, luminance_threshold=0.75))
        img = np.asarray(c.render())
        assert (img >= plain - 1e-5).all()       # additive only
        # pixels that were dark near the emitter gain energy
        gained = (img - plain).max(-1)
        assert (gained[plain.max(-1) < 0.3] > 0.01).any()

    def test_dark_scene_unchanged(self):
        dark = np.full((64, 64, 3), 0.2, np.float32)
        eff = BloomEffect(luminance_threshold=0.75)

        class Ctx:
            params = {"bloom": eff.uniforms()}

        out, _ = eff.apply(Ctx, dark, {})
        assert np.allclose(np.asarray(out), dark, atol=1e-6)


class TestLUT3D:
    def test_identity_ramp_lut_is_identity(self):
        s = 8
        r, g, b = np.meshgrid(*[np.arange(s) / (s - 1)] * 3, indexing="ij")
        lut = np.stack([r, g, b], -1).astype(np.float32)
        eff = LUT3DEffect(lut)
        rng = np.random.default_rng(2)
        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)

        class Ctx:
            params = {}

        out, _ = eff.apply(Ctx, img, {})
        assert np.allclose(np.asarray(out), img, atol=1e-5)

    @pytest.mark.skipif(not os.path.exists(REF_LUT),
                        reason="reference absent")
    def test_reference_lut_loads_and_grades(self):
        lut = load_lut_3dl(REF_LUT)
        assert lut.shape == (32, 32, 32, 3)
        assert lut.min() >= 0.0 and lut.max() <= 1.5
        # black maps near black, white near white (a grading LUT, not a
        # degenerate one)
        assert np.linalg.norm(lut[0, 0, 0]) < 0.2
        assert np.linalg.norm(lut[-1, -1, -1] - 1.0) < 0.3
        eff = LUT3DEffect(lut)
        rng = np.random.default_rng(3)
        img = rng.uniform(size=(8, 8, 3)).astype(np.float32)

        class Ctx:
            params = {}

        out, _ = eff.apply(Ctx, img, {})
        out = np.asarray(out)
        assert np.isfinite(out).all()
        assert not np.allclose(out, img)  # it actually grades


class TestFullReferenceStack:
    def test_reference_demo_stack_end_to_end(self):
        """ssgi -> tonemap -> traa -> sharpness -> vignette -> bloom ->
        lut: the reference's complete pass ordering renders finite
        display-ready frames (`main.js:510-539`)."""
        from realism_effects_tpu import SharpnessEffect

        scene, cam = _scene()
        c = EffectComposer(scene, cam, 64, 64)
        c.add_effect(SSGIEffect(steps=4, refine_steps=2))
        c.add_effect(ToneMappingEffect())
        c.add_effect(TRAAEffect())
        c.add_effect(SharpnessEffect(0.75))
        c.add_effect(VignetteEffect())
        c.add_effect(BloomEffect())
        if os.path.exists(REF_LUT):
            c.add_effect(LUT3DEffect(load_lut_3dl(REF_LUT)))
        img = None
        for _ in range(3):
            img = np.asarray(c.render())
        assert np.isfinite(img).all()
        assert img.min() >= 0.0
        assert img.std() > 0.01  # a real image, not a constant
