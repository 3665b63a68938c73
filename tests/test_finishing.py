"""Finishing effects + env conversion + full-stack integration tests."""

import numpy as np
import jax.numpy as jnp

import realism_effects_tpu as re_tpu
from realism_effects_tpu import (
    EffectComposer, GradualBackgroundEffect, HBAOEffect, LensDistortionEffect,
    Material, MotionBlurEffect, PerspectiveCamera, Scene, SharpnessEffect,
    SparkleEffect, SSGIEffect, TRAAEffect, build_equirect_env,
    cube_to_equirect, equirect_to_cube, make_box, make_plane, make_sphere,
    procedural_sky, translation,
)


def _scene():
    scene = Scene()
    scene.environment = build_equirect_env(procedural_sky(32, 64))
    scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(make_box((1, 1, 1), Material(diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(translation(0, 0.5, 0))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    return scene, cam


class TestFinishing:
    def test_sharpness_increases_contrast(self):
        scene, cam = _scene()
        plain = np.asarray(EffectComposer(scene, cam, 96, 96).render())
        c = EffectComposer(scene, cam, 96, 96)
        c.add_effect(SharpnessEffect(sharpness=2.0))
        img = np.asarray(c.render())
        # local gradient magnitude must grow
        g0 = np.abs(np.diff(plain, axis=0)).mean()
        g1 = np.abs(np.diff(img, axis=0)).mean()
        assert g1 > g0
        assert img.min() >= 0.0

    def test_lens_distortion_moves_pixels(self):
        scene, cam = _scene()
        plain = np.asarray(EffectComposer(scene, cam, 96, 96).render())
        # identity parameters -> ~unchanged image
        c0 = EffectComposer(scene, cam, 96, 96)
        c0.add_effect(LensDistortionEffect(alpha_x=0.0, alpha_y=0.0, aberration=0.0))
        ident = np.asarray(c0.render())
        assert np.abs(ident - plain).max() < 1e-3
        # strong distortion -> image changes on structured regions
        c = EffectComposer(scene, cam, 96, 96)
        c.add_effect(LensDistortionEffect(alpha_x=-0.2, alpha_y=-0.2))
        img = np.asarray(c.render())
        assert np.isfinite(img).all()
        assert (np.abs(img - plain).max(-1) > 0.02).mean() > 0.05

    def test_sparkle_only_brightens(self):
        scene, cam = _scene()
        plain = np.asarray(EffectComposer(scene, cam, 96, 96).render())
        c = EffectComposer(scene, cam, 96, 96)
        c.add_effect(SparkleEffect(intensity=2.0))
        img = np.asarray(c.render())
        assert np.isfinite(img).all()
        assert (img >= plain - 1e-5).all()

    def test_gradual_background_fades_distance(self):
        scene, cam = _scene()
        c = EffectComposer(scene, cam, 96, 96)
        c.add_effect(GradualBackgroundEffect((1.0, 0.0, 0.0), max_distance=5.0))
        img = np.asarray(c.render())
        assert np.isfinite(img).all()


class TestEnvConversion:
    def test_cube_equirect_roundtrip(self):
        sky = jnp.asarray(procedural_sky(64, 128, sun_intensity=0.0))
        cube = equirect_to_cube(sky, 64)
        assert cube.shape == (6, 64, 64, 3)
        back = cube_to_equirect(cube, 64, 128)
        # compare away from poles (equirect poles are heavily distorted)
        a = np.asarray(sky)[16:48]
        b = np.asarray(back)[16:48]
        rel = np.abs(a - b) / (np.abs(a) + 1e-3)
        assert np.median(rel) < 0.05


class TestFullStack:
    def test_ssgi_hbao_traa_motionblur_stack(self):
        """The flagship pipeline: all four headline effects chained."""
        scene, cam = _scene()
        c = EffectComposer(scene, cam, 96, 96)
        c.add_effect(SSGIEffect(steps=6, refine_steps=2))
        c.add_effect(HBAOEffect(spp=4, denoise_iterations=1))
        c.add_effect(MotionBlurEffect(samples=8))
        c.add_effect(TRAAEffect())
        for f in range(5):
            ang = 0.6 + 0.01 * f
            cam.set_position(4 * np.sin(ang), 2.5, 4 * np.cos(ang))
            cam.look_at((0, 0.5, 0))
            img = np.asarray(c.render())
        assert np.isfinite(img).all()
        assert img.min() >= 0.0
        assert img.max() > 0.01  # not black

    def test_public_api_surface(self):
        """Reference export parity (src/index.js)."""
        for name in [
            "SSGIEffect", "SSREffect", "TAAPass", "TRAAEffect",
            "MotionBlurEffect", "HBAOEffect", "SharpnessEffect",
            "GradualBackgroundEffect", "SparkleEffect", "LensDistortionEffect",
            "EffectComposer", "Scene", "PerspectiveCamera",
        ]:
            assert hasattr(re_tpu, name), name
