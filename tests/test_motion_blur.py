"""Motion blur tests (K12)."""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.composer import EffectComposer
from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.effects.motion_blur import MotionBlurEffect
from realism_effects_tpu.ops.motion_blur import motion_blur
from realism_effects_tpu.scene.geometry import Material, make_box, make_plane, translation
from realism_effects_tpu.scene.scene import Scene


class TestMotionBlurOp:
    def test_static_pixels_untouched(self):
        rng = np.random.default_rng(0)
        color = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
        vel = jnp.zeros((32, 32, 2), jnp.float32)
        out = motion_blur(color, vel, jnp.int32(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(color), atol=1e-6)

    def test_moving_pixels_blur_along_velocity(self):
        # vertical stripe pattern + horizontal velocity -> stripes smear
        color = np.zeros((64, 64, 3), np.float32)
        color[:, ::8] = 1.0
        vel = np.zeros((64, 64, 2), np.float32)
        vel[..., 0] = 0.1  # uv units along x
        out = np.asarray(
            motion_blur(jnp.asarray(color), jnp.asarray(vel), jnp.int32(0),
                        delta_time=1.0 / 100.0)
        )
        # blurred: peaks collapse, energy smears across formerly-black pixels
        assert out.max() < 0.9
        interior = out[:, 2:-2, 0]
        assert (interior > 0.02).mean() > 0.5
        assert abs(interior.mean() - 1.0 / 8.0) < 0.05  # energy ~preserved

    def test_blur_length_scales_with_delta_time(self):
        color = np.zeros((64, 64, 3), np.float32)
        color[:, 32] = 1.0
        vel = np.full((64, 64, 2), 0.0, np.float32)
        vel[..., 0] = 0.05
        slow = np.asarray(motion_blur(jnp.asarray(color), jnp.asarray(vel),
                                      jnp.int32(0), delta_time=1.0 / 30.0))
        fast = np.asarray(motion_blur(jnp.asarray(color), jnp.asarray(vel),
                                      jnp.int32(0), delta_time=1.0 / 240.0))
        # higher fps (smaller dt) -> larger frameSpeed -> longer smear
        assert (fast[32] > 0.01).sum() > (slow[32] > 0.01).sum()


class TestMotionBlurEffect:
    def test_in_composer_with_moving_object(self):
        scene = Scene()
        scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.6, 1.0))))
        box = scene.add(make_box((1, 1, 1), Material(diffuse=(1.0, 0.2, 0.1, 1.0))))
        box.set_matrix(translation(0, 0.5, 0))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 2.0, 5)
        cam.look_at((0, 0.5, 0))
        composer = EffectComposer(scene, cam, 96, 96)
        composer.add_effect(MotionBlurEffect())
        composer.render(dt=1 / 60)
        box.set_matrix(translation(0.6, 0.5, 0))
        img = np.asarray(composer.render(dt=1 / 60))
        assert np.isfinite(img).all()

        # reference: same pose rendered with zero velocity (no motion)
        sharp = EffectComposer(scene, cam, 96, 96)
        sharp.add_effect(MotionBlurEffect())
        sharp.render(dt=1 / 60)  # commits transforms; next frame is static
        simg = np.asarray(sharp.render(dt=1 / 60))

        # the moving box must smear: many pixels differ from the sharp render
        diff = np.abs(img - simg).max(-1)
        assert (diff > 0.05).sum() > 50

    def test_composer_routes_measured_dt(self):
        """The composer feeds real per-frame dt into the blur uniform
        (`MotionBlurEffect.js:87-89`): a slower frame (larger dt) lowers
        frameSpeed, shortening the smear for the same object motion."""

        def render_pair(dt):
            scene = Scene()
            scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.6, 1.0))))
            box = scene.add(
                make_box((1, 1, 1), Material(diffuse=(1.0, 0.2, 0.1, 1.0))))
            box.set_matrix(translation(0, 0.5, 0))
            cam = PerspectiveCamera(50, 1, 0.1, 100)
            cam.set_position(0, 2.0, 5)
            cam.look_at((0, 0.5, 0))
            composer = EffectComposer(scene, cam, 96, 96)
            eff = MotionBlurEffect()
            composer.add_effect(eff)
            composer.render(dt=dt)
            box.set_matrix(translation(0.6, 0.5, 0))
            img = np.asarray(composer.render(dt=dt))
            assert eff.delta_time == max(1e-3, dt)
            return img

        img_fast = render_pair(1 / 240)   # high fps -> long smear
        img_slow = render_pair(1 / 15)    # low fps -> short smear
        assert not np.allclose(img_fast, img_slow)

        # dt below the reference clamp behaves exactly like dt = 1 ms
        img_clamped = render_pair(1e-5)
        img_1ms = render_pair(1e-3)
        np.testing.assert_allclose(img_clamped, img_1ms, atol=1e-6)
