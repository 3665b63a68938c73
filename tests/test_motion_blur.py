"""Motion blur tests (K12)."""

import numpy as np
import jax
import jax.numpy as jnp

from realism_effects_tpu.composer import EffectComposer
from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.effects.motion_blur import MotionBlurEffect
from realism_effects_tpu.ops.motion_blur import motion_blur, motion_blur_sweep
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


class TestMotionBlurSweep:
    """The gather-free roll-sweep discretization of the same line
    integral (`ops/motion_blur.motion_blur_sweep`): one whole-frame
    roll per (direction, radius) cell instead of per-pixel priced
    taps.  Pins agreement with the reference discretization
    (`motion_blur.frag:23-42` via `motion_blur`)."""

    def test_static_pixels_untouched(self):
        rng = np.random.default_rng(0)
        color = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
        vel = jnp.zeros((32, 32, 2), jnp.float32)
        out = motion_blur_sweep(color, vel, jnp.int32(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(color),
                                   atol=1e-6)

    def test_extent_and_energy_match_taps(self):
        """An impulse column smeared horizontally: the sweep's frame-
        averaged smear must match the taps kernel's extent within one
        pixel and its energy within 10% across the dt range (dt sets
        frameSpeed and therefore blur length, `MotionBlurEffect.js:87`).
        """
        c = np.zeros((64, 64, 3), np.float32)
        c[:, 32] = 1.0
        v = np.zeros((64, 64, 2), np.float32)
        v[..., 0] = 0.05
        cj, vj = jnp.asarray(c), jnp.asarray(v)

        for dt in (1 / 30, 1 / 100, 1 / 240):
            ref = np.mean([np.asarray(motion_blur(
                cj, vj, jnp.int32(f), delta_time=dt)) for f in range(8)], 0)
            swp = np.mean([np.asarray(motion_blur_sweep(
                cj, vj, jnp.int32(f), delta_time=dt)) for f in range(8)], 0)
            r, s = ref[32, :, 0], swp[32, :, 0]
            r_nz = np.nonzero(r > 0.01)[0]
            s_nz = np.nonzero(s > 0.01)[0]
            assert abs(int(r_nz.min()) - int(s_nz.min())) <= 1, dt
            assert abs(int(r_nz.max()) - int(s_nz.max())) <= 1, dt
            assert abs(s.sum() - r.sum()) <= 0.1 * max(r.sum(), 1e-6), dt

    def test_frame_average_converges_to_taps(self):
        """Frame-averaged (the TRAA integral) stripe smear agrees with
        the taps kernel: matching mean energy and a bounded residual —
        what's left is the radial/angular cell quantization, zero-mean
        under the per-frame R2 bin rotation."""
        c = np.zeros((64, 64, 3), np.float32)
        c[:, ::8] = 1.0
        v = np.zeros((64, 64, 2), np.float32)
        v[..., 0] = 0.07
        v[..., 1] = 0.07
        cj, vj = jnp.asarray(c), jnp.asarray(v)
        ref = np.mean([np.asarray(motion_blur(
            cj, vj, jnp.int32(f), delta_time=1 / 100)) for f in range(16)], 0)
        swp = np.mean([np.asarray(motion_blur_sweep(
            cj, vj, jnp.int32(f), delta_time=1 / 100)) for f in range(16)], 0)
        assert abs(ref.mean() - swp.mean()) < 0.01
        assert np.abs(ref - swp).mean() < 0.05

    def test_zero_gather_definitions(self):
        """The point of the sweep: no priced per-index fetches anywhere
        in the compiled program (CLAUDE.md rule 2b)."""
        import re

        fn = jax.jit(lambda c, v, f: motion_blur_sweep(c, v, f))
        txt = fn.lower(
            jnp.zeros((64, 96, 3), jnp.float32),
            jnp.zeros((64, 96, 2), jnp.float32),
            jnp.int32(0),
        ).compile().as_text()
        pat = re.compile(r"^\s*(?:ROOT )?\S+ = \S+ gather\(", re.MULTILINE)
        assert len(pat.findall(txt)) == 0

    def test_effect_mode_in_composer(self):
        scene = Scene()
        scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.6, 1.0))))
        box = scene.add(
            make_box((1, 1, 1), Material(diffuse=(1.0, 0.2, 0.1, 1.0))))
        box.set_matrix(translation(0, 0.5, 0))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 2.0, 5)
        cam.look_at((0, 0.5, 0))
        composer = EffectComposer(scene, cam, 96, 96)
        composer.add_effect(MotionBlurEffect(mode="sweep"))
        composer.render(dt=1 / 60)
        box.set_matrix(translation(0.6, 0.5, 0))
        img = np.asarray(composer.render(dt=1 / 60))
        assert np.isfinite(img).all()

        sharp = EffectComposer(scene, cam, 96, 96)
        sharp.add_effect(MotionBlurEffect(mode="sweep"))
        sharp.render(dt=1 / 60)
        simg = np.asarray(sharp.render(dt=1 / 60))
        diff = np.abs(img - simg).max(-1)
        assert (diff > 0.05).sum() > 50


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
