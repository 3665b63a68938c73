"""SSGI tests: sampler statistics, ray march correctness, end-to-end GI."""

import numpy as np
import jax.numpy as jnp
import pytest

from realism_effects_tpu.composer import EffectComposer
from realism_effects_tpu.core import brdf
from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.core.envmap import (
    build_equirect_env, equirect_uv_to_direction, direction_to_equirect_uv,
    procedural_sky, sample_equirect_probability,
)
from realism_effects_tpu.effects.ssgi import SSGIEffect, SSREffect
from realism_effects_tpu.ops.ssgi import SSGIConfig, _view_space_ray_march
from realism_effects_tpu.scene.geometry import (
    Material, make_box, make_plane, make_sphere, translation,
)
from realism_effects_tpu.scene.scene import Scene


class TestSamplers:
    def test_cosine_hemisphere_distribution(self):
        """Mean direction of cosine-weighted samples is ~2/3 along n."""
        rng = np.random.default_rng(0)
        n = jnp.asarray(np.tile([0.0, 0.0, 1.0], (20000, 1)), jnp.float32)
        u = jnp.asarray(rng.uniform(size=(20000, 2)), jnp.float32)
        d = np.asarray(brdf.cosine_sample_hemisphere(n, u))
        assert (d[:, 2] > -1e-6).all()
        assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01

    def test_ggx_vndf_sampling_aligns_with_roughness(self):
        rng = np.random.default_rng(1)
        v = jnp.asarray(np.tile([0.0, 0.0, 1.0], (8192, 1)), jnp.float32)
        u1 = jnp.asarray(rng.uniform(size=8192), jnp.float32)
        u2 = jnp.asarray(rng.uniform(size=8192), jnp.float32)
        h_smooth = np.asarray(brdf.sample_ggx_vndf(v, 0.01, 0.01, u1, u2))
        h_rough = np.asarray(brdf.sample_ggx_vndf(v, 0.8, 0.8, u1, u2))
        # smooth surface: half vectors hug the normal
        assert h_smooth[:, 2].mean() > 0.999
        assert h_rough[:, 2].mean() < h_smooth[:, 2].mean() - 0.05

    def test_equirect_uv_direction_roundtrip(self):
        rng = np.random.default_rng(2)
        uv = jnp.asarray(rng.uniform(0.05, 0.95, (512, 2)), jnp.float32)
        d = equirect_uv_to_direction(uv)
        uv2 = direction_to_equirect_uv(d)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-4)

    def test_env_importance_sampling_prefers_sun(self):
        """CDF inversion: most samples should land near the bright sun."""
        sky = procedural_sky(64, 128, sun_intensity=100.0)
        env = build_equirect_env(sky)
        rng = np.random.default_rng(3)
        noise = jnp.asarray(rng.uniform(size=(4096, 2)), jnp.float32)
        pdf, dirs = sample_equirect_probability(env, noise)
        dirs = np.asarray(dirs)
        sun = np.asarray([0.5, 0.6, 0.3])
        sun /= np.linalg.norm(sun)
        cos = dirs @ sun
        # a large share of samples within ~15 deg of the sun
        assert (cos > 0.965).mean() > 0.3
        assert np.asarray(pdf)[np.asarray(cos) > 0.965].mean() > np.asarray(pdf).mean()

    def test_mis_heuristic(self):
        a = brdf.mis_heuristic(jnp.asarray(1.0), jnp.asarray(1.0))
        assert abs(float(a) - 0.5) < 1e-6
        b = brdf.mis_heuristic(jnp.asarray(10.0), jnp.asarray(0.1))
        assert float(b) > 0.99


class TestRayMarch:
    def _camera(self):
        cam = PerspectiveCamera(60, 1.0, 0.1, 100.0)
        cam.set_position(0, 0, 5)
        cam.look_at((0, 0, 0))
        return cam.matrices()

    def test_ray_toward_wall_hits(self):
        """A flat wall at z=0 fills the depth buffer; rays fired forward
        from a closer point must hit it near their true intersection."""
        m = self._camera()
        h = w = 64
        # depth buffer of a wall at view z = -5 (world z = 0)
        from realism_effects_tpu.core.math3d import view_z_to_perspective_depth
        wall_depth = float(view_z_to_perspective_depth(jnp.asarray(-5.0), 0.1, 100.0))
        depth = jnp.full((h, w), wall_depth, jnp.float32)

        # start 2 units in front of the wall, ray straight ahead (-z)
        view_pos = jnp.tile(
            jnp.asarray([0.0, 0.0, -3.0], jnp.float32), (h, w, 1)
        )
        l = jnp.tile(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (h, w, 1))
        cfg = SSGIConfig(steps=20, refine_steps=5)
        # thickness must exceed the per-step advance (reference default 10)
        uv, hit_pos, missed = _view_space_ray_march(
            view_pos, l, depth, m, jnp.full((h, w), 0.5), 1.0, 10.0, cfg
        )
        assert not bool(np.asarray(missed).all())
        hits = ~np.asarray(missed)
        z = np.asarray(hit_pos)[..., 2][hits]
        assert np.abs(z - (-5.0)).max() < 0.15  # binary search refines

    def test_ray_away_from_geometry_misses(self):
        m = self._camera()
        h = w = 32
        depth = jnp.ones((h, w), jnp.float32)  # background everywhere
        view_pos = jnp.tile(jnp.asarray([0.0, 0.0, -3.0], jnp.float32), (h, w, 1))
        l = jnp.tile(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (h, w, 1))
        cfg = SSGIConfig(steps=10, refine_steps=2)
        _, hit_pos, missed = _view_space_ray_march(
            view_pos, l, depth, m, jnp.full((h, w), 0.5), 0.1, 5.0, cfg
        )
        # depth==1 -> viewZ=-100 far away; diff large negative -> miss
        assert bool(np.asarray(missed).all())
        assert (np.asarray(hit_pos)[..., 0] > 1e8).all()


def _gi_scene():
    """Bright emissive panel next to a wall: the wall must pick up light."""
    scene = Scene()
    scene.environment = build_equirect_env(procedural_sky(32, 64))
    scene.add(make_plane(20, Material(diffuse=(0.7, 0.7, 0.7, 1.0), roughness=0.9)))
    panel = scene.add(make_box((0.2, 2, 2), Material(
        diffuse=(1.0, 0.2, 0.1, 1.0), emissive=(8.0, 1.0, 0.5), roughness=0.9)))
    panel.set_matrix(translation(-1.5, 1.0, 0))
    wall = scene.add(make_box((0.2, 2, 2), Material(
        diffuse=(0.8, 0.8, 0.8, 1.0), roughness=0.9)))
    wall.set_matrix(translation(1.5, 1.0, 0))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(0.5, 1.5, 5)
    cam.look_at((0, 1.0, 0))
    return scene, cam


class TestSSGIEndToEnd:
    def test_runs_and_is_finite(self):
        scene, cam = _gi_scene()
        composer = EffectComposer(scene, cam, 96, 96)
        composer.add_effect(SSGIEffect(steps=8, refine_steps=2))
        for _ in range(4):
            img = np.asarray(composer.render())
        assert np.isfinite(img).all()
        assert img.min() >= 0.0

    def test_indirect_light_accumulates(self):
        """The white wall facing the emissive panel must brighten over
        frames relative to frame 0 (indirect bounce builds up)."""
        scene, cam = _gi_scene()
        composer = EffectComposer(scene, cam, 128, 128)
        composer.add_effect(SSGIEffect(steps=12, refine_steps=3))
        first = np.asarray(composer.render())
        for _ in range(24):
            last = np.asarray(composer.render())
        # wall region = right-ish half, white-ish pixels facing the panel
        # red channel gain from the red-emissive panel bounce
        region = np.s_[40:90, 70:110]
        gain = last[region][..., 0].mean() / max(first[region][..., 0].mean(), 1e-6)
        assert gain > 1.02, f"no indirect gain: {gain}"

    def test_ssr_effect_runs(self):
        scene, cam = _gi_scene()
        composer = EffectComposer(scene, cam, 64, 64)
        composer.add_effect(SSREffect(steps=8, refine_steps=2))
        for _ in range(3):
            img = np.asarray(composer.render())
        assert np.isfinite(img).all()

    def test_debug_output_routing(self):
        scene, cam = _gi_scene()
        composer = EffectComposer(scene, cam, 64, 64)
        composer.add_effect(SSGIEffect(steps=4, refine_steps=1,
                                       output_texture="denoised_diffuse"))
        img = np.asarray(composer.render())
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()

    def test_reset_clears_accumulation(self):
        scene, cam = _gi_scene()
        composer = EffectComposer(scene, cam, 64, 64)
        composer.add_effect(SSGIEffect(steps=6, refine_steps=2))
        for _ in range(6):
            composer.render()
        alpha = np.asarray(composer.state("ssgi")["history"][0])[..., 3]
        assert alpha.max() > 1.5
        composer.reset()
        composer.render()
        alpha2 = np.asarray(composer.state("ssgi")["history"][0])[..., 3]
        assert alpha2.max() <= 1.0 + 1e-3


class TestSweepTrace:
    """The direction-binned roll-sweep trace (`ops/ssgi_sweep.py`) — the
    gather-free TPU discretization of `ssgi.frag:441-503`'s march."""

    def _camera(self):
        cam = PerspectiveCamera(60, 1.0, 0.1, 100.0)
        cam.set_position(0, 0, 5)
        cam.look_at((0, 0, 0))
        return cam.matrices()

    def test_wall_hit_analytic_refine(self):
        """An angled ray into a flat wall must hit at the exact analytic
        intersection (closed-form refine beats the march's 5 halvings)."""
        from realism_effects_tpu.core.math3d import view_z_to_perspective_depth
        from realism_effects_tpu.ops.ssgi_sweep import sweep_ray_march

        m = self._camera()
        h = w = 64
        wall_depth = float(
            view_z_to_perspective_depth(jnp.asarray(-5.0), 0.1, 100.0))
        depth = jnp.full((h, w), wall_depth, jnp.float32)
        view_pos = jnp.tile(
            jnp.asarray([0.0, 0.0, -3.0], jnp.float32), (h, w, 1))
        l = jnp.asarray([0.35, 0.1, -0.93], jnp.float32)
        l = jnp.tile(l / jnp.linalg.norm(l), (h, w, 1))

        (uv, hit_pos, missed), = sweep_ray_march(
            view_pos, [l], depth, m, 3, 1.0, 10.0, dirs=16, steps=32)
        missed = np.asarray(missed)
        # border pixels may sweep out of frame (documented deviation);
        # the interior must hit
        assert not missed[16:48, 16:48].any()
        z = np.asarray(hit_pos)[..., 2][~missed]
        np.testing.assert_allclose(z, -5.0, atol=1e-3)
        assert np.isfinite(np.asarray(uv)).all()

    def test_background_misses(self):
        """depth == 1 (background, viewZ = -far) everywhere -> every ray
        misses with the 1e9 sentinel, like the gather march."""
        from realism_effects_tpu.ops.ssgi_sweep import sweep_ray_march

        m = self._camera()
        h = w = 32
        depth = jnp.ones((h, w), jnp.float32)
        view_pos = jnp.tile(
            jnp.asarray([0.0, 0.0, -3.0], jnp.float32), (h, w, 1))
        l = jnp.asarray([0.35, 0.1, -0.93], jnp.float32)
        l = jnp.tile(l / jnp.linalg.norm(l), (h, w, 1))
        (uv, hit_pos, missed), = sweep_ray_march(
            view_pos, [l], depth, m, 0, 0.1, 5.0, dirs=8, steps=16)
        assert bool(np.asarray(missed).all())
        assert (np.asarray(hit_pos)[..., 0] > 1e8).all()
        assert np.isfinite(np.asarray(uv)).all()

    def test_missed_rays_march_end_radiance(self):
        """With ``miss_radiance=True`` (the ``missed_rays`` option),
        missed rays end the sweep holding the radiance at their
        march-end texel — the `ssgi.frag:430-436` accumulated fetch —
        instead of zeros (round-5 gap closure, PARITY.md)."""
        from realism_effects_tpu.ops.ssgi_sweep import sweep_ray_march

        m = self._camera()
        h = w = 64
        depth = jnp.ones((h, w), jnp.float32)  # background -> all miss
        view_pos = jnp.tile(
            jnp.asarray([0.0, 0.0, -3.0], jnp.float32), (h, w, 1))
        l = jnp.tile(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (h, w, 1))
        # radiance ramps along x; validity channel = 1
        xs = jnp.broadcast_to(
            jnp.arange(w, dtype=jnp.float32)[None, :] / w, (h, w))
        rad = jnp.stack(
            [xs, jnp.full((h, w), 0.25, jnp.float32),
             jnp.zeros((h, w), jnp.float32),
             jnp.ones((h, w), jnp.float32)], axis=-1)

        def run(miss_radiance):
            (uv, hit_pos, missed, gi), = sweep_ray_march(
                view_pos, [l], depth, m, 0, 0.1, 50.0, dirs=8, steps=16,
                radiance=rad, miss_radiance=miss_radiance)
            return np.asarray(missed), np.asarray(gi)

        missed, gi = run(True)
        assert missed.all()
        inner = np.s_[24:40, 4:32]  # left-half pixels, ray -> +x
        # march end is near the right frame edge: the fetched ramp value
        # must be well past the pixel's own x (first-step would be ~x)
        assert (gi[inner][..., 0] > 0.8).all(), gi[inner][..., 0].min()
        np.testing.assert_allclose(gi[inner][..., 1], 0.25, atol=2e-3)
        assert (gi[inner][..., 3] > 0.5).all()  # validity rode along
        # default (hit-only tracking): missed lanes hold zeros
        _, gi_off = run(False)
        assert (gi_off[inner] == 0.0).all()

    def test_converged_default_stack_matches_march(self):
        """The converged-stack quality gate (VERDICT r4 #6): the SHIPPED
        default knobs — steps=20/refine=5, sweep 16x32, importance
        sampling, env lod quantize, f16 CDF table, quad-strided env
        fetch, nearest in-march radiance — rendered static-camera to
        convergence, vs the march stack at the same knobs. Bounds the
        JOINT error of every sweep-mode approximation at once
        (`ssgi.frag:311-388` is the per-pixel-exact semantics), tighter
        than the single-kernel 12% smoke bound below."""
        frames = {}
        for mode in ("march", "sweep"):
            scene, cam = _gi_scene()
            c = EffectComposer(scene, cam, 96, 96)
            c.add_effect(SSGIEffect(trace=mode))  # shipped defaults
            c.render()
            for _ in range(31):
                last = np.asarray(c.render())
            frames[mode] = last
        a, b = frames["march"], frames["sweep"]
        assert np.isfinite(b).all() and b.min() >= 0.0
        rel_rmse = float(np.sqrt(((a - b) ** 2).mean()) / max(a.mean(), 1e-6))
        assert rel_rmse < 0.03, (
            f"converged default sweep stack diverges from march: "
            f"{rel_rmse:.4f}")

    def test_end_to_end_matches_march(self):
        """SSGI with trace='sweep' converges to the march's result on the
        emissive-panel scene (same hit law; direction snap integrates out
        through the per-frame R2 bin rotation + temporal filter)."""
        frames = {}
        for mode in ("march", "sweep"):
            scene, cam = _gi_scene()
            c = EffectComposer(scene, cam, 96, 96)
            c.add_effect(SSGIEffect(steps=8, refine_steps=2, trace=mode,
                                    sweep_dirs=12, sweep_steps=24))
            first = np.asarray(c.render())
            for _ in range(15):
                last = np.asarray(c.render())
            region = np.s_[30:68, 52:82]
            gain = last[region][..., 0].mean() / max(
                first[region][..., 0].mean(), 1e-6)
            frames[mode] = (last, gain)
        a, gain_march = frames["march"]
        b, gain_sweep = frames["sweep"]
        assert np.isfinite(b).all() and b.min() >= 0.0
        # both show the indirect red bounce building up
        assert gain_sweep > 1.02, f"no indirect gain under sweep: {gain_sweep}"
        # converged frames agree closely (CPU 128^2 measured ~4.6% rel RMSE)
        rel_rmse = float(np.sqrt(((a - b) ** 2).mean()) / max(a.mean(), 1e-6))
        assert rel_rmse < 0.12, f"sweep diverges from march: {rel_rmse}"
