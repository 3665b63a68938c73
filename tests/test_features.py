"""Feature-option tests: resolution scale, dilation, box env, direct light."""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu import (
    EffectComposer, Material, PerspectiveCamera, Scene, SSGIEffect,
    build_equirect_env, make_box, make_plane, procedural_sky, translation,
)
from realism_effects_tpu.core.framebuffers import VelocityBuffer
from realism_effects_tpu.ops.temporal_reproject import _dilate_closest


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


class TestResolutionScale:
    def test_half_res_ssgi_runs(self):
        scene, cam = _scene()
        c = EffectComposer(scene, cam, 96, 96)
        c.add_effect(SSGIEffect(steps=6, refine_steps=2, resolution_scale=0.5))
        for _ in range(3):
            img = np.asarray(c.render())
        assert np.isfinite(img).all()
        assert img.max() > 0.01

    def test_preset_low_uses_half_res(self):
        e = SSGIEffect(preset="low")
        assert e.resolution_scale == 0.5


class TestVelocityDilation:
    def test_closest_depth_wins(self):
        h = w = 8
        depth = jnp.ones((h, w)) * 0.9
        depth = depth.at[4, 4].set(0.1)  # one very close pixel
        vel = jnp.zeros((h, w, 2)).at[4, 4].set(jnp.asarray([0.5, 0.0]))
        buf = VelocityBuffer(
            velocity=vel, normal=jnp.zeros((h, w, 3)), depth=depth
        )
        dv, dn, dd = _dilate_closest(buf)
        # neighbors of (4,4) adopt its velocity and depth
        assert abs(float(dd[4, 5]) - 0.1) < 1e-6
        assert abs(float(dv[3, 3, 0]) - 0.5) < 1e-6
        # far away pixels unchanged
        assert float(dv[0, 0, 0]) == 0.0


class TestSSGIOptions:
    def test_use_direct_light(self):
        scene, cam = _scene()
        c = EffectComposer(scene, cam, 64, 64)
        c.add_effect(SSGIEffect(steps=4, refine_steps=1, use_direct_light=True))
        img = np.asarray(c.render())
        assert np.isfinite(img).all()

    def test_box_projected_env(self):
        scene, cam = _scene()
        c = EffectComposer(scene, cam, 64, 64)
        c.add_effect(SSGIEffect(
            steps=4, refine_steps=1,
            env_box=((10.0, 10.0, 10.0), (0.0, 2.0, 0.0)),
        ))
        img = np.asarray(c.render())
        assert np.isfinite(img).all()


class TestDenoiseModes:
    def test_all_denoise_modes_run(self):
        """denoiseMode parity: full | full_temporal | denoised | temporal
        (`Denoiser.js:7`)."""
        scene, cam = _scene()
        for mode in ("full", "full_temporal", "denoised", "temporal"):
            c = EffectComposer(scene, cam, 48, 48)
            c.add_effect(SSGIEffect(steps=4, refine_steps=1, denoise_mode=mode))
            for _ in range(2):
                img = np.asarray(c.render())
            assert np.isfinite(img).all(), mode


class TestDefaultsParity:
    def test_ssgi_defaults_match_reference(self):
        """defaults mirror `SSGIOptions.js:26-48` key for key."""
        e = SSGIEffect()
        assert e.distance == 10.0          # distance
        assert e.thickness == 10.0         # thickness
        assert e.env_blur == 0.5           # envBlur
        assert e.cfg.importance_sampling   # importanceSampling: true
        assert e.cfg.steps == 20           # steps
        assert e.cfg.refine_steps == 5     # refineSteps
        assert not e.cfg.missed_rays       # missedRays: false
        assert e.resolution_scale == 1.0   # resolutionScale
        d = e.denoise_cfg
        assert d.iterations == 1           # denoiseIterations
        assert d.radius == 3.0             # radius
        assert d.phi == 0.5                # phi
        assert d.luma_phi == 5.0           # lumaPhi
        assert d.depth_phi == 2.0          # depthPhi
        assert d.normal_phi == 50.0        # normalPhi
        assert d.roughness_phi == 50.0     # roughnessPhi
        assert d.specular_phi == 50.0      # specularPhi

    def test_ao_defaults_match_reference(self):
        """defaults mirror `AOEffect.js:8-21`."""
        from realism_effects_tpu import HBAOEffect
        e = HBAOEffect()
        assert e.cfg.spp == 8
        assert e.cfg.distance == 2.0
        assert e.cfg.distance_power == 1.0
        assert e.power == 2.0
        assert e.cfg.bias == 40.0
        assert e.cfg.thickness == 0.075
        assert e.color == (0.0, 0.0, 0.0)
        assert e.denoise_cfg.normal_phi == 3.25  # PoissonDenoisePass default

    def test_traa_defaults_match_reference(self):
        """overrides from `TRAAEffect.js:21-31`."""
        from realism_effects_tpu import TRAAEffect
        e = TRAAEffect()
        assert e.max_blend == 0.9
        assert e.neighborhood_clamp_intensity == 1.0
        assert e.cfg.confidence_power == 4.0
        assert e.cfg.log_transform


def test_set_size_rebuilds_and_resets():
    """EffectComposer.set_size analog of the reference's setSize chain
    (render targets reallocate, history resets)."""
    import numpy as np

    from realism_effects_tpu import (
        EffectComposer, HBAOEffect, Material, PerspectiveCamera, Scene,
        TRAAEffect, build_equirect_env, make_plane, procedural_sky,
    )

    scene = Scene()
    scene.environment = build_equirect_env(procedural_sky(16, 32))
    scene.add(make_plane(10, Material()))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(0, 2, 3)
    cam.look_at((0, 0, 0))
    c = EffectComposer(scene, cam, 48, 48)
    c.add_effect(HBAOEffect())
    c.add_effect(TRAAEffect())
    assert np.asarray(c.render()).shape == (48, 48, 3)
    c.set_size(64, 64)
    out = np.asarray(c.render())
    assert out.shape == (64, 64, 3)
    assert np.isfinite(out).all()


def test_environment_auto_build_and_refresh():
    """The composer's keepEnvMapUpdated analog (`SSGIEffect.js:309-366`):
    a RAW equirect array assigned to scene.environment is auto-built
    into the CDF/mip bundle; assigning a different raw map is detected
    by identity and rebuilds (+ resets history); refresh_environment()
    forces a rebuild after in-place mutation."""
    scene = Scene()
    sky_a = np.asarray(procedural_sky(16, 32))
    scene.environment = sky_a                    # raw map, no build call
    scene.add(make_plane(10, Material()))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(0, 2, 3)
    cam.look_at((0, 0, 0))
    c = EffectComposer(scene, cam, 48, 48)
    c.add_effect(SSGIEffect(steps=4, refine_steps=1))
    img_a = np.asarray(c.render())
    assert np.isfinite(img_a).all()
    key_a = c._env_cache_key

    # new raw map -> auto rebuild + temporal reset
    scene.environment = sky_a * 4.0
    img_b = np.asarray(c.render())
    assert c._env_cache_key != key_a
    assert np.abs(img_b - img_a).max() > 1e-3

    # in-place mutation is invisible to identity; refresh forces it
    c.refresh_environment()
    assert c._env_cache_key is None
    np.asarray(c.render())

    # cube-face input converts like CubeToEquirectEnvPass
    from realism_effects_tpu.core.envmap import equirect_to_cube
    scene.environment = np.asarray(
        equirect_to_cube(jnp.asarray(sky_a), 8))
    img_c = np.asarray(c.render())
    assert np.isfinite(img_c).all()


def test_odd_dimension_env_background():
    """ADVICE r4: FAST_BACKGROUND's half-res grid must survive odd frame
    dims (ceil sizing) — 96x65 with an env map used to raise a broadcast
    error in the bilinear 2x upsample."""
    scene, cam = _scene()
    c = EffectComposer(scene, cam, 96, 65)
    out = np.asarray(c.render())
    assert out.shape == (65, 96, 3)
    assert np.isfinite(out).all()


def test_env_cache_cleared_when_environment_none():
    """ADVICE r4: scene.environment = None must drop the id()-keyed env
    cache so a later array recycled at the same address rebuilds."""
    scene, cam = _scene()
    c = EffectComposer(scene, cam, 48, 48)
    sky = np.asarray(procedural_sky(16, 32))
    scene.environment = sky
    np.asarray(c.render())
    assert c._env_cache_key is not None
    assert c._env_raw is sky            # raw map pinned while cached
    scene.environment = None
    np.asarray(c.render())
    assert c._env_cache_key is None
    assert c._env_built is None and c._env_raw is None


def test_superrange_sun_texel_finite_cdf():
    """ADVICE r4: a >f16-max HDR texel must not poison cdf_packed (or the
    mips) with inf/NaN — clipped to 65504 before f16 quantization."""
    sky = np.asarray(procedural_sky(16, 32), np.float32).copy()
    sky[3, 7] = 2e5
    env = build_equirect_env(sky)
    assert np.isfinite(np.asarray(env.cdf_packed, np.float32)).all()
    for m in env.mips:
        assert np.isfinite(np.asarray(m, np.float32)).all()
