"""External G-buffer ingestion (the framework boundary, SURVEY.md §7)."""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu import (
    EffectComposer, HBAOEffect, Material, PerspectiveCamera, Scene,
    TRAAEffect, make_box, make_plane, translation,
)
from realism_effects_tpu.scene.rasterizer import (
    rasterize_gbuffer, rasterize_velocity,
)
from realism_effects_tpu.scene.shading import shade_direct


def test_external_buffers_match_internal_render():
    """Feeding the rasterizer's own buffers through render_external must
    reproduce render() exactly (fixtures replace the rasterizer)."""
    scene = Scene()
    scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(make_box((1, 1, 1), Material(diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(translation(0, 0.5, 0))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))

    internal = EffectComposer(scene, cam, 64, 64)
    internal.add_effect(HBAOEffect(spp=4, denoise_iterations=1))
    imgs_internal = [np.asarray(internal.render()) for _ in range(3)]

    external = EffectComposer(scene, cam, 64, 64)
    external.add_effect(HBAOEffect(spp=4, denoise_iterations=1))
    packed = scene.pack()
    m = cam.matrices()
    vp = m.projection_view_matrix
    gb = rasterize_gbuffer(packed, scene.model_matrices(), vp, 64, 64)
    vel = rasterize_velocity(
        packed, scene.model_matrices(), scene.prev_model_matrices(), vp, vp,
        64, 64,
    )
    color = shade_direct(gb, m, scene.lighting_params())
    imgs_external = [
        np.asarray(external.render_external(gb, vel, color)) for _ in range(3)
    ]
    np.testing.assert_allclose(imgs_external[-1], imgs_internal[-1], atol=1e-5)


def test_external_with_synthetic_fixture():
    """Pure fixture buffers (no rasterizer at all) drive the stack."""
    from realism_effects_tpu.core.framebuffers import GBuffer, VelocityBuffer

    h = w = 48
    scene = Scene()  # empty scene: only provides lighting/env defaults
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(0, 0, 3)
    cam.look_at((0, 0, 0))
    c = EffectComposer(scene, cam, h, w)
    c.add_effect(TRAAEffect())

    rng = np.random.default_rng(0)
    gb = GBuffer.background(h, w)
    gb = gb.replace(depth=jnp.full((h, w), 0.9, jnp.float32),
                    normal=jnp.asarray(np.tile([0, 0, 1.0], (h, w, 1)),
                                       jnp.float32))
    vel = VelocityBuffer(
        velocity=jnp.zeros((h, w, 2)),
        normal=gb.normal,
        depth=gb.depth,
    )
    color = jnp.asarray(rng.uniform(size=(h, w, 3)), jnp.float32)
    out = None
    for _ in range(4):
        out = np.asarray(c.render_external(gb, vel, color))
    assert np.isfinite(out).all()
    # static camera + static input -> accumulation reduces nothing to
    # change, output approaches the input
    assert np.abs(out - np.asarray(color)).mean() < 0.05
