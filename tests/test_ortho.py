"""Orthographic-camera support (the reference's PERSPECTIVE_CAMERA
define has an orthographic branch in every shader, e.g.
`ssgi_utils.frag:7-13`, `hbao_utils.glsl:10-16`; here the dispatch reads
the projection matrix inside the kernels)."""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.composer import EffectComposer
from realism_effects_tpu.core import math3d
from realism_effects_tpu.core.camera import (
    OrthographicCamera, PerspectiveCamera,
)
from realism_effects_tpu.effects.ao import HBAOEffect
from realism_effects_tpu.effects.ssgi import SSGIEffect
from realism_effects_tpu.effects.traa import TRAAEffect
from realism_effects_tpu.scene.geometry import (
    Material, make_box, make_plane, translation,
)
from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer
from realism_effects_tpu.scene.scene import Scene


def test_depth_to_view_z_dispatch():
    depth = jnp.asarray(np.linspace(0.05, 0.95, 16), jnp.float32)
    p = PerspectiveCamera(50, 1, 0.1, 100)
    o = OrthographicCamera(-2, 2, 2, -2, 0.1, 100)
    got_p = np.asarray(math3d.depth_to_view_z(depth, p.matrices()))
    got_o = np.asarray(math3d.depth_to_view_z(depth, o.matrices()))
    np.testing.assert_allclose(
        got_p,
        np.asarray(math3d.perspective_depth_to_view_z(depth, 0.1, 100)),
        rtol=1e-6)
    np.testing.assert_allclose(
        got_o,
        np.asarray(math3d.orthographic_depth_to_view_z(depth, 0.1, 100)),
        rtol=1e-6)


def test_ortho_depth_maps_to_distance():
    """A wall at z=0 seen by an ortho camera at z=d: viewZ == -d."""
    scene = Scene()
    wall = scene.add(make_plane(8, Material()))
    # rotate plane to face +z (plane is XZ with +Y normal)
    from realism_effects_tpu.scene.geometry import rotation_x
    wall.set_matrix(rotation_x(np.pi / 2))
    cam = OrthographicCamera(-2, 2, 2, -2, 0.1, 50)
    cam.set_position(0, 0, 7)
    cam.look_at((0, 0, 0))
    m = cam.matrices()
    gb = rasterize_gbuffer(
        scene.pack(), scene.model_matrices(), m.projection_view_matrix, 32, 32)
    depth = np.asarray(gb.depth)
    assert (depth < 1.0).mean() > 0.9
    view_z = np.asarray(math3d.depth_to_view_z(jnp.asarray(depth), m))
    center = view_z[16, 16]
    assert abs(center - (-7.0)) < 1e-2, center


def test_full_stack_renders_with_ortho_camera():
    from realism_effects_tpu.core.envmap import (
        build_equirect_env, procedural_sky,
    )

    scene = Scene()
    scene.environment = build_equirect_env(procedural_sky(32, 64))
    scene.add(make_plane(12, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(make_box((1, 1, 1), Material(diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(translation(0, 0.5, 0))
    cam = OrthographicCamera(-3, 3, 3, -3, 0.1, 50)
    cam.set_position(4, 3, 5)
    cam.look_at((0, 0.5, 0))
    composer = EffectComposer(scene, cam, 72, 72)
    composer.add_effect(SSGIEffect(steps=6, refine_steps=2))
    composer.add_effect(HBAOEffect(spp=4))
    composer.add_effect(TRAAEffect())
    img = None
    for _ in range(5):
        img = np.asarray(composer.render(dt=1 / 60))
    assert np.isfinite(img).all()
    assert img.max() > 0.01

    # AO darkens the floor-box contact region relative to open floor
    from realism_effects_tpu.ops.ao import AOConfig, hbao
    m = cam.matrices()
    gb = rasterize_gbuffer(
        scene.pack(), scene.model_matrices(), m.projection_view_matrix, 72, 72)
    _, ao = hbao(gb.depth, gb.normal, m, jnp.int32(0), AOConfig(spp=16))
    ao = np.asarray(ao)
    assert np.isfinite(ao).all()
    assert ao.min() < 0.9  # some occlusion found
