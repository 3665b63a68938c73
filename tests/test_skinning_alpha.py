"""Skinned-mesh velocity and stochastic-alpha transparency tests."""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu import (
    EffectComposer, Material, PerspectiveCamera, Scene, TRAAEffect,
    make_box, make_plane, translation,
)
from realism_effects_tpu.core.rng import blue_noise_image
from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer, rasterize_velocity


def _skinned_quad():
    """Two-bone strip: bone 0 fixes the left edge, bone 1 moves the right."""
    mesh = make_plane(2.0, Material(diffuse=(1.0, 0.0, 0.0, 1.0)))
    # plane verts: x in {-1, 1}; weight right verts fully to bone 1
    w = np.zeros((4, 4), np.float32)
    idx = np.zeros((4, 4), np.int32)
    for v in range(4):
        if mesh.positions[v, 0] > 0:
            idx[v, 0] = 1
        w[v, 0] = 1.0
    mesh.skin_indices = idx
    mesh.skin_weights = w
    mesh.set_bones(np.stack([np.eye(4), np.eye(4)]))
    return mesh


class TestSkinning:
    def test_bone_motion_moves_vertices(self):
        scene = Scene()
        mesh = scene.add(_skinned_quad())
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 3, 0.01)
        cam.look_at((0, 0, 0))
        m = cam.matrices()
        packed = scene.pack()

        bones0 = jnp.asarray(scene.bone_matrices())
        gb0 = rasterize_gbuffer(packed, scene.model_matrices(),
                                m.projection_view_matrix, 64, 64, bones=bones0)
        cov0 = float((np.asarray(gb0.depth) < 1).mean())

        # move bone 1 up by 1 unit -> half the quad lifts toward the camera
        lift = np.eye(4)
        lift[1, 3] = 1.0
        mesh.set_bones(np.stack([np.eye(4), lift]))
        bones1 = jnp.asarray(scene.bone_matrices())
        gb1 = rasterize_gbuffer(packed, scene.model_matrices(),
                                m.projection_view_matrix, 64, 64, bones=bones1)
        d0, d1 = np.asarray(gb0.depth), np.asarray(gb1.depth)
        changed = (np.abs(d0 - d1) > 1e-4).mean()
        assert changed > 0.05

    def test_skinned_velocity_from_bone_motion(self):
        scene = Scene()
        mesh = scene.add(_skinned_quad())
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 3, 0.01)
        cam.look_at((0, 0, 0))
        m = cam.matrices()
        packed = scene.pack()
        lift = np.eye(4)
        lift[1, 3] = 0.5
        mesh.set_bones(np.stack([np.eye(4), lift]))  # prev = identity
        vel = rasterize_velocity(
            packed, scene.model_matrices(), scene.prev_model_matrices(),
            m.projection_view_matrix, m.projection_view_matrix, 64, 64,
            bones=jnp.asarray(scene.bone_matrices()),
            prev_bones=jnp.asarray(scene.bone_matrices(prev=True)),
        )
        v = np.asarray(vel.velocity)
        d = np.asarray(vel.depth)
        speed = np.where(d < 1, np.abs(v).max(-1), np.nan)
        assert np.nanmax(speed) > 1e-3, "bone-driven velocity missing"
        # velocity interpolates across the quad: the bone-0 (left) side
        # must move far less than the lifted bone-1 (right) side
        left = np.nanmean(speed[:, :16])
        right = np.nanmean(speed[:, -16:])
        assert right > 5 * max(left, 1e-6)

    def test_composer_integration(self):
        scene = Scene()
        scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.6, 1.0))))
        mesh = scene.add(_skinned_quad())
        mesh.set_matrix(translation(0, 1.0, 0))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 3, 3)
        cam.look_at((0, 1, 0))
        c = EffectComposer(scene, cam, 64, 64)
        c.add_effect(TRAAEffect())
        for f in range(3):
            lift = np.eye(4)
            lift[1, 3] = 0.2 * f
            mesh.set_bones(np.stack([np.eye(4), lift]))
            img = np.asarray(c.render())
        assert np.isfinite(img).all()


class TestStochasticAlpha:
    def test_alpha_half_covers_half_pixels(self):
        scene = Scene()
        box = scene.add(make_box((2, 2, 2), Material(diffuse=(1, 0, 0, 0.5))))
        box.set_matrix(translation(0, 0, 0))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 0, 4)
        cam.look_at((0, 0, 0))
        m = cam.matrices()
        packed = scene.pack()
        dither = blue_noise_image(128, 128, jnp.int32(0))[..., 0]
        # long-still camera: the convergence ramp has relaxed to the true
        # alpha (`GBufferMaterial.js:63-79`), so coverage ~ 0.5
        gb = rasterize_gbuffer(packed, scene.model_matrices(),
                               m.projection_view_matrix, 128, 128,
                               dither=dither, cnmf=jnp.float32(1000.0))
        # full coverage without dither
        gb_full = rasterize_gbuffer(packed, scene.model_matrices(),
                                    m.projection_view_matrix, 128, 128)
        cov = (np.asarray(gb.depth) < 1).mean()
        cov_full = (np.asarray(gb_full.depth) < 1).mean()
        assert cov_full > 0.3
        ratio = cov / cov_full
        assert 0.35 < ratio < 0.65, f"alpha 0.5 coverage ratio {ratio}"
        # first still frame (camera just moved): hard 0.5 cut keeps full
        # coverage for alpha == 0.5
        gb0 = rasterize_gbuffer(packed, scene.model_matrices(),
                                m.projection_view_matrix, 128, 128,
                                dither=dither, cnmf=jnp.float32(0.0))
        assert (np.asarray(gb0.depth) < 1).mean() / cov_full > 0.99

    def test_transparency_converges_under_taa(self):
        """Accumulated transparent surface shows a blend of box and floor."""
        scene = Scene()
        scene.add(make_plane(20, Material(diffuse=(0.0, 0.0, 1.0, 1.0))))
        box = scene.add(make_box((2, 0.2, 2), Material(diffuse=(1, 0, 0, 0.5))))
        box.set_matrix(translation(0, 1.0, 0))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 4, 0.01)
        cam.look_at((0, 0, 0))
        c = EffectComposer(scene, cam, 96, 96)
        c.add_effect(TRAAEffect())
        for _ in range(24):
            img = np.asarray(c.render())
        center = img[40:56, 40:56]
        # both red (box) and blue (floor) must contribute
        assert center[..., 0].mean() > 0.05
        assert center[..., 2].mean() > 0.05
