"""Rasterizer tests: coverage, depth ordering, velocity semantics."""

import jax.numpy as jnp
import numpy as np

from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.scene.geometry import (
    Material, make_box, make_plane, make_sphere, translation,
)
from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer, rasterize_velocity
from realism_effects_tpu.scene.scene import Scene


def _simple_scene():
    scene = Scene()
    scene.add(make_plane(20, Material(diffuse=(0.5, 0.5, 0.5, 1.0))))
    box = scene.add(make_box((1, 1, 1), Material(diffuse=(1.0, 0.0, 0.0, 1.0))))
    box.set_matrix(translation(0, 0.5, 0))
    return scene, box


def _camera(aspect=1.0):
    cam = PerspectiveCamera(50, aspect, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    return cam


def _vp(m):
    return jnp.asarray(
        np.asarray(m.projection_matrix, np.float64)
        @ np.asarray(m.view_matrix, np.float64),
        jnp.float32,
    )


class TestGBuffer:
    def test_floor_crossing_near_plane_is_rendered(self):
        """Clipless rasterization: huge floor partially behind the camera."""
        scene, _ = _simple_scene()
        m = _camera().matrices()
        gb = rasterize_gbuffer(scene.pack(), scene.model_matrices(), _vp(m), 128, 128)
        cov = float((np.asarray(gb.depth) < 1.0).mean())
        assert cov > 0.5  # floor fills the lower half and more

    def test_box_occludes_floor(self):
        scene, _ = _simple_scene()
        m = _camera().matrices()
        gb = rasterize_gbuffer(scene.pack(), scene.model_matrices(), _vp(m), 128, 128)
        red = np.asarray(gb.diffuse[..., 0]) > 0.9
        assert red.any()
        # the red box pixels must be closer than floor depth average
        d = np.asarray(gb.depth)
        assert d[red].mean() < d[(d < 1.0) & ~red].mean() + 0.05

    def test_normals_unit_and_up_on_floor(self):
        scene, _ = _simple_scene()
        m = _camera().matrices()
        gb = rasterize_gbuffer(scene.pack(), scene.model_matrices(), _vp(m), 128, 128)
        gray = np.asarray(gb.diffuse[..., 0])
        floor = (gray > 0.4) & (gray < 0.6)
        n = np.asarray(gb.normal)[floor]
        assert np.abs(np.linalg.norm(n, axis=-1) - 1.0).max() < 1e-3
        assert (n[:, 1] > 0.99).all()

    def test_background_depth_one(self):
        scene, _ = _simple_scene()
        m = _camera().matrices()
        gb = rasterize_gbuffer(scene.pack(), scene.model_matrices(), _vp(m), 64, 64)
        d = np.asarray(gb.depth)
        assert (d[(np.asarray(gb.diffuse).sum(-1) == 0)] == 1.0).all()

    def test_material_routing(self):
        scene = Scene()
        s = scene.add(
            make_sphere(1.0, material=Material(
                diffuse=(0.1, 0.9, 0.1, 1.0), roughness=0.3, metalness=0.7,
                emissive=(0.5, 0.0, 0.0)))
        )
        s.set_matrix(translation(0, 0, 0))
        cam = PerspectiveCamera(50, 1, 0.1, 50)
        cam.set_position(0, 0, 4)
        cam.look_at((0, 0, 0))
        m = cam.matrices()
        gb = rasterize_gbuffer(scene.pack(), scene.model_matrices(), _vp(m), 64, 64)
        hit = np.asarray(gb.depth) < 1.0
        assert hit.any()
        assert np.allclose(np.asarray(gb.roughness)[hit], 0.3, atol=1e-5)
        assert np.allclose(np.asarray(gb.metalness)[hit], 0.7, atol=1e-5)
        assert np.allclose(np.asarray(gb.emissive)[hit][:, 0], 0.5, atol=1e-5)


class TestVelocity:
    def test_static_scene_zero_velocity(self):
        scene, _ = _simple_scene()
        m = _camera().matrices()
        vel = rasterize_velocity(
            scene.pack(), scene.model_matrices(), scene.prev_model_matrices(),
            _vp(m), _vp(m), 64, 64,
        )
        assert float(np.abs(np.asarray(vel.velocity)).max()) < 1e-5

    def test_object_motion_produces_velocity(self):
        scene, box = _simple_scene()
        box.set_matrix(translation(0.1, 0.5, 0))  # moved since last frame
        m = _camera().matrices()
        vel = rasterize_velocity(
            scene.pack(), scene.model_matrices(), scene.prev_model_matrices(),
            _vp(m), _vp(m), 128, 128,
        )
        v = np.asarray(vel.velocity)
        moving = np.abs(v).max(-1) > 1e-4
        assert moving.any()
        # the floor must stay static
        d = np.asarray(vel.depth)
        assert (~moving[(d < 1.0)]).any()

    def test_camera_motion_velocity_matches_reprojection(self):
        """uv - velocity must land on the previous-frame position."""
        scene, _ = _simple_scene()
        cam = _camera()
        prev_m = cam.matrices()
        cam.set_position(3.2, 2.5, 4.0)
        cam.look_at((0, 0.5, 0))
        cur_m = cam.matrices()
        h = w = 128
        vel = rasterize_velocity(
            scene.pack(), scene.model_matrices(), scene.prev_model_matrices(),
            _vp(cur_m), _vp(prev_m), h, w,
        )
        from realism_effects_tpu.core.math3d import (
            screen_to_world, uv_grid, world_to_screen,
        )
        uv = uv_grid(h, w)
        world = screen_to_world(
            uv, vel.depth, cur_m.camera_matrix_world, cur_m.projection_matrix_inverse
        )
        prev_uv_expect = world_to_screen(
            world, prev_m.view_matrix, prev_m.projection_matrix
        )
        reproj = np.asarray(uv) - np.asarray(vel.velocity)
        mask = np.asarray(vel.depth) < 1.0
        err = np.abs(reproj - np.asarray(prev_uv_expect))[mask]
        assert np.percentile(err, 95) < 2.0 / w  # within ~2 px for 95%
