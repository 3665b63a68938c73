"""Textured-material tests: UV interpolation + atlas sampling."""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu import (
    EffectComposer, Material, PerspectiveCamera, Scene, make_box, make_plane,
    translation,
)
from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer


def _checker(n=8, size=64):
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    c = (((yy * n // size) + (xx * n // size)) % 2).astype(np.float32)
    tex = np.stack([c, 1.0 - c, np.zeros_like(c)], -1)  # red/green checker
    return tex


class TestTexturedMaterials:
    def test_checker_appears_on_plane(self):
        scene = Scene()
        mat = Material(diffuse=(1, 1, 1, 1.0), map=_checker())
        scene.add(make_plane(4.0, mat))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 4, 0.01)
        cam.look_at((0, 0, 0))
        m = cam.matrices()
        gb = rasterize_gbuffer(
            scene.pack(), scene.model_matrices(), m.projection_view_matrix,
            128, 128,
        )
        d = np.asarray(gb.diffuse)
        fg = np.asarray(gb.depth) < 1
        assert fg.mean() > 0.3
        red = (d[..., 0] > 0.6) & fg
        green = (d[..., 1] > 0.6) & fg
        # both checker colors present, in roughly equal shares
        assert red.sum() > 100 and green.sum() > 100
        ratio = red.sum() / max(green.sum(), 1)
        assert 0.6 < ratio < 1.6

    def test_untextured_meshes_unaffected(self):
        scene = Scene()
        scene.add(make_plane(4.0, Material(diffuse=(1, 1, 1, 1.0), map=_checker())))
        box = scene.add(make_box((1, 1, 1), Material(diffuse=(0.2, 0.4, 0.9, 1.0))))
        box.set_matrix(translation(0, 0.5, 0))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 2, 3)
        cam.look_at((0, 0.5, 0))
        m = cam.matrices()
        gb = rasterize_gbuffer(
            scene.pack(), scene.model_matrices(), m.projection_view_matrix,
            96, 96,
        )
        d = np.asarray(gb.diffuse)
        blue = d[..., 2] > 0.8
        assert blue.any()
        np.testing.assert_allclose(d[blue][:, 0], 0.2, atol=1e-5)

    def test_emissive_map(self):
        scene = Scene()
        emis = np.zeros((32, 32, 3), np.float32)
        emis[:16] = 4.0
        scene.add(make_plane(4.0, Material(
            diffuse=(0.5, 0.5, 0.5, 1.0), emissive=(1.0, 1.0, 1.0),
            emissive_map=emis)))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 4, 0.01)
        cam.look_at((0, 0, 0))
        m = cam.matrices()
        gb = rasterize_gbuffer(
            scene.pack(), scene.model_matrices(), m.projection_view_matrix,
            96, 96,
        )
        e = np.asarray(gb.emissive)
        fg = np.asarray(gb.depth) < 1
        assert (e[fg].max(-1) > 3.0).any()
        assert (e[fg].max(-1) < 0.5).any()

    def test_composer_with_textures(self):
        scene = Scene()
        scene.add(make_plane(8.0, Material(diffuse=(1, 1, 1, 1.0), map=_checker())))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(2, 3, 3)
        cam.look_at((0, 0, 0))
        c = EffectComposer(scene, cam, 64, 64)
        img = np.asarray(c.render())
        assert np.isfinite(img).all()
