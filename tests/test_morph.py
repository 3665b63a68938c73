"""Morph-target animation tests (K16/K17 morph paths).

The reference's velocity material runs three.js' morphtarget /
morphnormal vertex chunks for BOTH the current and the previous frame
(`VelocityDepthNormalMaterial.js:110-132`), and GBufferMaterial inherits
morph support from MeshPhysicalMaterial. Here morph deltas are packed as
(V, T, 3) tables and blended by per-mesh weight rows.
"""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.composer import EffectComposer
from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.effects.traa import TRAAEffect
from realism_effects_tpu.scene.geometry import (
    Material, make_box, make_plane, translation,
)
from realism_effects_tpu.scene.rasterizer import (
    rasterize_gbuffer, rasterize_velocity,
)
from realism_effects_tpu.scene.scene import Scene


def _morph_box(delta=(1.0, 0.0, 0.0)):
    """Unit box with one morph target translating every vertex by delta."""
    box = make_box((1, 1, 1), Material(diffuse=(0.9, 0.2, 0.2, 1.0)))
    t = np.tile(np.asarray(delta, np.float32), (len(box.positions), 1))
    box.morph_positions = t[None]            # (T=1, V, 3)
    box.morph_normals = np.zeros_like(t)[None]
    box.set_morph_weights([0.0])
    return box


def _camera(w=64, h=64):
    cam = PerspectiveCamera(50, w / h, 0.1, 100)
    cam.set_position(0, 1.0, 5)
    cam.look_at((0, 0.5, 0))
    return cam


class TestMorphRaster:
    def test_weights_deform_gbuffer(self):
        scene = Scene()
        box = scene.add(_morph_box(delta=(2.0, 0.0, 0.0)))
        box.set_matrix(translation(0, 0.5, 0))
        packed = scene.pack()
        cam = _camera().matrices()
        mm = scene.model_matrices()

        def cover(weights):
            gb = rasterize_gbuffer(
                packed, mm, cam.projection_view_matrix, 64, 64,
                morph_weights=jnp.asarray(weights, jnp.float32),
            )
            return np.asarray(gb.depth < 1.0)

        base = cover(np.zeros((1, 1)))
        morphed = cover(np.ones((1, 1)))
        # weight 1 slides the box 2 units along +x: coverage must move
        assert base.any() and morphed.any()
        base_x = np.argwhere(base)[:, 1].mean()
        morph_x = np.argwhere(morphed)[:, 1].mean()
        assert morph_x > base_x + 5  # clearly to the right

        # half weight lands in between (linear blend)
        half = cover(np.full((1, 1), 0.5))
        half_x = np.argwhere(half)[:, 1].mean()
        assert base_x < half_x < morph_x

    def test_velocity_from_morph_animation(self):
        """A mesh animated only by morph weights (static matrices, static
        camera) must produce the correct nonzero screen velocity."""
        scene = Scene()
        box = scene.add(_morph_box(delta=(0.5, 0.0, 0.0)))
        box.set_matrix(translation(0, 0.5, 0))
        packed = scene.pack()
        cam = _camera().matrices()
        mm = scene.model_matrices()

        vel = rasterize_velocity(
            packed, mm, mm, cam.projection_view_matrix,
            cam.projection_view_matrix, 64, 64,
            morph_weights=jnp.asarray([[1.0]], jnp.float32),
            prev_morph_weights=jnp.asarray([[0.0]], jnp.float32),
        )
        v = np.asarray(vel.velocity)
        covered = np.asarray(vel.depth) < 1.0
        assert covered.any()
        vx = v[..., 0][covered]
        # moved +x in world -> +u in screen (u along width); velocity is
        # current - previous so it must be positive and non-trivial
        assert vx.mean() > 0.005
        assert (vx > 0).mean() > 0.95

        # no morph animation -> zero velocity
        vel0 = rasterize_velocity(
            packed, mm, mm, cam.projection_view_matrix,
            cam.projection_view_matrix, 64, 64,
            morph_weights=jnp.asarray([[1.0]], jnp.float32),
            prev_morph_weights=jnp.asarray([[1.0]], jnp.float32),
        )
        np.testing.assert_allclose(
            np.asarray(vel0.velocity), 0.0, atol=1e-5)


class TestMorphComposer:
    def test_traa_converges_after_morph_stops(self):
        scene = Scene()
        scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.6, 1.0))))
        box = scene.add(_morph_box(delta=(0.8, 0.0, 0.0)))
        box.set_matrix(translation(-0.4, 0.5, 0))
        cam = _camera(72, 72)
        composer = EffectComposer(scene, cam, 72, 72)
        composer.add_effect(TRAAEffect())

        # animate the morph for a few frames
        for f in range(4):
            box.set_morph_weights([f / 4.0])
            img = composer.render(dt=1 / 60)
        assert np.isfinite(np.asarray(img)).all()

        # hold: TRAA must converge (mean frame-to-frame change vanishes;
        # a handful of silhouette pixels keep shimmering under jitter —
        # count them rather than using max)
        box.set_morph_weights([1.0])
        prev = None
        means, flicker = [], []
        for _ in range(10):
            img = np.asarray(composer.render(dt=1 / 60))
            if prev is not None:
                d = np.abs(img - prev)
                means.append(d.mean())
                flicker.append((d > 0.1).sum())
            prev = img
        assert np.isfinite(img).all()
        assert means[-1] < 2e-3
        assert flicker[-1] < flicker[0]
