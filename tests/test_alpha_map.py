"""Alpha-map stochastic transparency + the reference convergence law.

`GBufferMaterial.js:57-79`: alpha = opacity * alphaMap.g; on the first
still frame (cameraNotMovedFrames == 0) a hard 0.5 cut with no dither;
on later still frames a dither against
``mix(a, step(0.5, a), 1 / (cnmf*0.1 + 1))``.
"""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.composer import EffectComposer
from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.core.rng import blue_noise_image
from realism_effects_tpu.effects.traa import TRAAEffect
from realism_effects_tpu.scene.geometry import Material, make_plane
from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer
from realism_effects_tpu.scene.scene import Scene


def _half_alpha_tex(a_left=0.1, a_right=0.9, size=64):
    """RGBA texture whose *green* channel carries alpha (reference reads
    alphaMap.g, `GBufferMaterial.js:60`)."""
    tex = np.ones((size, size, 4), np.float32)
    tex[:, : size // 2, 1] = a_left
    tex[:, size // 2:, 1] = a_right
    return tex


def _overhead_scene(tex):
    scene = Scene()
    mat = Material(diffuse=(0.7, 0.7, 0.7, 1.0), alpha_map=tex)
    scene.add(make_plane(4, mat))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(0, 4, 0.01)
    cam.look_at((0, 0, 0))
    return scene, cam


class TestAlphaLaw:
    def _coverage(self, cnmf, h=96, w=96):
        tex = _half_alpha_tex()
        scene, cam = _overhead_scene(tex)
        packed = scene.pack()
        m = cam.matrices()
        dither = blue_noise_image(h, w, jnp.int32(7))[..., 0]
        gb = rasterize_gbuffer(
            packed, scene.model_matrices(), m.projection_view_matrix, h, w,
            dither=dither, cnmf=jnp.float32(cnmf),
        )
        covered = np.asarray(gb.depth) < 1.0
        mesh_px = np.asarray(gb.mesh_id)  # -1 background
        # plane region: central area where the plane projects
        # (u < 0.5 -> one half of the screen). Use screen halves.
        left = covered[:, : w // 2 - 4]
        right = covered[:, w // 2 + 4:]
        return left.mean(), right.mean(), covered

    def test_first_still_frame_hard_cut(self):
        left, right, covered = self._coverage(cnmf=0.0)
        # a=0.1 < 0.5 -> fully discarded; a=0.9 -> fully covered, no dither
        assert left < 0.02
        assert right > 0.55  # plane doesn't fill the whole half; but solid

    def test_still_frames_dither_toward_true_alpha(self):
        # cnmf=60: ramp = 1/7 -> a_soft ~ {0.086, 0.914}
        left, right, covered = self._coverage(cnmf=60.0)
        assert 0.02 < left < 0.20          # stochastic ~8.6% of plane area
        assert right < 0.98                # some right-half texels discarded
        # and intermediate cnmf is *harder* (closer to the step) than late
        left5, right5, _ = self._coverage(cnmf=1.0)
        assert left5 < left + 1e-6

    def test_material_alpha_multiplies_map(self):
        tex = _half_alpha_tex(1.0, 1.0)
        scene, cam = _overhead_scene(tex)
        scene.meshes[0].material.diffuse = (0.7, 0.7, 0.7, 0.3)
        packed = scene.pack()
        m = cam.matrices()
        h = w = 64
        dither = blue_noise_image(h, w, jnp.int32(3))[..., 0]
        gb = rasterize_gbuffer(
            packed, scene.model_matrices(), m.projection_view_matrix, h, w,
            dither=dither, cnmf=jnp.float32(100.0),
        )
        covered = np.asarray(gb.depth) < 1.0
        # combined alpha 0.3 * 1.0 -> sparse stochastic coverage
        frac = covered[24:40, 24:40].mean()
        assert 0.05 < frac < 0.6


class TestAlphaPeelDepth:
    """The depth-peel bound on alpha-map transparency (PARITY.md known
    deviations): pixels whose first ``alpha_peels`` candidate layers all
    dither out fall to background; raising ``alpha_peels`` resolves
    deeper stacks (the reference's in-shader discard,
    `GBufferMaterial.js:57-79`, has no such bound)."""

    def _stacked_scene(self):
        from realism_effects_tpu.scene.geometry import translation

        size = 32
        tex = np.ones((size, size, 4), np.float32)
        # central hole: alpha 0 -> always discarded (hard cut at cnmf=0)
        tex[8:24, 8:24, 1] = 0.0
        scene = Scene()
        floor = scene.add(make_plane(
            4, Material(diffuse=(0.2, 0.8, 0.2, 1.0))))
        for i in range(4):
            p = scene.add(make_plane(
                4, Material(diffuse=(0.7, 0.7, 0.7, 1.0), alpha_map=tex)))
            p.set_matrix(translation(0, 1.0 + 0.2 * i, 0))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 5, 0.01)
        cam.look_at((0, 0, 0))
        return scene, cam, floor

    def _render_ids(self, alpha_peels, h=64, w=64):
        scene, cam, floor = self._stacked_scene()
        packed = scene.pack()
        m = cam.matrices()
        dither = blue_noise_image(h, w, jnp.int32(11))[..., 0]
        gb = rasterize_gbuffer(
            packed, scene.model_matrices(), m.projection_view_matrix, h, w,
            dither=dither, cnmf=jnp.float32(0.0), alpha_peels=alpha_peels,
        )
        return np.asarray(gb.mesh_id), np.asarray(gb.depth)

    def test_four_overlaps_exceed_three_peels(self):
        """Pin the documented failure mode: 4 dithered-out layers over an
        opaque floor fall to background with the default 3 peels."""
        mesh_id, depth = self._render_ids(alpha_peels=3)
        hole = mesh_id[28:36, 28:36]
        assert (hole == -1).all()
        assert (depth[28:36, 28:36] >= 1.0).all()
        # outside the hole the top plane wins normally
        assert (mesh_id[4:10, 4:10] >= 1).any()

    def test_five_peels_resolve_the_stack(self):
        """alpha_peels is caller-settable: with 5 peels the floor behind
        the 4 discarded layers resolves correctly."""
        mesh_id, depth = self._render_ids(alpha_peels=5)
        hole = mesh_id[28:36, 28:36]
        assert (hole == 0).all()          # the opaque floor
        assert (depth[28:36, 28:36] < 1.0).all()

    def test_composer_alpha_peels_config(self):
        """EffectComposer(alpha_peels=...) reaches the rasterizer."""
        scene, cam, _ = self._stacked_scene()
        h = w = 48
        deep = EffectComposer(scene, cam, w, h, alpha_peels=5)
        img_deep = np.asarray(deep.render(dt=1 / 60))
        scene2, cam2, _ = self._stacked_scene()
        shallow = EffectComposer(scene2, cam2, w, h, alpha_peels=3)
        img_shallow = np.asarray(shallow.render(dt=1 / 60))
        # the hole shows the green floor only in the deep config
        hole_deep = img_deep[21:27, 21:27]
        hole_shallow = img_shallow[21:27, 21:27]
        assert hole_deep[..., 1].mean() > hole_shallow[..., 1].mean() + 0.02


class TestAlphaConvergence:
    def test_cutout_converges_under_traa(self):
        """A leaf-style cutout (binary alpha map) converges under TRAA to
        a stable image: surface where alpha=1, background where alpha=0."""
        size = 64
        tex = np.ones((size, size, 4), np.float32)
        yy, xx = np.mgrid[0:size, 0:size]
        hole = (xx - size / 2) ** 2 + (yy - size / 2) ** 2 < (size / 3) ** 2
        tex[..., 1] = np.where(hole, 1.0, 0.0)
        scene, cam = _overhead_scene(tex)
        h = w = 72
        composer = EffectComposer(scene, cam, h, w)
        composer.add_effect(TRAAEffect())
        prev = None
        for _ in range(10):
            img = np.asarray(composer.render(dt=1 / 60))
            d = None if prev is None else np.abs(img - prev)
            prev = img
        assert np.isfinite(img).all()
        # interiors converge exactly; cutout-edge pixels keep a bounded
        # ~10% oscillation because maxBlend=0.9 caps history weight
        # (`TRAAEffect.js:21-31`) — same as the reference under jitter
        center = d[h // 2 - 4: h // 2 + 4, w // 2 - 4: w // 2 + 4]
        corner = d[2:8, 2:8]
        assert center.max() < 2e-3
        assert corner.max() < 2e-3
        assert d.mean() < 0.03
        # the cutout is visible: center shows the plane, corner the bg
        center_px = img[h // 2 - 3: h // 2 + 3, w // 2 - 3: w // 2 + 3]
        corner_px = img[2:8, 2:8]
        assert np.abs(center_px.mean((0, 1)) - corner_px.mean((0, 1))).max() > 0.05
