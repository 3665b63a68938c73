"""SMAA 1x tests (effects/smaa.py).

The reference demo's AA switcher includes ``POSTPROCESSING.SMAAEffect``
(`/root/reference/example/main.js:116-154,709-746`); this implementation
computes the area-texture integrals analytically, so the tests pin it
against the ground truth those integrals encode: analytic coverage
antialiasing of straight silhouettes.
"""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.effects.smaa import smaa


def _halfplane(h, w, y0, slope):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64) + 0.5
    f = yy - (y0 + xx * slope)
    binary = (f > 0).astype(np.float32)
    coverage = np.clip(f / np.sqrt(1 + slope * slope) + 0.5, 0, 1)
    return (np.repeat(binary[..., None], 3, -1),
            np.repeat(coverage[..., None].astype(np.float32), 3, -1))


class TestSMAA:
    def test_shallow_edge_matches_coverage(self):
        """A slope-1/8 staircase revectorizes to the analytic coverage
        gradient (the Z-pattern path): error to ground truth drops by
        >5x vs the aliased input."""
        img, cov = _halfplane(64, 64, 20.0, 1 / 8)
        out = np.asarray(smaa(jnp.asarray(img)))
        err_in = np.abs(img - cov).mean()
        err_out = np.abs(out - cov).mean()
        assert err_out < 0.2 * err_in

    def test_steep_edge_transposed(self):
        """Same for a near-vertical edge (vertical-boundary path)."""
        img, cov = _halfplane(64, 64, 20.0, 1 / 8)
        img_t = np.transpose(img, (1, 0, 2)).copy()
        cov_t = np.transpose(cov, (1, 0, 2)).copy()
        out = np.asarray(smaa(jnp.asarray(img_t)))
        err_in = np.abs(img_t - cov_t).mean()
        err_out = np.abs(out - cov_t).mean()
        assert err_out < 0.2 * err_in

    def test_interiors_untouched(self):
        img, _ = _halfplane(64, 64, 32.0, 1 / 16)
        out = np.asarray(smaa(jnp.asarray(img)))
        assert np.abs(out[:16] - img[:16]).max() < 1e-6
        assert np.abs(out[-16:] - img[-16:]).max() < 1e-6

    def test_flat_image_identity(self):
        img = np.full((32, 32, 3), 0.3, np.float32)
        out = np.asarray(smaa(jnp.asarray(img)))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_noise_below_threshold_untouched(self):
        """Contrast below SMAA_THRESHOLD (0.1) must not trigger edges."""
        rng = np.random.default_rng(3)
        # uniform +-0.04 -> max neighbor delta 0.08 < threshold 0.1
        img = (0.5 + rng.uniform(-0.04, 0.04, (48, 48, 1))).astype(
            np.float32)
        img = np.repeat(img, 3, -1)
        out = np.asarray(smaa(jnp.asarray(img)))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_single_step_l_pattern(self):
        """An isolated one-pixel step (L pattern) blends toward the
        step corner and tapers to the run midpoint."""
        h = w = 32
        img = np.zeros((h, w, 3), np.float32)
        img[16:, :] = 1.0
        img[15:, :8] = 1.0    # one-pixel step at x=8
        out = np.asarray(smaa(jnp.asarray(img)))
        # pixels near the corner get blended, far along the run less
        d = np.abs(out - img).max(-1)
        assert d[15, 9] > d[15, 14] > 0.0 or d[16, 9] > d[16, 14] > 0.0

    def test_demo_integration(self):
        """SMAAEffect runs inside the composer chain."""
        from realism_effects_tpu import SMAAEffect
        from realism_effects_tpu.composer import EffectComposer
        from realism_effects_tpu.core.camera import PerspectiveCamera
        from realism_effects_tpu.scene.geometry import (
            Material, make_box, make_plane, translation,
        )
        from realism_effects_tpu.scene.scene import Scene

        scene = Scene()
        scene.add(make_plane(10, Material(diffuse=(0.6, 0.6, 0.6, 1.0))))
        b = scene.add(make_box((1, 1, 1),
                               Material(diffuse=(0.9, 0.2, 0.2, 1.0))))
        b.set_matrix(translation(0, 0.5, 0))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(2.5, 2, 3)
        cam.look_at((0, 0.5, 0))
        composer = EffectComposer(scene, cam, 64, 64)
        composer.add_effect(SMAAEffect())
        img = np.asarray(composer.render(dt=1 / 60))
        assert np.isfinite(img).all()
        assert img.max() > 0.05


class TestSMAADiagonal:
    """The diagonal pass: 45-degree staircases (which produce zero
    blending from the orthogonal patterns) revectorize to the midline."""

    def _diag(self, base, slope=1.0, h=64, w=64):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64) + 0.5
        f = yy - (base + xx * slope)
        binary = (f > 0).astype(np.float32)
        cov = np.clip(f / np.sqrt(1 + slope * slope) + 0.5, 0, 1)
        img = np.repeat(binary[..., None], 3, -1)
        covi = np.repeat(cov.astype(np.float32)[..., None], 3, -1)
        out = np.asarray(smaa(jnp.asarray(img)))
        e_in = np.abs(img - covi).mean()
        return np.abs(out - covi).mean() / e_in

    def test_midline_diagonal_exact(self):
        """A 45-degree edge exactly on the midline of its rasterization
        reconstructs to analytic coverage (error ~0)."""
        assert self._diag(16.5) < 0.05
        assert self._diag(48.5, slope=-1.0) < 0.1  # mirrored direction

    def test_mean_improvement_over_offsets(self):
        """Averaged over rasterization-consistent sub-pixel offsets the
        diagonal pass cuts error vs the aliased input (the symmetric
        treatment's information-theoretic best is ~0.66)."""
        ratios = [self._diag(b) for b in (16.2, 16.35, 16.5, 16.65, 16.8)]
        assert np.mean(ratios) < 0.8, ratios

    def test_isolated_steps_not_misfired(self):
        """Shallow staircases (single diagonal units at step corners,
        chain length 1) must stay on the orthogonal path."""
        r = self._diag(20.0, slope=1 / 8)
        assert r < 0.2  # the orthogonal pass handles these well
