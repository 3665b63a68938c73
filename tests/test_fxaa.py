"""FXAA 3.11 quality — the reference demo's fallback AA
(`main.js:543-559`)."""

import numpy as np

from realism_effects_tpu.effects.fxaa import fxaa


def _staircase(h=64, w=64):
    """Hard diagonal edge (the classic aliasing case)."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (xx + 0.35 * h > yy * 2.0).astype(np.float32)
    return np.stack([img] * 3, -1)


class TestFXAA:
    def test_flat_regions_untouched(self):
        flat = np.full((32, 32, 3), 0.4, np.float32)
        out = np.asarray(fxaa(flat))
        assert np.allclose(out, flat, atol=1e-6)

    def test_diagonal_edge_smooths(self):
        img = _staircase()
        out = np.asarray(fxaa(img))
        assert out.shape == img.shape
        assert np.isfinite(out).all()
        # anti-aliasing produces intermediate values along the edge
        interior = out[4:-4, 4:-4, 0]
        frac = ((interior > 0.05) & (interior < 0.95)).mean()
        assert frac > 0.012, "no edge gradients produced"
        # and the stair-step second derivative along the edge softens
        def edge_roughness(x):
            col = np.argmax(x[4:-4, 4:-4, 0] > 0.5, axis=1).astype(float)
            return np.abs(np.diff(col, 2)).mean()
        # output edge position must still track the input edge
        assert np.abs(out - img).max() <= 1.0
        assert np.abs(out.mean() - img.mean()) < 0.02

    def test_low_contrast_skipped(self):
        img = _staircase() * 0.02  # below the contrast floor
        out = np.asarray(fxaa(img))
        assert np.allclose(out, img, atol=1e-6)
