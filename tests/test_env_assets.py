"""Cube-map directory loading + fixed-level env blur.

Covers `load_cubemap` (CubeTextureLoader + CubeToEquirectEnvPass analog,
`CubeToEquirectEnvPass.js:59-99`) and `blur_env`
(`example/BlurredEnvMapGenerator.js:310-358` analog).
"""

import os

import numpy as np
import pytest
from PIL import Image

from realism_effects_tpu.core.envmap import (
    CUBE_FACE_NAMES, blur_env, equirect_to_cube, load_cubemap,
)

REF_CUBE = "/root/reference/example/public/cubemap/yokohama_3"


def _write_face_pngs(tmp_path, faces):
    """Store (6, S, S, 3) linear faces as sRGB PNGs in file-row order."""
    for name, face in zip(CUBE_FACE_NAMES, faces):
        srgb = np.where(face <= 0.0031308, face * 12.92,
                        1.055 * np.clip(face, 0, 1) ** (1 / 2.4) - 0.055)
        arr = (np.clip(srgb, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(str(tmp_path), f"{name}.png"))


class TestLoadCubemap:
    def test_round_trip_through_equirect(self, tmp_path):
        """equirect -> cube faces -> PNG dir -> load_cubemap recovers the
        original panorama (away from face seams / poles)."""
        h, w = 64, 128
        v, u = np.meshgrid(np.linspace(0, 1, h, endpoint=False),
                           np.linspace(0, 1, w, endpoint=False),
                           indexing="ij")
        # smooth low-frequency pattern (8-bit PNG quantization tolerant)
        eq = np.stack([
            0.5 + 0.4 * np.sin(2 * np.pi * u),
            0.5 + 0.4 * np.cos(np.pi * v),
            0.5 + 0.3 * np.sin(2 * np.pi * (u + v)),
        ], -1).astype(np.float32)
        faces = np.asarray(equirect_to_cube(eq, 64))
        _write_face_pngs(tmp_path, faces)
        back = np.asarray(load_cubemap(str(tmp_path), height=h))
        assert back.shape == (h, 2 * h, 3)
        # compare the interior band (poles distort under cube sampling)
        band = slice(h // 4, 3 * h // 4)
        err = np.abs(back[band] - eq[band, : 2 * h])
        assert np.median(err) < 0.02
        assert err.mean() < 0.05

    @pytest.mark.skipif(not os.path.isdir(REF_CUBE),
                        reason="reference absent")
    def test_reference_yokohama_loads(self):
        eq = np.asarray(load_cubemap(REF_CUBE))
        assert eq.shape[1] == 2 * eq.shape[0]
        assert np.isfinite(eq).all() and eq.max() > 0.01
        # night scene: upper half (sky) darker than the lit plaza floor
        h = eq.shape[0]
        assert eq[: h // 3].mean() < eq[2 * h // 3:].mean()

    def test_missing_face_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_cubemap(str(tmp_path))


class TestBlurEnv:
    def test_blur_zero_is_identity(self):
        rng = np.random.default_rng(5)
        eq = rng.uniform(size=(32, 64, 3)).astype(np.float32)
        out = np.asarray(blur_env(eq, 0.0))
        assert np.allclose(out, eq, atol=1e-6)

    def test_blur_reduces_variance_preserves_mean(self):
        rng = np.random.default_rng(6)
        eq = rng.uniform(size=(32, 64, 3)).astype(np.float32)
        v0 = float(np.var(eq))
        for blur in (0.3, 0.6, 1.0):
            out = np.asarray(blur_env(eq, blur))
            # strongly smoothed vs the input (the GGX estimator has an
            # MC noise floor, so consecutive levels need not be strictly
            # monotone on white-noise input)
            assert float(np.var(out)) < 0.05 * v0
            assert abs(float(out.mean()) - float(eq.mean())) < 0.02
        # full blur approaches the global mean image
        assert float(np.var(np.asarray(blur_env(eq, 1.0)))) < 0.01 * v0


class TestGGXPrefilter:
    """The PMREM-equivalent roughness chain (`ggx_prefilter_mips`,
    matching `example/BlurredEnvMapGenerator.js:310-358` semantics)."""

    def _impulse_response(self, level):
        """Prefilter a single bright equator disk; return (gamma, lum)
        sorted by angle from the impulse direction, plus the level's
        roughness."""
        import jax.numpy as jnp

        from realism_effects_tpu.core.envmap import (
            equirect_uv_to_direction, ggx_prefilter_mips,
        )

        h, w = 64, 128
        eq = np.zeros((h, w, 3), np.float32)
        eq[30:34, 62:66] = 100.0          # small disk at the equator
        mips = ggx_prefilter_mips(jnp.asarray(eq))
        m = np.asarray(mips[level])
        mh, mw = m.shape[:2]
        v, u = np.meshgrid((np.arange(mh) + 0.5) / mh,
                           (np.arange(mw) + 0.5) / mw, indexing="ij")
        d = np.asarray(equirect_uv_to_direction(
            jnp.asarray(np.stack([u, v], -1), jnp.float32)))
        s = np.asarray(equirect_uv_to_direction(
            jnp.asarray([[64.0 / w, 32.0 / h]], jnp.float32)))[0]
        gamma = np.arccos(np.clip((d * s).sum(-1), -1, 1))
        lum = m.mean(-1)
        # solid-angle weights for energy integrals
        sin_t = np.sin((1.0 - v) * np.pi)
        return gamma.ravel(), (lum * sin_t).ravel(), level / (len(mips) - 1)

    def test_lobe_width_matches_ggx(self):
        """The angle containing half the prefiltered impulse energy
        tracks the analytic GGX lobe: the median half-vector angle of
        the GGX NDF is atan(alpha) (from inverting cos^2 =
        (1-xi)/(1+(a^2-1)xi) at xi = 1/2), so the median *light* angle
        is ~2*atan(alpha)."""
        for level in (2, 3):
            gamma, energy, roughness = self._impulse_response(level)
            order = np.argsort(gamma)
            cum = np.cumsum(energy[order])
            half_angle = gamma[order][np.searchsorted(cum, 0.5 * cum[-1])]
            alpha = roughness ** 2
            predicted = 2.0 * np.arctan(alpha)
            # finite texels + n.l weighting skew the estimate; require
            # the right scale, not exact equality
            assert 0.4 * predicted < half_angle < 1.8 * predicted, (
                level, half_angle, predicted)

    def test_energy_conserved_across_levels(self):
        """The split-sum kernel is normalized: solid-angle-weighted
        energy is preserved level to level."""
        g0, e0, _ = self._impulse_response(0)
        for level in (1, 2, 3):
            _, e, _ = self._impulse_response(level)
            # levels halve resolution; compare mean energy density
            assert abs(e.mean() - e0.mean()) / e0.mean() < 0.25, level

    def test_levels_monotonically_spread(self):
        prev_peak = None
        for level in (1, 2, 3):
            _, e, _ = self._impulse_response(level)
            peak = e.max()
            if prev_peak is not None:
                assert peak < prev_peak
            prev_peak = peak
