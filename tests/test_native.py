"""Native C++ envcdf library vs the numpy reference implementation."""

import numpy as np
import pytest

from realism_effects_tpu import native
from realism_effects_tpu.core.envmap import procedural_sky


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native toolchain unavailable")


class TestNativeEnvCDF:
    def test_matches_numpy_reference(self, lib_available):
        sky = procedural_sky(64, 128, sun_intensity=50.0)
        res = native.build_equirect_cdf(sky)
        assert res is not None
        marginal, conditional, total = res

        # numpy reference (mirrors core/envmap.build_equirect_env fallback)
        lum = (0.2125 * sky[..., 0] + 0.7154 * sky[..., 1]
               + 0.0721 * sky[..., 2]).astype(np.float64)
        h, w = lum.shape
        row_sums = lum.sum(1)
        tot = lum.sum()
        cdf_cond = np.cumsum(lum, 1) / np.where(row_sums > 0, row_sums, 1)[:, None]
        cdf_marg = np.cumsum(row_sums) / tot
        targets = (np.arange(h) + 1.0) / h
        rows = np.searchsorted(cdf_marg, targets)
        marg_ref = (np.clip(rows, 0, h - 1) + 0.5) / h
        targets_x = (np.arange(w) + 1.0) / w
        cond_ref = np.empty((h, w))
        for y in range(h):
            cond_ref[y] = (np.clip(
                np.searchsorted(cdf_cond[y], targets_x), 0, w - 1) + 0.5) / w

        assert abs(total - tot) / tot < 1e-5
        np.testing.assert_allclose(marginal, marg_ref, atol=1e-6)
        # cumulative float ordering may differ by one texel at cdf plateaus
        assert (np.abs(conditional - cond_ref) <= (1.0 / w + 1e-6)).mean() > 0.999

    def test_half_to_float(self, lib_available):
        rng = np.random.default_rng(0)
        f = rng.uniform(-1000, 1000, 4096).astype(np.float16)
        bits = f.view(np.uint16)
        out = native.half_to_float(bits)
        np.testing.assert_allclose(out, f.astype(np.float32), rtol=1e-3)

    def test_half_to_float_specials(self, lib_available):
        vals = np.array([0.0, -0.0, np.inf, -np.inf, 6.1e-5, 5.96e-8],
                        np.float16)
        out = native.half_to_float(vals.view(np.uint16))
        ref = vals.astype(np.float32)
        np.testing.assert_allclose(out[:2], ref[:2])
        assert np.isposinf(out[2]) and np.isneginf(out[3])
        np.testing.assert_allclose(out[4:], ref[4:], rtol=1e-3)

    def test_env_build_uses_native(self, lib_available):
        from realism_effects_tpu.core.envmap import build_equirect_env
        env = build_equirect_env(procedural_sky(32, 64))
        assert env.marginal.shape == (32,)
        assert env.conditional.shape == (32, 64)
