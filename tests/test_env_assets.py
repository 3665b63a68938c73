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
        v_prev = float(np.var(eq))
        for blur in (0.3, 0.6, 1.0):
            out = np.asarray(blur_env(eq, blur))
            assert float(np.var(out)) < v_prev
            v_prev = float(np.var(out))
            assert abs(float(out.mean()) - float(eq.mean())) < 0.02
        # full blur approaches the global mean image
        assert float(np.var(np.asarray(blur_env(eq, 1.0)))) < 0.01 * np.var(eq)
