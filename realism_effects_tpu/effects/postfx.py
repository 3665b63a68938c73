"""Companion post-FX: ACES tone mapping, bloom, vignette, 3D LUT.

The reference's demo composes realism-effects with four effects from the
``postprocessing`` package — its full stack is
``EffectPass(ssgi, toneMapping[ACES_FILMIC])`` → ``EffectPass(traa)`` →
``EffectPass(sharpness, vignette)`` → ``EffectPass(bloom, lut)``
(`/root/reference/example/main.js:510-539`, bloom/vignette configs at
`:465-476`, LUT loaded from ``lut_v2.3dl`` at `:510-512`). A user
switching from the reference needs those companions to reproduce the
same final frame, so the framework ships TPU-native equivalents:
pointwise jnp (tone map / vignette / LUT) and a mip-chain pyramid blur
(bloom) that XLA fuses into the surrounding stages.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.math3d import mix, smoothstep, uv_grid
from ..core.sampling import build_mip_chain, sample_bilinear
from .base import Effect

# three.js ACESFilmicToneMapping (tonemapping_pars_fragment.glsl.js):
# RRT/ODT fit by Stephen Hill. GLSL mat3 ctors are column-major; these
# are the row-major equivalents.
_ACES_INPUT = np.array([
    [0.59719, 0.35458, 0.04823],
    [0.07600, 0.90834, 0.01566],
    [0.02840, 0.13383, 0.83777],
], np.float32)
_ACES_OUTPUT = np.array([
    [1.60475, -0.53108, -0.07367],
    [-0.10208, 1.10813, -0.00605],
    [-0.00327, -0.07276, 1.07602],
], np.float32)


def _mat3_apply(m: np.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    # explicit per-channel weighted sums instead of (H,W,3)@(3,3): TPU
    # f32 matmul defaults to bf16 (CLAUDE.md rule 5) and the lost
    # mantissa bits band smooth tone-mapped gradients
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack(
        [m[0, 0] * r + m[0, 1] * g + m[0, 2] * b,
         m[1, 0] * r + m[1, 1] * g + m[1, 2] * b,
         m[2, 0] * r + m[2, 1] * g + m[2, 2] * b], axis=-1)


def aces_filmic(color: jnp.ndarray, exposure: float = 1.0) -> jnp.ndarray:
    """three.js ``ACESFilmicToneMapping`` (the postprocessing
    ``ToneMappingMode.ACES_FILMIC`` path the reference demo selects at
    `main.js:513-514`)."""
    c = color * (exposure / 0.6)
    c = _mat3_apply(_ACES_INPUT, c)
    a = c * (c + 0.0245786) - 0.000090537
    b = c * (0.983729 * c + 0.4329510) + 0.238081
    c = _mat3_apply(_ACES_OUTPUT, a / b)
    return jnp.clip(c, 0.0, 1.0)


class ToneMappingEffect(Effect):
    """ACES-filmic tone mapping stage (`main.js:513-514`). Place it where
    the reference does — after GI, before the LDR finishing chain. When
    present, save frames with ``save_frame(..., tonemap=False)``."""

    name = "tonemapping"

    def __init__(self, exposure: float = 1.0):
        self.exposure = exposure

    def uniforms(self):
        return {"exposure": float(self.exposure)}

    def apply(self, ctx, color, state):
        return aces_filmic(color, ctx.params[self.name]["exposure"]), state


class VignetteEffect(Effect):
    """Radial darkening, postprocessing's default (non-Eskil) technique:
    ``color * smoothstep(0.8, offset * 0.799, d * (darkness + offset))``
    (the reference demo uses darkness 0.8, offset 0.3,
    `main.js:473-476`)."""

    name = "vignette"

    def __init__(self, offset: float = 0.3, darkness: float = 0.8):
        self.offset = offset
        self.darkness = darkness

    def uniforms(self):
        return {"offset": float(self.offset),
                "darkness": float(self.darkness)}

    def apply(self, ctx, color, state):
        u = ctx.params[self.name]
        uv = uv_grid(*color.shape[:2])
        d = jnp.linalg.norm(uv - 0.5, axis=-1)
        f = smoothstep(0.8, u["offset"] * 0.799,
                       d * (u["darkness"] + u["offset"]))
        return color * f[..., None], state


class BloomEffect(Effect):
    """Luminance-thresholded pyramid (mipmap) bloom.

    The postprocessing ``BloomEffect({mipmapBlur: true})`` the demo adds
    (`main.js:465-471`): a luminance soft-knee prefilter
    (``smoothstep(threshold, threshold + smoothing, l)``), a downsample
    pyramid, and progressive tent upsampling blended by ``radius``
    (postprocessing's UpsamplingMaterial: ``mix(base, up, radius)``),
    added back scaled by ``intensity``. ``levels`` is static (retraces).
    """

    name = "bloom"

    def __init__(self, intensity: float = 1.0,
                 luminance_threshold: float = 0.75,
                 luminance_smoothing: float = 0.5,
                 radius: float = 0.85, levels: int = 8):
        self.intensity = intensity
        self.luminance_threshold = luminance_threshold
        self.luminance_smoothing = luminance_smoothing
        self.radius = radius
        self.levels = levels

    def uniforms(self):
        return {
            "intensity": float(self.intensity),
            "threshold": float(self.luminance_threshold),
            "smoothing": float(self.luminance_smoothing),
            "radius": float(self.radius),
        }

    def static_key(self):
        return ("levels", self.levels)

    def apply(self, ctx, color, state):
        u = ctx.params[self.name]
        # postprocessing's LuminanceMaterial: relative luminance +
        # smoothstep soft knee
        lum = (color[..., 0] * 0.2126 + color[..., 1] * 0.7152
               + color[..., 2] * 0.0722)
        gate = smoothstep(u["threshold"], u["threshold"] + u["smoothing"],
                          lum)
        mips = build_mip_chain(color * gate[..., None],
                               max_levels=self.levels)
        # progressive upsample: coarsest first, tent-blended by radius
        acc = mips[-1]
        for level in mips[-2::-1]:
            h, w = level.shape[:2]
            uv = uv_grid(h, w)
            acc = mix(level, sample_bilinear(acc, uv), u["radius"])
        return color + acc * u["intensity"], state


def load_lut_3dl(path: str) -> np.ndarray:
    """Parse an Autodesk .3dl LUT into an (S, S, S, 3) float32 cube in
    [0, 1], indexed ``lut[r, g, b]``.

    Format (matching the ``LUT3dlLoader`` the demo feeds with
    ``lut_v2.3dl``, `main.js:510-512`): '#' comments, one line of S
    input-grid breakpoints, then S^3 ``R G B`` output rows with **blue
    varying fastest**, values in the 12-bit 0..4095 domain."""
    rows = []
    grid = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = line.split()
            if grid is None:
                grid = np.asarray(vals, np.float32)
                continue
            rows.append(vals)
    size = len(grid)
    if len(rows) != size ** 3:
        raise ValueError(
            f"3dl: expected {size ** 3} entries, found {len(rows)}")
    data = np.asarray(rows, np.float32) / 4095.0
    return data.reshape(size, size, size, 3)


class LUT3DEffect(Effect):
    """3D color-grading LUT (postprocessing ``LUT3DEffect`` analog,
    `main.js:510-512`). Applies in the tone-mapped [0, 1] domain, so
    place it after :class:`ToneMappingEffect` like the reference's final
    ``EffectPass(bloom, lut)``. Trilinear fetch from the (S, S, S, 3)
    cube (the reference converts the LUT to half floats for a
    ``Data3DTexture`` with linear filtering)."""

    name = "lut"

    def __init__(self, lut: np.ndarray):
        self.lut = np.asarray(lut, np.float32)

    def static_key(self):
        return ("size", self.lut.shape[0])

    def apply(self, ctx, color, state):
        lut = jnp.asarray(self.lut)  # (S, S, S, 3) numpy closure constant
        s = self.lut.shape[0]
        flat = lut.reshape(-1, 3)
        c = jnp.clip(color, 0.0, 1.0) * (s - 1)
        lo = jnp.floor(c).astype(jnp.int32)
        lo = jnp.minimum(lo, s - 2)
        f = c - lo

        def fetch(dr, dg, db):
            idx = ((lo[..., 0] + dr) * s + (lo[..., 1] + dg)) * s \
                + (lo[..., 2] + db)
            return flat[idx.reshape(-1)].reshape(color.shape)

        c00 = mix(fetch(0, 0, 0), fetch(1, 0, 0), f[..., 0:1])
        c10 = mix(fetch(0, 1, 0), fetch(1, 1, 0), f[..., 0:1])
        c01 = mix(fetch(0, 0, 1), fetch(1, 0, 1), f[..., 0:1])
        c11 = mix(fetch(0, 1, 1), fetch(1, 1, 1), f[..., 0:1])
        c0 = mix(c00, c10, f[..., 1:2])
        c1 = mix(c01, c11, f[..., 1:2])
        return mix(c0, c1, f[..., 2:3]), state
