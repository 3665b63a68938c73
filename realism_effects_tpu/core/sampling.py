"""Image sampling library: the TPU replacement for GLSL texture fetches.

Every ``textureLod`` / ``texelFetch`` in the reference shaders becomes one
of these gather helpers over ``(H, W, C)`` arrays. uv is in [0, 1]^2 with
u along width; addressing is clamp-to-edge like three.js render targets.

- :func:`sample_nearest`  — ``texelFetch`` / NearestFilter
- :func:`sample_bilinear` — ``textureLod(tex, uv, 0.)`` with LinearFilter
- :func:`sample_catmull_rom_5tap` — the TAA history filter
  (`/root/reference/src/temporal-reproject/shader/reproject.frag:212-255`)
- :func:`sample_bilinear_mip` — trilinear fetch from an explicit mip chain
  (env-map ``textureLod`` with lod > 0, `ssgi_utils.frag:90-92`)

These lower to XLA gathers; hot call sites can later swap in Pallas
variants without changing callers.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather2d(tex: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Clamped integer gather from (H, W[, C])."""
    h, w = tex.shape[0], tex.shape[1]
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    return tex[iy, ix]


def sample_nearest(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor fetch. uv (..., 2) -> (..., C) (or scalar maps)."""
    h, w = tex.shape[0], tex.shape[1]
    ix = jnp.floor(uv[..., 0] * w).astype(jnp.int32)
    iy = jnp.floor(uv[..., 1] * h).astype(jnp.int32)
    return _gather2d(tex, iy, ix)


def texel_fetch(tex: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Integer-coordinate fetch with clamp (GLSL ``texelFetch`` + clamp)."""
    return _gather2d(tex, iy, ix)


def sample_bilinear(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear fetch with clamp-to-edge, matching GL LinearFilter."""
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    c00 = _gather2d(tex, y0, x0)
    c01 = _gather2d(tex, y0, x0 + 1)
    c10 = _gather2d(tex, y0 + 1, x0)
    c11 = _gather2d(tex, y0 + 1, x0 + 1)

    if tex.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def sample_catmull_rom_5tap(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """5-tap bicubic Catmull-Rom (`reproject.frag:212-255`).

    Used to sample the temporal history with less blur than bilinear.
    Result is clamped to >= 0 like the reference.
    """
    h, w = tex.shape[0], tex.shape[1]
    size = jnp.array([w, h], jnp.float32)
    inv_size = 1.0 / size

    pix = uv * size
    tc = jnp.floor(pix - 0.5) + 0.5
    f = pix - tc
    f2 = f * f
    f3 = f2 * f

    w0 = f2 - 0.5 * (f3 + f)
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w3 = 0.5 * (f3 - f2)
    w2 = 1.0 - w0 - w1 - w3

    weight0 = w0
    weight1 = w1 + w2
    weight2 = w3

    sample0 = (tc - 1.0) * inv_size
    sample1 = (tc + w2 / weight1) * inv_size
    sample2 = (tc + 2.0) * inv_size

    sw0 = weight1[..., 0] * weight0[..., 1]
    sw1 = weight0[..., 0] * weight1[..., 1]
    sw2 = weight1[..., 0] * weight1[..., 1]
    sw3 = weight2[..., 0] * weight1[..., 1]
    sw4 = weight1[..., 0] * weight2[..., 1]

    def tap(ux, uy):
        return sample_bilinear(tex, jnp.stack([ux, uy], axis=-1))

    expand = (lambda a: a[..., None]) if tex.ndim == 3 else (lambda a: a)
    acc = tap(sample1[..., 0], sample0[..., 1]) * expand(sw0)
    acc += tap(sample0[..., 0], sample1[..., 1]) * expand(sw1)
    acc += tap(sample1[..., 0], sample1[..., 1]) * expand(sw2)
    acc += tap(sample2[..., 0], sample1[..., 1]) * expand(sw3)
    acc += tap(sample1[..., 0], sample2[..., 1]) * expand(sw4)

    total = sw0 + sw1 + sw2 + sw3 + sw4
    return jnp.maximum(acc * expand(1.0 / total), 0.0)


def build_mip_chain(tex: jnp.ndarray, max_levels: int | None = None) -> list[jnp.ndarray]:
    """Successive 2x2 box-filter downsamples (GL mipmap generation)."""
    mips = [tex]
    h, w = tex.shape[0], tex.shape[1]
    while h > 1 and w > 1 and (max_levels is None or len(mips) < max_levels):
        h2, w2 = h // 2, w // 2
        cur = mips[-1][: h2 * 2, : w2 * 2]
        if tex.ndim == 3:
            cur = cur.reshape(h2, 2, w2, 2, tex.shape[2]).mean(axis=(1, 3))
        else:
            cur = cur.reshape(h2, 2, w2, 2).mean(axis=(1, 3))
        mips.append(cur)
        h, w = h2, w2
    return mips


def sample_bilinear_mip(mips: list[jnp.ndarray], uv: jnp.ndarray, lod) -> jnp.ndarray:
    """Trilinear fetch from an explicit mip chain at fractional ``lod``.

    ``lod`` may be a traced array broadcastable to uv[..., 0]. The chain
    length is static, so this unrolls into ``len(mips)`` bilinear fetches
    blended by per-pixel weights (TPU-friendly: no data-dependent control
    flow).
    """
    n = len(mips)
    lod = jnp.clip(jnp.asarray(lod, jnp.float32), 0.0, n - 1)
    lod0 = jnp.floor(lod)
    frac = lod - lod0
    out = None
    expand = (lambda a: a[..., None]) if mips[0].ndim == 3 else (lambda a: a)
    for i, mip in enumerate(mips):
        # weight of level i in the trilinear blend
        wgt = jnp.where(
            lod0 == i, 1.0 - frac, jnp.where(lod0 == i - 1, frac, 0.0)
        )
        contrib = sample_bilinear(mip, uv) * expand(wgt)
        out = contrib if out is None else out + contrib
    return out
