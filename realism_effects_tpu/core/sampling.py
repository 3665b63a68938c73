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

import jax
import jax.numpy as jnp


def _gather2d(tex: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Clamped integer gather from (H, W[, C]).

    Plain XLA gathers run at full speed on this target for every table
    size measured (a one-hot-matmul variant was tried for small tables
    and removed: the bf16 MXU path rounds table values).
    """
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


class MipAtlas:
    """All mip levels of an image flattened into ONE array.

    TPU-native replacement for per-level texture objects: per-pixel
    trilinear mip sampling becomes pure index arithmetic + taps into a
    single flat table (the gather pattern XLA handles at full speed),
    instead of an unrolled blend over every level.

    Per-level (offset, h, w) are static aux data taken from the *actual*
    chain shapes (floor halving can drift from the pow-2 closed form for
    non-power-of-two images), selected per pixel with a short where-chain.
    """

    def __init__(self, data: jnp.ndarray, shapes: tuple):
        self.data = data          # (N, C) flat texels, level-major
        self.shapes = shapes      # ((off, h, w) per level), static

    @property
    def levels(self) -> int:
        return len(self.shapes)

    def tree_flatten(self):
        return (self.data,), (self.shapes,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


jax.tree_util.register_pytree_node(
    MipAtlas, MipAtlas.tree_flatten, MipAtlas.tree_unflatten
)


def build_mip_atlas(tex: jnp.ndarray) -> MipAtlas:
    """Build the flat atlas from an (H, W, C) base image."""
    mips = build_mip_chain(tex)
    c = tex.shape[2] if tex.ndim == 3 else 1
    flat = jnp.concatenate([m.reshape(-1, c) for m in mips], axis=0)
    shapes = []
    off = 0
    for m in mips:
        shapes.append((off, m.shape[0], m.shape[1]))
        off += m.shape[0] * m.shape[1]
    return MipAtlas(flat, tuple(shapes))


def _atlas_level_params(atlas: MipAtlas, l: jnp.ndarray):
    """(offset, h_l, w_l) for per-pixel float level indices ``l``.

    Selected from the static per-level table with a where-chain (one
    select per level — cheap VPU work, no gathers)."""
    offset = jnp.zeros_like(l)
    h_l = jnp.ones_like(l)
    w_l = jnp.ones_like(l)
    for k, (off, h, w) in enumerate(atlas.shapes):
        is_k = l == float(k)
        offset = jnp.where(is_k, float(off), offset)
        h_l = jnp.where(is_k, float(h), h_l)
        w_l = jnp.where(is_k, float(w), w_l)
    return offset, h_l, w_l


def _atlas_bilinear(atlas: MipAtlas, uv: jnp.ndarray, l: jnp.ndarray):
    """Bilinear fetch at integer level ``l`` (float-typed, per pixel)."""
    offset, h_l, w_l = _atlas_level_params(atlas, l)
    x = uv[..., 0] * w_l - 0.5
    y = uv[..., 1] * h_l - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def tap(yy, xx):
        yy = jnp.clip(yy, 0.0, h_l - 1.0)
        xx = jnp.clip(xx, 0.0, w_l - 1.0)
        idx = (offset + yy * w_l + xx).astype(jnp.int32)
        return atlas.data[idx]

    c00 = tap(y0, x0)
    c01 = tap(y0, x0 + 1.0)
    c10 = tap(y0 + 1.0, x0)
    c11 = tap(y0 + 1.0, x0 + 1.0)
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def sample_mip_atlas(atlas: MipAtlas, uv: jnp.ndarray, lod) -> jnp.ndarray:
    """Trilinear fetch at per-pixel fractional ``lod`` from the atlas."""
    lod = jnp.clip(
        jnp.broadcast_to(jnp.asarray(lod, jnp.float32), uv.shape[:-1]),
        0.0, atlas.levels - 1,
    )
    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]
    a = _atlas_bilinear(atlas, uv, l0)
    b = _atlas_bilinear(atlas, uv, jnp.minimum(l0 + 1.0, atlas.levels - 1.0))
    return a + (b - a) * frac


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
