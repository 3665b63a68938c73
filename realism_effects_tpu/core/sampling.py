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

Performance model (measured on TPU v5e through XLA): a gather is priced
per *index*, ~10 ns each at 1080p (2M indices), with the payload free up
to ~32 bytes per index (8 f32 channels). Four separate corner fetches for
one bilinear tap therefore cost 4x what they need to. The fix used
throughout this module is **neighbor packing**: shift-and-concat the
texture's 2x2 neighborhood into channels once (pure VPU work, amortized
across every tap into the same texture by XLA CSE), then fetch each
bilinear tap with ONE gather:

- C <= 2 channels -> quad pack (H, W, 4C): 1 gather per tap
- C <= 4 channels -> vertical pair pack (H, W, 2C): 2 gathers per tap
- wider           -> plain 4-corner gathers

``lax.gather`` with 2D ``slice_sizes`` was measured 200x slower than this
(pathological lowering) and row gathers from flat ``(N, C)`` tables 6x
slower than ``tex[y, x]`` on ``(H, W, C)`` — hence the layouts below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather2d(tex: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Clamped integer gather from (H, W[, C]).

    Single-channel maps flatten to a 1-D table (the fastest measured
    pattern); multi-channel maps use ``tex[y, x]`` on (H, W, C), whose
    payload rides free up to 8 f32 channels.
    """
    h, w = tex.shape[0], tex.shape[1]
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    if tex.ndim == 2:
        return tex.reshape(-1)[iy * w + ix]
    return tex[iy, ix]


def _pack_pair(tex: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H, W, 2C): [self, down-neighbor] with edge clamp."""
    down = jnp.concatenate([tex[1:], tex[-1:]], axis=0)
    return jnp.concatenate([tex, down], axis=-1)


def _pack_quad(tex: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H, W, 4C): [c00, c01, c10, c11] neighborhood.

    c01 = right neighbor, c10 = down, c11 = diagonal; all edge-clamped so
    a fetch at the last row/col reproduces GL clamp-to-edge exactly.
    """
    right = jnp.concatenate([tex[:, 1:], tex[:, -1:]], axis=1)
    down = jnp.concatenate([tex[1:], tex[-1:]], axis=0)
    diag = jnp.concatenate([right[1:], right[-1:]], axis=0)
    return jnp.concatenate([tex, right, down, diag], axis=-1)


def sample_nearest(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor fetch. uv (..., 2) -> (..., C) (or scalar maps)."""
    h, w = tex.shape[0], tex.shape[1]
    ix = jnp.floor(uv[..., 0] * w).astype(jnp.int32)
    iy = jnp.floor(uv[..., 1] * h).astype(jnp.int32)
    return _gather2d(tex, iy, ix)


def texel_fetch(tex: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Integer-coordinate fetch with clamp (GLSL ``texelFetch`` + clamp)."""
    return _gather2d(tex, iy, ix)


def sample_bilinear(tex: jnp.ndarray, uv: jnp.ndarray,
                    half: bool = False) -> jnp.ndarray:
    """Bilinear fetch with clamp-to-edge, matching GL LinearFilter.

    One gather per tap for <= 2 channels (quad pack), two for <= 4
    channels (pair pack); bit-identical to four clamped corner fetches
    (the negative-side clamp degeneracy is reproduced by zeroing the
    lerp fraction where ``floor`` landed at -1, which the four-fetch
    formula makes exact by ``c00 == c01``).

    ``half=True`` declares the texture a HalfFloat render target (the
    reference demo's postprocessing framebuffers and the temporal
    history are rgba16f): texels are quantized to f16 — exactly the
    storage the reference samples — which lets a 3-4 channel quad pack
    ride ONE 32-byte gather per tap instead of two.
    """
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    # clamp degeneracy: at x0 < 0 all corner fetches clamp to column 0,
    # making the x-lerp a no-op; packed fetches reproduce that with fx=0
    fx = jnp.where(x0 < 0.0, 0.0, fx)
    fy = jnp.where(y0 < 0.0, 0.0, fy)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    squeeze = tex.ndim == 2
    base = tex[..., None] if squeeze else tex
    c = base.shape[2]
    # an f16-stored texture always quad-packs (16 f16 = 32 B = one
    # base-price gather)
    half = half or base.dtype == jnp.float16

    if c <= 2 or (half and c <= 4):
        src = base.astype(jnp.float16) if half else base
        q = _gather2d(_pack_quad(src), y0, x0).astype(jnp.float32)
        c00, c01, c10, c11 = (
            q[..., :c], q[..., c:2 * c], q[..., 2 * c:3 * c], q[..., 3 * c:]
        )
    elif c <= 4:
        p = _pack_pair(base)
        left = _gather2d(p, y0, x0)
        right = _gather2d(p, y0, x0 + 1)
        c00, c10 = left[..., :c], left[..., c:]
        c01, c11 = right[..., :c], right[..., c:]
    else:
        c00 = _gather2d(base, y0, x0)
        c01 = _gather2d(base, y0, x0 + 1)
        c10 = _gather2d(base, y0 + 1, x0)
        c11 = _gather2d(base, y0 + 1, x0 + 1)

    fx = fx[..., None]
    fy = fy[..., None]
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    out = top + (bot - top) * fy
    return out[..., 0] if squeeze else out


def sample_catmull_rom_5tap(tex: jnp.ndarray, uv: jnp.ndarray,
                            half: bool = False) -> jnp.ndarray:
    """5-tap bicubic Catmull-Rom (`reproject.frag:212-255`).

    Used to sample the temporal history with less blur than bilinear.
    Result is clamped to >= 0 like the reference. ``half=True``: the
    history texture is an rgba16f LinearFilter framebuffer
    (`TemporalReprojectPass.js:141-144`) — one packed gather per tap.
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
        return sample_bilinear(tex, jnp.stack([ux, uy], axis=-1), half=half)

    expand = (lambda a: a[..., None]) if tex.ndim == 3 else (lambda a: a)
    acc = tap(sample1[..., 0], sample0[..., 1]) * expand(sw0)
    acc += tap(sample0[..., 0], sample1[..., 1]) * expand(sw1)
    acc += tap(sample1[..., 0], sample1[..., 1]) * expand(sw2)
    acc += tap(sample2[..., 0], sample1[..., 1]) * expand(sw3)
    acc += tap(sample1[..., 0], sample2[..., 1]) * expand(sw4)

    total = sw0 + sw1 + sw2 + sw3 + sw4
    return jnp.maximum(acc * expand(1.0 / total), 0.0)


class MipAtlas:
    """All mip levels of an image stacked into ONE 2-D strip.

    TPU-native replacement for per-level texture objects: per-pixel
    trilinear mip sampling becomes index arithmetic + taps into a single
    (H', W', C) image, so it rides the fast ``tex[y, x]`` gather pattern
    (flat ``(N, C)`` row gathers measured 6x slower) and the packed
    bilinear path above.

    Levels are stacked vertically, each padded by one edge-replicated
    row/column so a bilinear tap at a level's last row/col never bleeds
    into the next level. Per-level (row_offset, h, w) are static aux data
    taken from the *actual* chain shapes (floor halving can drift from
    the pow-2 closed form for non-power-of-two images), selected per
    pixel with a short where-chain.
    """

    def __init__(self, data: jnp.ndarray, shapes: tuple):
        self.data = data          # (H', W', C) strip, levels stacked
        self.shapes = shapes      # ((row_off, h, w) per level), static

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
    """Build the stacked strip from an (H, W, C) base image."""
    mips = build_mip_chain(tex)
    c = tex.shape[2] if tex.ndim == 3 else 1
    strip_w = tex.shape[1] + 1
    rows = []
    shapes = []
    off = 0
    for m in mips:
        m3 = m if m.ndim == 3 else m[..., None]
        h, w = m3.shape[0], m3.shape[1]
        # edge-replicate one pad row + col (clamp-to-edge inside the level)
        m3 = jnp.concatenate([m3, m3[:, -1:]], axis=1)
        m3 = jnp.concatenate([m3, m3[-1:]], axis=0)
        if m3.shape[1] < strip_w:
            fill = jnp.zeros((m3.shape[0], strip_w - m3.shape[1], c), m3.dtype)
            m3 = jnp.concatenate([m3, fill], axis=1)
        rows.append(m3)
        shapes.append((off, h, w))
        off += h + 1
    return MipAtlas(jnp.concatenate(rows, axis=0), tuple(shapes))


def _atlas_level_params(atlas: MipAtlas, l: jnp.ndarray):
    """(row_offset, h_l, w_l) for per-pixel float level indices ``l``.

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
    """Bilinear fetch at integer level ``l`` (float-typed, per pixel).

    One packed gather per tap for <= 2 channels, two for <= 4: x0/y0 are
    clamped to the level interior so the +1 neighbors land in the
    level's edge-replicated pad, reproducing per-level clamp-to-edge.
    """
    offset, h_l, w_l = _atlas_level_params(atlas, l)
    x = uv[..., 0] * w_l - 0.5
    y = uv[..., 1] * h_l - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    # clamp-to-edge degeneracy at the negative side (see sample_bilinear)
    fx = jnp.where(x0[..., None] < 0.0, 0.0, fx)
    fy = jnp.where(y0[..., None] < 0.0, 0.0, fy)
    x0 = jnp.clip(x0, 0.0, w_l - 1.0)
    y0 = jnp.clip(y0, 0.0, h_l - 1.0)
    iy = (offset + y0).astype(jnp.int32)
    ix = x0.astype(jnp.int32)

    c = atlas.data.shape[-1]
    if c <= 2 or (c <= 4 and atlas.data.dtype == jnp.float16):
        q = _gather2d(_pack_quad(atlas.data), iy, ix).astype(jnp.float32)
        c00, c01, c10, c11 = (
            q[..., :c], q[..., c:2 * c], q[..., 2 * c:3 * c], q[..., 3 * c:]
        )
    elif c <= 4:
        p = _pack_pair(atlas.data)
        left = _gather2d(p, iy, ix)
        right = _gather2d(p, iy, ix + 1)
        c00, c10 = left[..., :c], left[..., c:]
        c01, c11 = right[..., :c], right[..., c:]
    else:
        c00 = _gather2d(atlas.data, iy, ix)
        c01 = _gather2d(atlas.data, iy, ix + 1)
        c10 = _gather2d(atlas.data, iy + 1, ix)
        c11 = _gather2d(atlas.data, iy + 1, ix + 1)
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def sample_mip_atlas(atlas: MipAtlas, uv: jnp.ndarray, lod,
                     quantize: bool = False) -> jnp.ndarray:
    """Trilinear fetch at per-pixel fractional ``lod`` from the atlas.

    A static integer ``lod`` (e.g. the background fetch at lod 0) takes
    a single-level path: one bilinear tap instead of the two-level
    blend, numerically identical (the second level's weight is 0).
    ``quantize=True`` rounds a traced per-pixel lod to the nearest mip:
    ONE priced gather instead of the trilinear pair (per-level selection
    is where-chain arithmetic either way)."""
    if isinstance(lod, (int, float)) and float(lod) == int(lod):
        lvl = int(min(max(int(lod), 0), atlas.levels - 1))
        return _atlas_bilinear(
            atlas, uv, jnp.full(uv.shape[:-1], float(lvl), jnp.float32)
        )
    lod = jnp.clip(
        jnp.broadcast_to(jnp.asarray(lod, jnp.float32), uv.shape[:-1]),
        0.0, atlas.levels - 1,
    )
    if quantize:
        return _atlas_bilinear(atlas, uv, jnp.round(lod))
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
