"""Pallas TPU stencil kernels for the fixed-offset neighborhood ops.

The reference's GLSL stencils (3x3 unsharp mask `SharpnessEffect.js:4-31`,
neighborhood AABB clamp `reproject.frag:53-95`) read a small static
window around each pixel. On TPU these become row-block Pallas kernels:
the grid walks (channel, row-block) tiles; each program reads its block
plus the blocks above/below (3-slab halo pattern — BlockSpec index maps
can't overlap, so the same input is passed three times with shifted index
maps) and computes the stencil with shifted VMEM slices on the VPU.

Layout note: images are processed **planar** (C, H, W) so the lane
dimension is W — a channel-minor (H, W, 3) block would pad 3 lanes to
128 and overflow VMEM 42x.

Each kernel has a jnp reference; tests compare them. ``interpret=True``
is selected automatically off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _block_rows(w: int) -> int:
    """Row-block height: shrink for wide images so the 3-slab halo inputs
    + temporaries stay inside scoped VMEM (~16 MB default)."""
    if w <= 2048:
        return 128
    if w <= 4096:
        return 64
    return 32


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _plane_specs(h: int, w: int, block_rows: int):
    """3-slab halo specs over (C, H, W) planes, grid (C, H//BLOCK)."""

    def make_map(off):
        n_blocks = h // block_rows

        def index_map(c, i):
            return (c, jnp.clip(i + off, 0, n_blocks - 1), 0)

        return index_map

    shape = (1, block_rows, w)
    in_specs = [
        pl.BlockSpec(shape, make_map(-1), memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, make_map(0), memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, make_map(1), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(shape, make_map(0), memory_space=pltpu.VMEM)
    return in_specs, out_spec


def _mask_specs(h: int, w: int, block_rows: int):
    """Same 3-slab specs for an (H, W) mask shared across channels."""

    def make_map(off):
        n_blocks = h // block_rows

        def index_map(c, i):
            return (jnp.clip(i + off, 0, n_blocks - 1), 0)

        return index_map

    shape = (block_rows, w)
    return [
        pl.BlockSpec(shape, make_map(-1), memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, make_map(0), memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, make_map(1), memory_space=pltpu.VMEM),
    ]


def _to_planar(x: jnp.ndarray, block_rows: int):
    """(H, W, C) -> (C, H', W) with rows padded to the block size."""
    x = jnp.moveaxis(x, -1, 0)
    h = x.shape[1]
    pad = (-h) % block_rows
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="edge")
    return x, h


def _halo_rows(i, n, prev, cur, nxt, radius: int, fill=None):
    """Build a (rows + 2r, W) slab from the 3 blocks with edge handling.

    ``fill``: value used beyond the image edge; None -> replicate edge row
    (equivalent results for min/max/blur-style stencils).
    """
    rows = cur.shape[0]
    top_src = prev[-radius:]
    bot_src = nxt[:radius]
    if fill is None:
        top_edge = jnp.broadcast_to(cur[:1], (radius,) + cur.shape[1:])
        bot_edge = jnp.broadcast_to(cur[-1:], (radius,) + cur.shape[1:])
    else:
        top_edge = jnp.full((radius,) + cur.shape[1:], fill, cur.dtype)
        bot_edge = jnp.full((radius,) + cur.shape[1:], fill, cur.dtype)
    top = jnp.where(i == 0, top_edge, top_src)
    bot = jnp.where(i == n - 1, bot_edge, bot_src)
    return jnp.concatenate([top, cur, bot], axis=0)


def _shift_x(a, dx, fill):
    """Shift columns by dx, filling vacated lanes with ``fill`` (or the
    edge value when None).

    Implemented as a lane roll + masked fix-up of the wrapped columns —
    Mosaic cannot concatenate blocks with mismatched lane offsets.
    """
    if dx == 0:
        return a
    w = a.shape[1]
    shift = (-dx) % w  # pltpu.roll requires a non-negative shift
    rolled = pltpu.roll(a, shift, axis=1) if not _use_interpret() else jnp.roll(a, shift, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, dimension=1)
    if fill is None:
        fill_arr = jnp.broadcast_to(
            a[:, -1:] if dx > 0 else a[:, :1], a.shape
        )
    else:
        fill_arr = jnp.full_like(a, fill)
    wrapped = (col >= w - dx) if dx > 0 else (col < -dx)
    return jnp.where(wrapped, fill_arr, rolled)


# ---------------------------------------------------------------------------
# 3x3 unsharp mask (K: SharpnessEffect)
# ---------------------------------------------------------------------------

def _sharpness_kernel(prev_ref, cur_ref, next_ref, sharp_ref, out_ref):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    cur = cur_ref[0]
    slab = _halo_rows(i, n, prev_ref[0], cur, next_ref[0], 1)
    rows = cur.shape[0]

    acc = jnp.zeros_like(cur)
    for dy in range(3):
        row = slab[dy: dy + rows]
        acc = acc + _shift_x(row, -1, None) + row + _shift_x(row, 1, None)
    blurred = acc * (1.0 / 9.0)
    s = sharp_ref[0]
    out_ref[0] = jnp.maximum(cur + (cur - blurred) * s, 0.0)


def sharpness_3x3(color: jnp.ndarray, sharpness) -> jnp.ndarray:
    """Pallas unsharp mask (drop-in for the jnp path in
    ``effects/finishing.SharpnessEffect``)."""
    br = _block_rows(color.shape[1])
    x, orig_h = _to_planar(color, br)
    c, h, w = x.shape
    in_specs, out_spec = _plane_specs(h, w, br)
    sharp = jnp.asarray([sharpness], jnp.float32)
    out = pl.pallas_call(
        _sharpness_kernel,
        grid=(c, h // br),
        in_specs=in_specs + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((c, h, w), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_use_interpret(),
    )(x, x, x, sharp)
    return jnp.moveaxis(out[:, :orig_h], 0, -1)


# ---------------------------------------------------------------------------
# Neighborhood AABB min/max (K5: reproject.frag getNeighborhoodAABB)
# ---------------------------------------------------------------------------

def _minmax_kernel(tp_ref, tc_ref, tn_ref, mp_ref, mc_ref, mn_ref,
                   min_ref, max_ref, *, radius):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    big = jnp.float32(1e30)
    rows = tc_ref.shape[1]

    def masked(tref, mref, fill):
        return jnp.where(mref[...] >= 0.0, tref[0], fill)

    slab_mn = _halo_rows(
        i, n,
        masked(tp_ref, mp_ref, big), masked(tc_ref, mc_ref, big),
        masked(tn_ref, mn_ref, big), radius, fill=big,
    )
    slab_mx = _halo_rows(
        i, n,
        masked(tp_ref, mp_ref, -big), masked(tc_ref, mc_ref, -big),
        masked(tn_ref, mn_ref, -big), radius, fill=-big,
    )

    # separable: horizontal min/max over the slab, then vertical
    hmn = slab_mn
    hmx = slab_mx
    for dx in range(1, radius + 1):
        hmn = jnp.minimum(
            hmn, jnp.minimum(_shift_x(slab_mn, dx, big), _shift_x(slab_mn, -dx, big))
        )
        hmx = jnp.maximum(
            hmx, jnp.maximum(_shift_x(slab_mx, dx, -big), _shift_x(slab_mx, -dx, -big))
        )
    mn = hmn[radius: radius + rows]
    mx = hmx[radius: radius + rows]
    for dy in range(2 * radius + 1):
        if dy == radius:
            continue
        mn = jnp.minimum(mn, hmn[dy: dy + rows])
        mx = jnp.maximum(mx, hmx[dy: dy + rows])
    min_ref[0] = mn
    max_ref[0] = mx


def neighborhood_minmax(tex: jnp.ndarray, radius: int):
    """Pallas neighborhood AABB over a (2r+1)^2 window, skipping texels
    whose first channel is negative (`reproject.frag:53-81`)."""
    br = _block_rows(tex.shape[1])
    x, orig_h = _to_planar(tex, br)
    c, h, w = x.shape
    in_specs, out_spec = _plane_specs(h, w, br)
    mask_specs = _mask_specs(h, w, br)
    # validity mask from the first channel, padded the same way
    mask = x[0]
    kernel = functools.partial(_minmax_kernel, radius=radius)
    mn, mx = pl.pallas_call(
        kernel,
        grid=(c, h // br),
        in_specs=in_specs + mask_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((c, h, w), x.dtype),
            jax.ShapeDtypeStruct((c, h, w), x.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_use_interpret(),
    )(x, x, x, mask, mask, mask)
    return (
        jnp.moveaxis(mn[:, :orig_h], 0, -1),
        jnp.moveaxis(mx[:, :orig_h], 0, -1),
    )
