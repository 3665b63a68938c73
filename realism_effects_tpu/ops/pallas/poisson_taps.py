"""Pallas dense-select tap fetch for the Poisson denoiser (K6).

An XLA gather is priced per index (~15 ms per 2M at 1080p) no matter how
local the fetch pattern is, so the denoiser's 8 rotated taps x 2
ping-pong passes cost 16 full-res gathers per frame per instance even
after bundling (`ops/poisson_denoise.py`). But Poisson tap reach is
BOUNDED by ``radius`` (`poisson_denoise.frag:185-190`: offsets are a
rotation of the unit Poisson disk scaled by radius*flatness <= radius),
so the gather can become a dense select instead: the row block plus halo
sits in VMEM, and for every (dy, dx) in the tap's static window the
kernel selects the shifted slab where the per-pixel integer offset
equals (dy, dx). Exactly one (dy, dx) matches per pixel, so the result
is BIT-IDENTICAL to the clamped nearest gather — pure VPU work instead
of per-index gather pricing.

Axis taps (|offset| = 1) and diagonal taps (|offset| = 0.5) get
separately sized windows; both scale with ``radius`` and the image
aspect, so the kernel is only used when the unrolled window stays small
(see :func:`dense_windows`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _block_rows, _shift_x, _use_interpret

#: |offset| per POISSON8 tap (`poisson_denoise.frag:91-92`): 4 axis taps
#: then 4 diagonal taps of half magnitude
_TAP_NORMS = (1.0, 1.0, 1.0, 1.0, 0.5, 0.5, 0.5, 0.5)
#: refuse to unroll windows bigger than this many (dy, dx) candidates
_MAX_WINDOW = 256


def dense_windows(radius: float, hg: int, wg: int):
    """((Ky, Kx) for axis taps, (Ky, Kx) for diagonal taps) or None.

    The pixel-space reach of a tap with unit-norm offset o is
    ``radius * |o| * hypot(1, wg/hg)`` horizontally (the uv offset is
    aspect-scaled, `poisson_denoise.frag:190`) and
    ``radius * |o| * hypot(hg/wg, 1)`` vertically; +1 covers the
    nearest-texel floor shift."""
    wins = []
    for norm in (1.0, 0.5):
        kx = int(np.ceil(radius * norm * float(np.hypot(1.0, wg / hg)))) + 1
        ky = int(np.ceil(radius * norm * float(np.hypot(hg / wg, 1.0)))) + 1
        if (2 * ky + 1) * (2 * kx + 1) > _MAX_WINDOW:
            return None
        wins.append((ky, kx))
    return tuple(wins)


def _taps_kernel(bp_ref, bc_ref, bn_ref, oy_ref, ox_ref, out_ref, *,
                 ky: int, kx: int):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    cur = bc_ref[...]                      # (C, BR, W)
    rows = cur.shape[1]

    # halo slab along the row axis (edge rows are never selected: the
    # global clamp keeps y + oy inside the image)
    top_src = bp_ref[:, -ky:, :]
    bot_src = bn_ref[:, :ky, :]
    top_edge = jnp.broadcast_to(cur[:, :1], top_src.shape)
    bot_edge = jnp.broadcast_to(cur[:, -1:], bot_src.shape)
    top = jnp.where(i == 0, top_edge, top_src)
    bot = jnp.where(i == n - 1, bot_edge, bot_src)
    slab = jnp.concatenate([top, cur, bot], axis=1)  # (C, BR + 2ky, W)

    oyb = oy_ref[0]                        # (BR, W) int32
    oxb = ox_ref[0]
    w = cur.shape[2]
    acc = jnp.zeros_like(cur)
    for dx in range(-kx, kx + 1):
        # ONE lane roll of the whole slab per dx; the wrapped columns are
        # never selected (the global clamp keeps x + ox inside the image)
        if dx == 0:
            slab_dx = slab
        elif _use_interpret():
            slab_dx = jnp.roll(slab, (-dx) % w, axis=2)
        else:
            slab_dx = pltpu.roll(slab, (-dx) % w, axis=2)
        m_dx = oxb == dx
        for dy in range(-ky, ky + 1):
            m = (m_dx & (oyb == dy))[None]
            acc = jnp.where(m, slab_dx[:, ky + dy: ky + dy + rows, :], acc)
    out_ref[0] = acc


def _run_group(bundle_p, oy_p, ox_p, ky: int, kx: int, br: int):
    """One pallas_call over (taps_in_group, row blocks)."""
    c, h, w = bundle_p.shape
    n_taps = oy_p.shape[0]
    n_blocks = h // br

    def bmap(off):
        def index_map(k, i):
            return (0, jnp.clip(i + off, 0, n_blocks - 1), 0)
        return index_map

    bundle_spec = lambda off: pl.BlockSpec(
        (c, br, w), bmap(off), memory_space=pltpu.VMEM)
    off_spec = pl.BlockSpec(
        (1, br, w), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, c, br, w), lambda k, i: (k, 0, i, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_taps_kernel, ky=ky, kx=kx)
    return pl.pallas_call(
        kernel,
        grid=(n_taps, n_blocks),
        in_specs=[bundle_spec(-1), bundle_spec(0), bundle_spec(1),
                  off_spec, off_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_taps, c, h, w), bundle_p.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(bundle_p, bundle_p, bundle_p, oy_p, ox_p)


def poisson_taps_dense(bundle: jnp.ndarray, iy: jnp.ndarray,
                       ix: jnp.ndarray, windows) -> jnp.ndarray:
    """Fetch ``bundle[iy[k], ix[k]]`` for the 8 Poisson taps.

    ``bundle``: (H, W, C <= 8). ``iy``/``ix``: (8, H, W) int32 target
    texels, already clamped into the image. ``windows``: result of
    :func:`dense_windows`. Returns (8, H, W, C), bit-identical to
    ``bundle[iy[k], ix[k]]`` per tap.
    """
    h, w, c = bundle.shape
    (aky, akx), (dky, dkx) = windows
    br = min(_block_rows(w), 64)
    pad = (-h) % br
    hp = h + pad

    bundle_p = jnp.moveaxis(
        jnp.pad(bundle, ((0, pad), (0, 0), (0, 0)), mode="edge"), -1, 0)
    ys = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    oy = jnp.pad(iy - ys, ((0, 0), (0, pad), (0, 0)))
    ox = jnp.pad(ix - xs, ((0, 0), (0, pad), (0, 0)))

    out_axis = _run_group(bundle_p, oy[:4], ox[:4], aky, akx, br)
    out_diag = _run_group(bundle_p, oy[4:], ox[4:], dky, dkx, br)
    out = jnp.concatenate([out_axis, out_diag], axis=0)  # (8, C, H', W)
    return jnp.moveaxis(out[:, :, :h, :], 1, -1)
