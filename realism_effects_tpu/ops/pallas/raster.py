"""VMEM-resident z-buffer visibility: the raster scan as one kernel.

The XLA visibility scan (`scene/rasterizer._visibility`) evaluates every
triangle chunk against EVERY pixel — `lax.scan` cannot skip work — and
round-trips the (H, W) zbuf/ids carry through HBM each step. At 1080p
the scan is ~32 of the raster's ~35 ms for a 734-triangle scene
(tools/profile_raster.py), i.e. the frame's visibility cost is
O(H·W·F) with no culling.

This kernel keeps the carry in VMEM and walks the triangle list ONCE
per (64, 512) pixel block with a per-triangle screen-bbox skip: the
per-tri scalars (edge/interp coefficients, sign, bbox) live in an SMEM
table, the scalar core tests the triangle's bbox against the block
bounds, and `@pl.when` skips the ~35 vector ops for triangles that
cannot touch the block (~10 scalar cycles instead). Small triangles
touch 1-2 blocks, so total vector work collapses from H·W·F to
~Σ_tri(area-covered blocks) — the tile-binned raster expressed as
predication instead of data-dependent lists (no dynamic shapes).

Semantics match `_visibility`'s scan step (`GBufferPass.js:100-119`
z-test semantics): same covered tests, same strict `z < zbuf`
first-triangle-wins tie rule, same guards. The linear interpolants
(Σe·w, Σe·z, Σe) are hoisted per triangle into plane coefficients —
algebraically identical, f32 rounding differs in the last ulp from the
per-pixel formulation, so a winner can flip only where two triangles
tie within ~1 ulp of z (the golden/parity fixtures pin the jnp path on
CPU; `tools/check_raster_kernel.py` measures flips on hardware).

The SMEM table bounds the triangle count (`fits_smem`); larger scenes
keep the XLA scan. Stochastic-alpha scenes (dither) also keep the scan
— the convergence-law test is per-pixel state the kernel doesn't carry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BR = 64       # block rows
_BC = 512      # block lanes
_NQ = 24       # scalars per triangle (23 used, padded)

#: SMEM budget for the per-tri table of ONE kernel invocation. Scenes
#: above this run as a sequence of batched invocations whose (z, id)
#: outputs min-combine in XLA (earlier batch wins ties — the scan's
#: first-triangle rule). Each batch still applies the per-tri bbox skip.
_MAX_TRIS = 4096
#: cap on batched invocations: above this (~2M tris) the XLA scan is
#: kept (combine traffic and launch overhead would dominate anyway)
_MAX_BATCHES = 512


def fits_smem(num_tris: int) -> bool:
    return num_tris <= _MAX_TRIS * _MAX_BATCHES


def _zscan_kernel(tab_ref, par_ref, out_ref, *, n_tris: int):
    """Grid (hp//_BR, wp//_BC).

    tab_ref (n_tris, 24) SMEM, per tri:
      0..8   edge coefficients c00,c01,c02,c10,...,c22 (A,B,C per edge)
      9..11  A,B,C of Σe·w  (w_pix numerator)
      12..14 A,B,C of Σe·z  (z numerator)
      15..17 A,B,C of Σe    (weight normalizer)
      18     sgn (±1, the reference's winding sign)
      19..22 bbox ymin,ymax,xmin,xmax (±inf = unbounded; empty = culled)
    par_ref (2,) SMEM: h, w (unused — blocks may extend past the frame;
      padded-region winners are cropped by the caller)
    out_ref (2, _BR, _BC): [z_ndc winner | winner id (f32, -1 = none)]
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    y0 = i * _BR
    x0 = j * _BC

    px = (jax.lax.broadcasted_iota(jnp.int32, (_BR, _BC), 1)
          .astype(jnp.float32) + (jnp.float32(x0) + 0.5))
    py = (jax.lax.broadcasted_iota(jnp.int32, (_BR, _BC), 0)
          .astype(jnp.float32) + (jnp.float32(y0) + 0.5))

    out_ref[0] = jnp.full((_BR, _BC), jnp.inf, jnp.float32)
    out_ref[1] = jnp.full((_BR, _BC), -1.0, jnp.float32)

    # block pixel-center bounds for the scalar bbox test
    by0 = jnp.float32(y0) + 0.5
    by1 = jnp.float32(y0 + _BR - 1) + 0.5
    bx0 = jnp.float32(x0) + 0.5
    bx1 = jnp.float32(x0 + _BC - 1) + 0.5

    def body(t, carry):
        ymin = tab_ref[t, 19]
        ymax = tab_ref[t, 20]
        xmin = tab_ref[t, 21]
        xmax = tab_ref[t, 22]
        overlap = ((ymin <= by1) & (ymax >= by0)
                   & (xmin <= bx1) & (xmax >= bx0))

        @pl.when(overlap)
        def _():
            s = tab_ref[t, 18]
            e0 = tab_ref[t, 0] * px + tab_ref[t, 1] * py + tab_ref[t, 2]
            e1 = tab_ref[t, 3] * px + tab_ref[t, 4] * py + tab_ref[t, 5]
            e2 = tab_ref[t, 6] * px + tab_ref[t, 7] * py + tab_ref[t, 8]
            covered = (e0 * s >= 0.0) & (e1 * s >= 0.0) & (e2 * s >= 0.0)
            covered &= ((px >= xmin) & (px <= xmax)
                        & (py >= ymin) & (py <= ymax))
            zw = tab_ref[t, 9] * px + tab_ref[t, 10] * py + tab_ref[t, 11]
            zc = (tab_ref[t, 12] * px + tab_ref[t, 13] * py
                  + tab_ref[t, 14])
            se = (tab_ref[t, 15] * px + tab_ref[t, 16] * py
                  + tab_ref[t, 17])
            se_safe = jnp.where(jnp.abs(se) > 1e-20, se, 1e-20)
            w_pix = zw / se_safe
            covered &= w_pix > 1e-6
            z_ndc = zc / jnp.where(jnp.abs(zw) > 1e-20, zw, 1e-20)
            covered &= (z_ndc >= -1.0) & (z_ndc <= 1.0)

            take = covered & (z_ndc < out_ref[0])
            out_ref[0] = jnp.where(take, z_ndc, out_ref[0])
            out_ref[1] = jnp.where(take, t.astype(jnp.float32),
                                   out_ref[1])
        return carry

    jax.lax.fori_loop(0, n_tris, body, 0)


def zscan_visibility(coeffs, tri_z, tri_w, sgn, valid, tri_bbox,
                     height: int, width: int):
    """Run the VMEM z-scan. Inputs are `_visibility`'s per-tri arrays:

    coeffs  (F, 3, 3) scaled edge coefficients
    tri_z   (F, 3) scaled clip z per vertex
    tri_w   (F, 3) scaled w per vertex
    sgn     (F,) winding sign
    valid   (F,) participating triangles
    tri_bbox(F, 4) xmin,xmax,ymin,ymax (±inf for w-crossing tris)

    Returns (ids (H, W) int32 winner (-1 none), z_ndc (H, W) f32 winner
    depth, inf where none).
    """
    f = coeffs.shape[0]
    # hoist the per-pixel interpolants into per-tri plane coefficients:
    # Σ_i e_i(p)·a_i has coefficients Σ_i c_i·a_i (exact algebra; f32
    # rounding differs from the per-pixel sum in the last ulp)
    zw3 = jnp.einsum("fik,fi->fk", coeffs, tri_w, precision="highest")
    zc3 = jnp.einsum("fik,fi->fk", coeffs, tri_z, precision="highest")
    se3 = coeffs.sum(axis=1)
    inf = jnp.float32(jnp.inf)
    # fold `valid` into an empty bbox (scalar skip culls the triangle)
    ymin = jnp.where(valid, tri_bbox[:, 2], inf)
    ymax = jnp.where(valid, tri_bbox[:, 3], -inf)
    xmin = jnp.where(valid, tri_bbox[:, 0], inf)
    xmax = jnp.where(valid, tri_bbox[:, 1], -inf)
    tab = jnp.concatenate([
        coeffs.reshape(f, 9), zw3, zc3, se3, sgn[:, None],
        ymin[:, None], ymax[:, None], xmin[:, None], xmax[:, None],
        jnp.zeros((f, _NQ - 23), jnp.float32),
    ], axis=-1)

    hp = -(-height // _BR) * _BR
    wp = -(-width // _BC) * _BC
    params = jnp.asarray([height, width], jnp.float32)

    # pad to a batch multiple with culled (empty-bbox) rows so every
    # invocation shares ONE kernel shape, then min-combine the batches
    # (strict < keeps the earlier batch on ties — the scan's rule)
    n_batch = -(-f // _MAX_TRIS)
    fp = n_batch * _MAX_TRIS
    if fp != f:
        padrow = jnp.zeros((fp - f, _NQ), jnp.float32)
        padrow = padrow.at[:, 19].set(inf).at[:, 20].set(-inf)
        padrow = padrow.at[:, 21].set(inf).at[:, 22].set(-inf)
        tab = jnp.concatenate([tab, padrow], axis=0)

    kern = functools.partial(_zscan_kernel, n_tris=_MAX_TRIS)
    call = functools.partial(
        pl.pallas_call, kern,
        grid=(hp // _BR, wp // _BC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, _BR, _BC), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, hp, wp), jnp.float32),
    )
    zbuf = idsf = None
    for b in range(n_batch):
        out = call()(tab[b * _MAX_TRIS: (b + 1) * _MAX_TRIS], params)
        zb, idb = out[0], out[1]
        idb = jnp.where(idb >= 0.0, idb + jnp.float32(b * _MAX_TRIS), -1.0)
        if zbuf is None:
            zbuf, idsf = zb, idb
        else:
            take = zb < zbuf
            zbuf = jnp.where(take, zb, zbuf)
            idsf = jnp.where(take, idb, idsf)
    zbuf = zbuf[:height, :width]
    ids = idsf[:height, :width].astype(jnp.int32)
    return ids, zbuf
