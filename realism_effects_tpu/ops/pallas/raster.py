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

_BR = 64       # block rows (single-batch scenes)
_BC = 512      # block lanes
#: multi-batch (large) scenes use finer blocks: the per-tri vector work
#: shrinks 4x and the per-batch bbox pre-test (mesh face order is
#: spatially local, so 4096-face batch bboxes are small) keeps the
#: per-tri scalar floor bounded to the blocks a batch actually touches
_BR_L = 32
_BC_L = 256
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


def _zscan_kernel(tab_ref, par_ref, out_ref, *, n_tris: int,
                  br: int, bc: int):
    """Grid (hp//br, wp//bc).

    tab_ref (n_tris * 24,) SMEM (flat — a 2-D SMEM window pads its
    minor dim to 128 lanes, 5x the real size), per tri:
      0..8   edge coefficients c00,c01,c02,c10,...,c22 (A,B,C per edge)
      9..11  A,B,C of Σe·w  (w_pix numerator)
      12..14 A,B,C of Σe·z  (z numerator)
      15..17 A,B,C of Σe    (weight normalizer)
      18     sgn (±1, the reference's winding sign)
      19..22 bbox ymin,ymax,xmin,xmax (±inf = unbounded; empty = culled)
    par_ref (4,) SMEM: batch bbox ymin,ymax,xmin,xmax (pixel centers) —
      blocks outside it skip the whole triangle loop
    out_ref (2, br, bc): [z_ndc winner | winner id (f32, -1 = none)]
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    y0 = i * br
    x0 = j * bc

    px = (jax.lax.broadcasted_iota(jnp.int32, (br, bc), 1)
          .astype(jnp.float32) + (jnp.float32(x0) + 0.5))
    py = (jax.lax.broadcasted_iota(jnp.int32, (br, bc), 0)
          .astype(jnp.float32) + (jnp.float32(y0) + 0.5))

    out_ref[0] = jnp.full((br, bc), jnp.inf, jnp.float32)
    out_ref[1] = jnp.full((br, bc), -1.0, jnp.float32)

    # block pixel-center bounds for the scalar bbox tests
    by0 = jnp.float32(y0) + 0.5
    by1 = jnp.float32(y0 + br - 1) + 0.5
    bx0 = jnp.float32(x0) + 0.5
    bx1 = jnp.float32(x0 + bc - 1) + 0.5

    def body(t, carry):
        q = t * _NQ
        ymin = tab_ref[q + 19]
        ymax = tab_ref[q + 20]
        xmin = tab_ref[q + 21]
        xmax = tab_ref[q + 22]
        overlap = ((ymin <= by1) & (ymax >= by0)
                   & (xmin <= bx1) & (xmax >= bx0))

        @pl.when(overlap)
        def _():
            s = tab_ref[q + 18]
            e0 = tab_ref[q + 0] * px + tab_ref[q + 1] * py + tab_ref[q + 2]
            e1 = tab_ref[q + 3] * px + tab_ref[q + 4] * py + tab_ref[q + 5]
            e2 = tab_ref[q + 6] * px + tab_ref[q + 7] * py + tab_ref[q + 8]
            covered = (e0 * s >= 0.0) & (e1 * s >= 0.0) & (e2 * s >= 0.0)
            covered &= ((px >= xmin) & (px <= xmax)
                        & (py >= ymin) & (py <= ymax))
            zw = tab_ref[q + 9] * px + tab_ref[q + 10] * py + tab_ref[q + 11]
            zc = (tab_ref[q + 12] * px + tab_ref[q + 13] * py
                  + tab_ref[q + 14])
            se = (tab_ref[q + 15] * px + tab_ref[q + 16] * py
                  + tab_ref[q + 17])
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

    batch_hit = ((par_ref[0] <= by1) & (par_ref[1] >= by0)
                 & (par_ref[2] <= bx1) & (par_ref[3] >= bx0))

    @pl.when(batch_hit)
    def _():
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

    # single batch: table at its true size, coarse blocks; multi batch:
    # pad with culled (empty-bbox) rows so every invocation shares ONE
    # kernel shape, fine blocks + per-batch bbox pre-test, then
    # min-combine the batches (strict < keeps the earlier batch on ties
    # — the scan's rule)
    n_batch = -(-f // _MAX_TRIS)
    bt = f if n_batch == 1 else _MAX_TRIS
    br, bc = (_BR, _BC) if n_batch == 1 else (_BR_L, _BC_L)
    fp = n_batch * bt
    if fp != f:
        padrow = jnp.zeros((fp - f, _NQ), jnp.float32)
        padrow = padrow.at[:, 19].set(inf).at[:, 20].set(-inf)
        padrow = padrow.at[:, 21].set(inf).at[:, 22].set(-inf)
        tab = jnp.concatenate([tab, padrow], axis=0)
    # per-batch bbox for the kernel's whole-loop skip (mesh face order
    # is spatially local, so consecutive-face batches have small boxes;
    # a w-crossing tri's ±inf makes its batch conservative, culled pads'
    # empty boxes drop out of the reduction)
    bb = tab.reshape(n_batch, bt, _NQ)
    batch_bbox = jnp.stack([
        bb[:, :, 19].min(axis=1), bb[:, :, 20].max(axis=1),
        bb[:, :, 21].min(axis=1), bb[:, :, 22].max(axis=1),
    ], axis=-1)
    tab = tab.reshape(-1)

    hp = -(-height // br) * br
    wp = -(-width // bc) * bc

    kern = functools.partial(_zscan_kernel, n_tris=bt, br=br, bc=bc)
    call = functools.partial(
        pl.pallas_call, kern,
        grid=(hp // br, wp // bc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, br, bc), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, hp, wp), jnp.float32),
    )
    zbuf = idsf = None
    for b in range(n_batch):
        out = call()(tab[b * bt * _NQ: (b + 1) * bt * _NQ],
                     batch_bbox[b])
        zb, idb = out[0], out[1]
        idb = jnp.where(idb >= 0.0, idb + jnp.float32(b * bt), -1.0)
        if zbuf is None:
            zbuf, idsf = zb, idb
        else:
            take = zb < zbuf
            zbuf = jnp.where(take, zb, zbuf)
            idsf = jnp.where(take, idb, idsf)
    zbuf = zbuf[:height, :width]
    ids = idsf[:height, :width].astype(jnp.int32)
    return ids, zbuf
