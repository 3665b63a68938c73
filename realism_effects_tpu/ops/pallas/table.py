"""Pallas VMEM small-table lookup: per-pixel fetch from a tiny table.

An XLA gather is priced per *index* (~10 ns each → ~20 ms for a 1080p
index set, CLAUDE.md rule 2b) no matter how small the table is. When
the table fits comfortably in VMEM (the rasterizer's per-face packed
records for ordinary scenes: F/128 rows x 128 lanes x 8 channels), a
dense select resolves the same fetch at VPU speed: load the whole table
into every program's VMEM once, lane-gather each row at the per-pixel
column, and select the per-pixel row — ``rows x channels`` cheap vector
ops per pixel instead of a priced gather.

Cost scales linearly with ``rows * channels``, so callers gate on
:func:`table_rows_ok` (the rasterizer keeps XLA gathers for huge meshes
like the 262k-triangle Sponza, where rows ~ 2048 would cost more than
the gather it replaces).

Semantics are exactly ``tex[clip(iy), clip(ix)]``; off-TPU the jnp
gather IS the implementation (bit-identical, and it keeps the CPU
gather-budget census meaningful).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _use_interpret

_LANES = 128
_BR = 256          # output rows per program
#: max table rows for the VMEM path: above this the select chain costs
#: more than the priced gather it replaces (~24 rows/ms/channel measured)
MAX_ROWS = 64


def table_rows_ok(rows: int) -> bool:
    return rows <= MAX_ROWS


def _lookup_kernel(iy_ref, ix_ref, tab_ref, out_ref, *, rows: int,
                   groups: int, c: int, h: int, w: int):
    iy = jnp.clip(iy_ref[...], 0, rows - 1)
    ix = jnp.clip(ix_ref[...], 0, w - 1)
    lq = ix // _LANES
    lr = ix % _LANES
    br = iy.shape[0]

    for cidx in range(c):
        plane = tab_ref[cidx]                       # (rows, groups*_LANES)
        acc = jnp.zeros((br, _LANES), jnp.float32)
        for t in range(rows):
            row = plane[t]
            val = None
            for g in range(groups):
                grp = jnp.broadcast_to(
                    row[g * _LANES:(g + 1) * _LANES][None, :], (br, _LANES)
                )
                gv = jnp.take_along_axis(grp, lr, axis=1)
                val = gv if val is None else jnp.where(lq == g, gv, val)
            acc = jnp.where(iy == t, val, acc)
        out_ref[cidx] = acc


def vmem_table_lookup(table: jnp.ndarray, iy: jnp.ndarray,
                      ix: jnp.ndarray) -> jnp.ndarray:
    """Fetch ``table[clip(iy), clip(ix)]`` per pixel via VMEM selects.

    table: (T, W, C<=8) f32, T <= MAX_ROWS, W <= 512.
    iy/ix: (H, W') int32 indices. Returns (H, W', C).
    """
    t, wt, c = table.shape
    assert table_rows_ok(t), t
    assert wt <= 4 * _LANES, wt
    if _use_interpret():
        return table[jnp.clip(iy, 0, t - 1), jnp.clip(ix, 0, wt - 1)]

    h, w = iy.shape
    groups = -(-wt // _LANES)
    tab = jnp.moveaxis(table.astype(jnp.float32), -1, 0)   # (C, T, W)
    if wt < groups * _LANES:
        tab = jnp.pad(tab, ((0, 0), (0, 0), (0, groups * _LANES - wt)))

    ph, pw = (-h) % _BR, (-w) % _LANES
    pad2 = lambda a: jnp.pad(a, ((0, ph), (0, pw))) if (ph or pw) else a
    iy_p = pad2(iy)
    ix_p = pad2(ix)
    hp, wp = iy_p.shape
    nr, nc = hp // _BR, wp // _LANES

    idx_spec = pl.BlockSpec((_BR, _LANES), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((c, t, groups * _LANES), lambda i, j: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_lookup_kernel, rows=t, groups=groups, c=c,
                             h=h, w=wt)
    out = pl.pallas_call(
        kern,
        grid=(nr, nc),
        in_specs=[idx_spec, idx_spec, tab_spec],
        out_specs=pl.BlockSpec((c, _BR, _LANES), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=False,
    )(iy_p, ix_p, tab)
    return jnp.moveaxis(out[:, :h, :w], 0, -1)
