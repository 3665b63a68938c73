"""Pallas bounded-window per-pixel warp: the TPU screen-space fetch.

Temporal fetches (TAA/TRAA history, reprojection validation probes,
SSGI radiance pre-warp) read a texture at ``p + offset(p)`` where the
per-pixel offset is a reprojection displacement — bounded by camera/
object motion, i.e. a few pixels per frame in practice. An XLA gather
prices that fetch per *index* (~15-20 ms per 1080p index set,
CLAUDE.md rule 2b) no matter how local it is. This kernel exploits the
bound: the frame is tiled into (BR, 128) blocks with a 3x3 halo; for
each static vertical offset ``v`` in the window the horizontal
component (up to +-127 texels, far wider than any one-frame
reprojection) is resolved by a within-vreg lane gather
(``take_along_axis(axis=1)`` on 128-lane groups, one hardware op) plus
a 3-way lane-group select, and the per-pixel vertical offset then
picks its row via a dense select over the (2*ky+1) candidates. The
order matters: a lane gather or select keyed by the *output* pixel's
index is only valid as the final op along that axis, so the kernel
always gathers horizontally first (index depends only on the output
pixel) and selects vertically last.

Out-of-window targets (|dy| > ky or |dx| > 127) return an in_window=0
flag so callers can fall back (temporal accumulators treat them as
disocclusions — the same reset the reference applies to off-screen
reprojections, `reproject.frag:130-167`).

Modes:
- ``nearest``:  tex[ty, tx]             (texelFetch / NearestFilter)
- ``bilinear``: 2x2 footprint at (ty + fy, tx + fx)  (LinearFilter)
- ``catrom``:   Catmull-Rom on the true 4x4 footprint.
- ``catrom5``:  the reference's EXACT 5-tap Catmull-Rom history filter
  (`reproject.frag:212-255`): its five bilinear taps expand to the 4x4
  footprint with the four corner texels' weights zeroed (the middle
  2x2 collapses into the shared center tap), so this mode reproduces
  `core.sampling.sample_catmull_rom_5tap` bit-for-bit modulo f32
  reassociation. Callers normalize by the 5-tap weight total
  ``1 - (w0x+w3x)(w0y+w3y)`` (see :func:`catmull_rom5_window`).

Filter-tap neighbors are clamped to the frame (GL clamp-to-edge) AND
to the window (so a +-127 horizontal target's outer tap reuses the
window-edge texel). Every mode has a jnp reference implementing the
identical semantics, used by the CPU/interpret fallback and the parity
tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _use_interpret

BC = 128          # lane-group width: within-vreg gather operates mod 128
_DEF_KY = 8       # default vertical window (+-ky rows)

_BAND_OFF = {"nearest": (0,), "bilinear": (0, 1), "catrom": (-1, 0, 1, 2),
             "catrom5": (-1, 0, 1, 2)}
_TAP_OFF = _BAND_OFF  # horizontal taps mirror the vertical bands per mode
#: catrom5: bands at the vertical extremes only read the middle taps
#: (the reference's edge taps sample0/sample2 sit on the tc12 column)
_C5_OUTER = (0, 3)


def _choose_br(ky: int) -> int:
    # block rows: a multiple of 8 comfortably larger than the window
    return int(max(32, min(128, 8 * -(-(2 * ky + 8) // 8))))


def _pad_hw(x, br, bc):
    h, w = x.shape[-2], x.shape[-1]
    ph, pw = (-h) % br, (-bc and (-w) % bc)
    if ph or pw:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
        x = jnp.pad(x, pad, mode="edge")
    return x


def _crw(f):
    """Catmull-Rom weights for fraction f: taps at (-1, 0, +1, +2)."""
    f2 = f * f
    f3 = f2 * f
    w0 = f2 - 0.5 * (f3 + f)
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w3 = 0.5 * (f3 - f2)
    return w0, w1, 1.0 - w0 - w1 - w3, w3


def _warp_kernel(ty_ref, tx_ref, fy_ref, fx_ref, *refs, ky: int,
                 kx: int | None, mode: str, c: int, h: int, w: int):
    """Grid (NR, NC). refs: 9 halo blocks of the planar (C, H', W') texture
    then (value_out, flag_out).

    ``kx``: horizontal half-window. None = the full +-127 lane window
    (3-group gather: 3 vgathers + 3 selects per tap). When the caller
    bounds the displacement so ``kx + filter reach <= 32``, the fetch
    uses the two-window lane-split instead (2 static lane rotations per
    slab row shared by every tap, then 2 vgathers + 1 static-mask select
    each — vgathers cost ~4-5 cycles/vreg on v5e, selects ~1)."""
    srcs = refs[:9]
    val_ref, flag_ref = refs[9], refs[10]
    i = pl.program_id(0)
    j = pl.program_id(1)
    br = ty_ref.shape[0]

    ty = ty_ref[...]
    tx = tx_ref[...]

    # absolute coords of this block's pixels
    ii = jax.lax.broadcasted_iota(jnp.int32, (br, BC), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (br, BC), 1)
    rr = i * br + ii
    cc = j * BC + jj

    kxw = BC - 1 if kx is None else kx + _HALO_EXTRA[mode]
    assert kx is None or kxw <= 32, "lane-split window needs kx+reach <= 32"

    dy = ty - rr
    dx = tx - cc
    in_window = (jnp.abs(dy) <= ky) & (
        jnp.abs(dx) <= (BC - 1 if kx is None else kx)
    )
    dyc = jnp.clip(dy, -ky, ky)

    band_off = _BAND_OFF[mode]
    tap_off = _TAP_OFF[mode]
    v_lo = -ky + min(band_off)
    v_hi = ky + max(band_off)

    # per-band effective vertical offsets: frame clamp then window clamp
    # (padded rows may sit past h-1; the window clamp keeps their selects
    # in candidate range — their outputs are cropped anyway)
    dyv = [
        jnp.clip(jnp.clip(dyc + bo, -rr, (h - 1) - rr), v_lo, v_hi)
        for bo in band_off
    ]

    # per-tap horizontal slab coordinates: frame clamp then window clamp
    left_half = jj < 64
    o1, o2 = BC - kxw, BC + 64 - kxw

    def tap_idx(k):
        dxk = jnp.clip(jnp.clip(tx + k, 0, w - 1) - cc, -kxw, kxw)
        txa = jj + dxk + BC          # slab lane in [1, 3*BC)
        if kx is None:
            return txa // BC - 1, txa % BC  # (group delta, lane)
        return (jnp.clip(txa - o1, 0, BC - 1),
                jnp.clip(txa - o2, 0, BC - 1))

    taps = [tap_idx(k) for k in tap_off]

    # filter weights (per output pixel; shared across vertical offsets)
    if mode == "nearest":
        wx = (None,)
        wy = (None,)
    elif mode == "bilinear":
        fx = fx_ref[...]
        fy = fy_ref[...]
        wx = (1.0 - fx, fx)
        wy = (1.0 - fy, fy)
    else:  # catrom / catrom5
        wx = _crw(fx_ref[...])
        wy = _crw(fy_ref[...])

    def gather_3g(slab_row, lq, lr):
        """slab_row (br, 3*BC) fetched at per-pixel lane (lq, lr)."""
        out = None
        for d in (-1, 0, 1):
            grp = slab_row[:, BC * (1 + d): BC * (1 + d) + BC]
            g = jnp.take_along_axis(grp, lr, axis=1)
            out = g if out is None else jnp.where(lq == d, g, out)
        return out

    for cidx in range(c):
        rows3 = [
            jnp.concatenate([srcs[3 * r + cg][cidx] for cg in range(3)],
                            axis=1)
            for r in range(3)
        ]
        slab = jnp.concatenate(rows3, axis=0)   # (3*br, 3*BC)

        acc = jnp.zeros((br, BC), jnp.float32)
        for v in range(v_lo, v_hi + 1):
            row_v = slab[br + v: br + v + br]   # static slice (br, 3*BC)
            if kx is None:
                gather_h = functools.partial(gather_3g, row_v)
            else:
                w1 = row_v[:, o1: o1 + BC]
                w2 = row_v[:, o2: o2 + BC]
                gather_h = lambda lr1, lr2, w1=w1, w2=w2: jnp.where(
                    left_half,
                    jnp.take_along_axis(w1, lr1, axis=1),
                    jnp.take_along_axis(w2, lr2, axis=1),
                )
            if mode == "nearest":
                hrow = gather_h(*taps[0])
                hrow_mid = None
            else:
                gs = [gather_h(*taps[k]) for k in range(len(taps))]
                hrow = None
                for k in range(len(taps)):
                    g = gs[k] * wx[k]
                    hrow = g if hrow is None else hrow + g
                hrow_mid = (
                    gs[1] * wx[1] + gs[2] * wx[2]
                    if mode == "catrom5" else None
                )
            for b in range(len(band_off)):
                sel = dyv[b] == v
                if mode == "nearest":
                    contrib = hrow
                elif mode == "catrom5" and b in _C5_OUTER:
                    contrib = hrow_mid * wy[b]
                else:
                    contrib = hrow * wy[b]
                acc = jnp.where(sel, acc + contrib, acc)
        val_ref[cidx] = acc
    flag_ref[0] = in_window.astype(jnp.float32)


def _specs(c, br, nr, nc):
    def mk(dr, dc):
        def im(i, j, dr=dr, dc=dc):
            return (0, jnp.clip(i + dr, 0, nr - 1), jnp.clip(j + dc, 0, nc - 1))
        return pl.BlockSpec((c, br, BC), im, memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((br, BC), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    halo = [mk(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
    return idx_spec, halo


#: extra halo rows beyond ky: the filter bands reach (-1 .. +2) rows
#: around the (window-clamped) vertical target
_HALO_EXTRA = {"nearest": 0, "bilinear": 1, "catrom": 2, "catrom5": 2}


def window_warp(tex: jnp.ndarray, ty: jnp.ndarray, tx: jnp.ndarray,
                fy: jnp.ndarray | None = None,
                fx: jnp.ndarray | None = None,
                ky: int = _DEF_KY, mode: str = "nearest",
                kx: int | None = None):
    """Fetch ``tex`` at per-pixel integer target (ty, tx) (+ fraction for
    filtered modes). Each filter tap is clamped into the frame
    (GL clamp-to-edge — so out-of-frame targets reproduce a clamped
    texture fetch exactly, like the reference's border reads), and the
    displacement is clamped into the window (+-ky rows, +-127 cols); the
    returned flag marks targets whose displacement was inside the window.

    tex: (H, W) or (H, W, C<=8) f32. ty/tx: (H, W) int32. fy/fx: (H, W)
    f32 fractions in [0, 1) for bilinear/catrom.
    Returns (value (H, W[, C]), in_window (H, W) bool).

    Under an active row-sharding mesh (parallel.context) the kernel runs
    per shard inside ``shard_map`` on a ppermute halo-extended block —
    identical values (the window bound IS the halo bound), collectives
    limited to the halo hops.
    """
    from ...parallel.context import row_mesh_for

    mesh = row_mesh_for(int(tex.shape[0]))
    if mesh is not None:
        return _window_warp_sharded(tex, ty, tx, fy, fx, ky, mode, kx, mesh)
    return _window_warp_local(tex, ty, tx, fy, fx, ky, mode, kx)


def _window_warp_sharded(tex, ty, tx, fy, fx, ky, mode, kx, mesh):
    """shard_map formulation: halo-exchange ``ky + filter-reach`` rows,
    run the single-chip kernel on the extended block in shard-local
    coordinates, crop. The edge-replicated halo reproduces the global
    clamp-to-edge reads exactly (the kernel's frame clamp never binds
    inside the halo), and the in-window flag only sees the displacement
    ``ty - row``, which is translation-invariant."""
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    from ...parallel.halo import halo_exchange_rows
    from ...parallel.sharding import ROW_AXIS

    halo = ky + _HALO_EXTRA[mode]
    h = tex.shape[0]
    zeros = jnp.zeros(ty.shape, jnp.float32)
    fy = zeros if fy is None else fy
    fx = zeros if fx is None else fx

    def local(tex_b, ty_b, tx_b, fy_b, fx_b):
        idx = _jax.lax.axis_index(ROW_AXIS)
        h_loc = ty_b.shape[0]
        row0 = idx * h_loc - halo
        ext = halo_exchange_rows(tex_b, halo)

        def pad(a):
            return jnp.pad(a, ((halo, halo),) + ((0, 0),) * (a.ndim - 1),
                           mode="edge")

        val, flag = _window_warp_local(
            ext, pad(ty_b - row0), pad(tx_b), pad(fy_b), pad(fx_b),
            ky, mode, kx,
        )
        return val[halo: halo + h_loc], flag[halo: halo + h_loc]

    # check_vma=False: pallas_call out_shapes carry no vma annotation
    return _jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ROW_AXIS),) * 5,
        out_specs=(P(ROW_AXIS), P(ROW_AXIS)),
        check_vma=False,
    )(tex, ty, tx, fy, fx)


def _window_warp_local(tex, ty, tx, fy, fx, ky, mode, kx=None):
    squeeze = tex.ndim == 2
    base = tex[..., None] if squeeze else tex
    h, w = base.shape[0], base.shape[1]
    c = base.shape[2]
    br = _choose_br(ky)

    planar = _pad_hw(jnp.moveaxis(base, -1, 0), br, BC)
    hp, wp = planar.shape[1], planar.shape[2]
    nr, nc = hp // br, wp // BC

    pad2 = lambda a: _pad_hw(a, br, BC)
    # keep raw (possibly out-of-frame) targets so per-tap frame clamping
    # reproduces GL border reads; bound them only against int overflow
    lim = 1 << 20
    ty_p = pad2(jnp.clip(ty, -lim, lim))
    tx_p = pad2(jnp.clip(tx, -lim, lim))
    zero = jnp.zeros((hp, wp), jnp.float32)
    fy_p = pad2(fy) if fy is not None else zero
    fx_p = pad2(fx) if fx is not None else zero

    idx_spec, halo = _specs(c, br, nr, nc)
    kern = functools.partial(_warp_kernel, ky=ky, kx=kx, mode=mode, c=c,
                             h=h, w=w)
    val, flag = pl.pallas_call(
        kern,
        grid=(nr, nc),
        in_specs=[idx_spec, idx_spec, idx_spec, idx_spec] + halo,
        out_specs=(
            pl.BlockSpec((c, br, BC), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, BC), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(ty_p, tx_p, fy_p, fx_p, *([planar] * 9))
    val = jnp.moveaxis(val[:, :h, :w], 0, -1)
    flag = flag[0, :h, :w] > 0.5
    if squeeze:
        val = val[..., 0]
    return val, flag


# --------------------------------------------------------------------------
# multi-target variant: N nearest fetches sharing one slab assembly
# --------------------------------------------------------------------------

def _warp_multi_kernel(ty_ref, tx_ref, *refs, ky: int, kx: int | None,
                       c: int, h: int, w: int, n: int):
    """Grid (NR, NC). ty/tx: (n, br, BC). refs: 9 halo blocks of the
    planar (C, H', W') texture, then (val (n*c, br, BC), flag (n, br, BC)).
    Nearest mode only; the slab is assembled once per channel and reused
    by every target — the whole point vs n separate window_warp calls.
    ``kx``: see :func:`_warp_kernel` (two-window lane-split when set)."""
    srcs = refs[:9]
    val_ref, flag_ref = refs[9], refs[10]
    i = pl.program_id(0)
    j = pl.program_id(1)
    br = ty_ref.shape[1]

    ii = jax.lax.broadcasted_iota(jnp.int32, (br, BC), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (br, BC), 1)
    rr = i * br + ii
    cc = j * BC + jj
    kxw = BC - 1 if kx is None else kx
    left_half = jj < 64
    o1, o2 = BC - kxw, BC + 64 - kxw

    # per-target lane addresses + vertical candidates (channel-invariant)
    tgt = []
    for t in range(n):
        ty = ty_ref[t]
        tx = tx_ref[t]
        dy = ty - rr
        dx = tx - cc
        in_window = (jnp.abs(dy) <= ky) & (jnp.abs(dx) <= kxw)
        dyv = jnp.clip(jnp.clip(jnp.clip(dy, -ky, ky), -rr, (h - 1) - rr),
                       -ky, ky)
        dxk = jnp.clip(jnp.clip(tx, 0, w - 1) - cc, -kxw, kxw)
        txa = jj + dxk + BC
        if kx is None:
            tgt.append((dyv, txa // BC - 1, txa % BC))
        else:
            tgt.append((dyv, jnp.clip(txa - o1, 0, BC - 1),
                        jnp.clip(txa - o2, 0, BC - 1)))
        flag_ref[t] = in_window.astype(jnp.float32)

    def gather_3g(slab_row, lq, lr):
        out = None
        for d in (-1, 0, 1):
            grp = slab_row[:, BC * (1 + d): BC * (1 + d) + BC]
            g = jnp.take_along_axis(grp, lr, axis=1)
            out = g if out is None else jnp.where(lq == d, g, out)
        return out

    for cidx in range(c):
        rows3 = [
            jnp.concatenate([srcs[3 * r + cg][cidx] for cg in range(3)],
                            axis=1)
            for r in range(3)
        ]
        slab = jnp.concatenate(rows3, axis=0)   # (3*br, 3*BC)
        accs = [jnp.zeros((br, BC), jnp.float32) for _ in range(n)]
        for v in range(-ky, ky + 1):
            row_v = slab[br + v: br + v + br]
            if kx is not None:
                w1 = row_v[:, o1: o1 + BC]
                w2 = row_v[:, o2: o2 + BC]
            for t in range(n):
                if kx is None:
                    dyv, lq, lr = tgt[t]
                    g = gather_3g(row_v, lq, lr)
                else:
                    dyv, lr1, lr2 = tgt[t]
                    g = jnp.where(
                        left_half,
                        jnp.take_along_axis(w1, lr1, axis=1),
                        jnp.take_along_axis(w2, lr2, axis=1),
                    )
                accs[t] = jnp.where(dyv == v, g, accs[t])
        for t in range(n):
            val_ref[t * c + cidx] = accs[t]


def window_warp_multi(tex: jnp.ndarray, ty: jnp.ndarray, tx: jnp.ndarray,
                      ky: int = _DEF_KY, kx: int | None = None):
    """N nearest window fetches from one texture, slab loads shared.

    tex: (H, W) or (H, W, C<=8) f32. ty/tx: (N, H, W) int32 targets.
    Per-tap frame clamp then window clamp like :func:`window_warp`.
    Returns (values (N, H, W[, C]), in_window (N, H, W) bool).

    Routes through shard_map + halo exchange under an active mesh, like
    :func:`window_warp`."""
    from ...parallel.context import row_mesh_for

    mesh = row_mesh_for(int(tex.shape[0]))
    if mesh is not None:
        return _window_warp_multi_sharded(tex, ty, tx, ky, kx, mesh)
    return _window_warp_multi_local(tex, ty, tx, ky, kx)


def _window_warp_multi_sharded(tex, ty, tx, ky, kx, mesh):
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    from ...parallel.halo import halo_exchange_rows
    from ...parallel.sharding import ROW_AXIS

    halo = ky  # nearest mode: no filter reach beyond the window

    def local(tex_b, ty_b, tx_b):
        idx = _jax.lax.axis_index(ROW_AXIS)
        h_loc = ty_b.shape[1]
        row0 = idx * h_loc - halo
        ext = halo_exchange_rows(tex_b, halo)

        def pad(a):
            return jnp.pad(a, ((0, 0), (halo, halo), (0, 0)), mode="edge")

        val, flag = _window_warp_multi_local(ext, pad(ty_b - row0),
                                             pad(tx_b), ky, kx)
        return val[:, halo: halo + h_loc], flag[:, halo: halo + h_loc]

    return _jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ROW_AXIS), P(None, ROW_AXIS), P(None, ROW_AXIS)),
        out_specs=(P(None, ROW_AXIS), P(None, ROW_AXIS)),
        check_vma=False,
    )(tex, ty, tx)


def _window_warp_multi_local(tex, ty, tx, ky, kx=None):
    squeeze = tex.ndim == 2
    base = tex[..., None] if squeeze else tex
    h, w = base.shape[0], base.shape[1]
    c = base.shape[2]
    n = ty.shape[0]
    br = max(32, min(128, 8 * -(-(ky + 8) // 8)))

    planar = _pad_hw(jnp.moveaxis(base, -1, 0), br, BC)
    hp, wp = planar.shape[1], planar.shape[2]
    nr, nc = hp // br, wp // BC

    lim = 1 << 20
    pad3 = lambda a: _pad_hw(jnp.clip(a, -lim, lim), br, BC)
    ty_p = pad3(ty)
    tx_p = pad3(tx)

    def mk(dr, dc):
        def im(i, j, dr=dr, dc=dc):
            return (0, jnp.clip(i + dr, 0, nr - 1), jnp.clip(j + dc, 0, nc - 1))
        return pl.BlockSpec((c, br, BC), im, memory_space=pltpu.VMEM)

    idx_spec = pl.BlockSpec((n, br, BC), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    halo = [mk(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
    kern = functools.partial(_warp_multi_kernel, ky=ky, kx=kx, c=c, h=h,
                             w=w, n=n)
    val, flag = pl.pallas_call(
        kern,
        grid=(nr, nc),
        in_specs=[idx_spec, idx_spec] + halo,
        out_specs=(
            pl.BlockSpec((n * c, br, BC), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, br, BC), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n * c, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((n, hp, wp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(ty_p, tx_p, *([planar] * 9))
    val = val[:, :h, :w].reshape(n, c, h, w)
    val = jnp.moveaxis(val, 1, -1)
    flag = flag[:, :h, :w] > 0.5
    if squeeze:
        val = val[..., 0]
    return val, flag


def nearest_window_multi(tex: jnp.ndarray, uvs: jnp.ndarray,
                         ky: int = _DEF_KY, kx: int | None = None):
    """N nearest fetches at ``uvs`` (N, H, W, 2) via the multi-target
    kernel. Returns (values (N, H, W[, C]), in_window (N, H, W))."""
    h, w = tex.shape[0], tex.shape[1]
    ix = jnp.floor(uvs[..., 0] * w).astype(jnp.int32)
    iy = jnp.floor(uvs[..., 1] * h).astype(jnp.int32)
    return window_warp_multi(tex, iy, ix, ky=ky, kx=kx)


# --------------------------------------------------------------------------
# jnp reference (test oracle; also documents the exact semantics)
# --------------------------------------------------------------------------

def window_warp_ref(tex, ty, tx, fy=None, fx=None, ky=_DEF_KY,
                    mode="nearest", kx=None):
    """Gather-based reference with identical semantics (per-tap frame
    clamp, then window clamp; in_window flag from the raw displacement)."""
    squeeze = tex.ndim == 2
    base = tex[..., None] if squeeze else tex
    h, w = base.shape[0], base.shape[1]
    kxw = BC - 1 if kx is None else kx + _HALO_EXTRA[mode]
    kxf = BC - 1 if kx is None else kx
    ys = jnp.arange(h, dtype=jnp.int32)[:, None] * jnp.ones_like(ty)
    xs = jnp.arange(w, dtype=jnp.int32)[None, :] * jnp.ones_like(tx)
    dy = ty - ys
    dx = tx - xs
    in_window = (jnp.abs(dy) <= ky) & (jnp.abs(dx) <= kxf)
    dyc = jnp.clip(dy, -ky, ky)

    def row_at(bo):
        return ys + jnp.clip(jnp.clip(dyc + bo, -ys, (h - 1) - ys),
                             -ky + bo_min, ky + bo_max)

    def col_at(k):
        dxk = jnp.clip(jnp.clip(tx + k, 0, w - 1) - xs, -kxw, kxw)
        return xs + dxk

    band_off = _BAND_OFF[mode]
    tap_off = _TAP_OFF[mode]
    bo_min, bo_max = min(band_off), max(band_off)

    if mode == "nearest":
        wy = wx = (jnp.ones_like(ys, jnp.float32),)
    elif mode == "bilinear":
        wx = (1.0 - fx, fx)
        wy = (1.0 - fy, fy)
    else:
        wx = _crw(fx)
        wy = _crw(fy)

    expand = (lambda a: a[..., None])
    out = 0.0
    for b, bo in enumerate(band_off):
        row = 0.0
        yb = row_at(bo)
        for k, ko in enumerate(tap_off):
            if mode == "catrom5" and b in _C5_OUTER and k in (0, 3):
                continue  # corner texels carry zero weight in the 5-tap
            row = row + base[yb, col_at(ko)] * expand(wx[k])
        out = out + row * expand(wy[b])
    if squeeze:
        out = out[..., 0]
    return out, in_window


# --------------------------------------------------------------------------
# uv-level convenience wrappers (drop-in for the core.sampling fetches)
# --------------------------------------------------------------------------

def catmull_rom_window(tex: jnp.ndarray, uv: jnp.ndarray, ky: int = _DEF_KY,
                       kx: int | None = None):
    """Catmull-Rom history sample at reprojected ``uv`` via the window
    kernel (replaces `sample_catmull_rom_5tap`'s 5 packed gathers;
    `reproject.frag:212-255` semantics on the true 4x4 footprint, which
    the reference's 5 bilinear taps approximate).
    Returns (rgba >= 0, in_window flag)."""
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    val, ok = window_warp(
        tex, y0.astype(jnp.int32), x0.astype(jnp.int32),
        fy=(y - y0), fx=(x - x0), ky=ky, mode="catrom", kx=kx,
    )
    return jnp.maximum(val, 0.0), ok


def catmull_rom5_window(tex: jnp.ndarray, uv: jnp.ndarray,
                        ky: int = _DEF_KY, half: bool = True,
                        kx: int | None = None):
    """EXACT `sample_catmull_rom_5tap` semantics via the window kernel
    (`reproject.frag:212-255`): corner-zeroed 4x4 footprint, normalized
    by the 5-tap weight total, clamped >= 0. ``half=True`` quantizes the
    texture to f16 first — the history is an rgba16f render target
    (`TemporalReprojectPass.js:141-144`) and the gather path samples that
    storage. Returns (rgba, in_window flag)."""
    if half:
        tex = tex.astype(jnp.float16).astype(jnp.float32)
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    val, ok = window_warp(
        tex, y0.astype(jnp.int32), x0.astype(jnp.int32),
        fy=fy, fx=fx, ky=ky, mode="catrom5", kx=kx,
    )
    w0x, _, _, w3x = _crw(fx)
    w0y, _, _, w3y = _crw(fy)
    total = 1.0 - (w0x + w3x) * (w0y + w3y)
    if tex.ndim == 3:
        total = total[..., None]
    return jnp.maximum(val / total, 0.0), ok


def bilinear_window(tex: jnp.ndarray, uv: jnp.ndarray, ky: int = _DEF_KY,
                    kx: int | None = None):
    """Bilinear fetch at ``uv`` via the window kernel (LinearFilter
    semantics with clamp-to-edge, like core.sampling.sample_bilinear)."""
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = jnp.where(x0 < 0.0, 0.0, x - x0)
    fy = jnp.where(y0 < 0.0, 0.0, y - y0)
    val, ok = window_warp(
        tex, y0.astype(jnp.int32), x0.astype(jnp.int32),
        fy=fy, fx=fx, ky=ky, mode="bilinear", kx=kx,
    )
    return val, ok


def nearest_window(tex: jnp.ndarray, uv: jnp.ndarray, ky: int = _DEF_KY,
                   kx: int | None = None):
    """Nearest fetch at ``uv`` via the window kernel (texelFetch)."""
    h, w = tex.shape[0], tex.shape[1]
    ix = jnp.floor(uv[..., 0] * w).astype(jnp.int32)
    iy = jnp.floor(uv[..., 1] * h).astype(jnp.int32)
    return window_warp(tex, iy, ix, ky=ky, mode="nearest", kx=kx)
