"""Fully-fused Poisson-denoise pass kernel (K6 hot path).

One pallas_call runs an ENTIRE denoise pass of
`/root/reference/src/denoise/shader/poisson_denoise.frag` (via the jnp
formulation in `ops/poisson_denoise.py::poisson_denoise_pass`): per
(64, 128) block it computes the blue-noise tap rotation from the
pre-rolled tile (block rows align with the 128-px noise period), the
fwidth-based flatness, the 8 rotated tap targets, fetches every tap
channel from the in-VMEM 3x3-halo slab, and evaluates the edge-stopping
weights and accumulation in registers — nothing but the output planes
touches HBM. The previous formulation paid ~25 ms/pass at 1080p: a
dense-select taps kernel (~187 (dy,dx) candidates/tap) plus ~40
full-res XLA weight planes round-tripping HBM.

Two TPU-specific fetch choices (measured on v5e, where a 128-lane
vgather costs ~4-5 cycles/vreg and selects ~1):

- **Packed channels, decoded in registers.** The slab carries the
  REFERENCE's own storage: [depth f32 | oct-half2x16 normal | rough f32
  | (rg, ba) half2x16 per texture] (`gbuffer_packing.glsl:61`,
  rgba16f denoise targets) — 3 + 2*n_tex channels instead of 11
  unpacked. The f16 halves are expanded in-kernel with bit-exact
  integer ops (probe-verified against ``unpack_half2x16``), so tap
  values equal the jnp bundle path exactly.
- **Two-window lane-split gather.** Tap reach is <= ~radius*2+1 px
  horizontally (kx <= 32 enforced), so a target lane of an output lane
  jj < 64 always falls in slab lanes [BC-kx, 2*BC-kx) and jj >= 64 in
  [BC+64-kx, 2*BC+64-kx): two static lane-rotations (shared across all
  8 taps per slab row) + 2 vgathers + one static-mask select replace
  the 3-group gather chain (3 vgathers + 3 selects).

Weight math matches `poisson_denoise.frag:94-127` op-for-op; values
differ from the jnp path only by transcendental ULPs
(tests/test_poisson_fused.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.packing import pack_half2x16, pack_normal
from ...core.rng import rolled_noise_tile
from .stencil import _use_interpret
from .warp import BC, _pad_hw

_BR = 64
_TILE = 128
_PI2 = float(2.0 * np.pi)
_SQRT2_4 = 0.25 * float(np.sqrt(2.0))
# `poisson_denoise.frag:91-92` (kept in sync with poisson_denoise.POISSON8)
_POISSON8 = (
    (-1.0, 0.0), (0.0, -1.0), (1.0, 0.0), (0.0, 1.0),
    (-_SQRT2_4, -_SQRT2_4), (_SQRT2_4, -_SQRT2_4),
    (_SQRT2_4, _SQRT2_4), (-_SQRT2_4, _SQRT2_4),
)
_MAX_KX = 32   # two-window lane-split bound


def _windows(radius: float, hg: int, wg: int):
    """Tap reach ((axis ky, diag ky), kx) — the dense_windows law of
    `poisson_taps.py:41-56`."""
    out = []
    for norm in (1.0, 0.5):
        out.append(int(np.ceil(radius * norm * float(np.hypot(hg / wg, 1.0)))) + 1)
    kx = int(np.ceil(radius * float(np.hypot(1.0, wg / hg)))) + 1
    return out[0], out[1], kx


def _pow(x, e: float):
    """x ** e for x >= 0 (x == 0 -> 0, matching XLA pow on f32)."""
    return jnp.exp(jnp.log(x) * e)


def _f16_expand(b16):
    """f16 bits (uint32 in [0, 0xFFFF]) -> f32, bit-exact vs
    ``unpack_half2x16`` incl. subnormals and inf/nan."""
    s = (b16 >> 15) & np.uint32(0x1)
    e = (b16 >> 10) & np.uint32(0x1F)
    m = b16 & np.uint32(0x3FF)
    norm_bits = (s << 31) | ((e + np.uint32(112)) << 23) | (m << 13)
    normal = jax.lax.bitcast_convert_type(norm_bits, jnp.float32)
    sgn = 1.0 - 2.0 * s.astype(jnp.int32).astype(jnp.float32)
    sub = m.astype(jnp.int32).astype(jnp.float32) * (2.0 ** -24) * sgn
    inf_bits = (s << 31) | np.uint32(0x7F800000) | (m << 13)
    inf = jax.lax.bitcast_convert_type(inf_bits, jnp.float32)
    return jnp.where(e == 0, sub, jnp.where(e == 31, inf, normal))


def _unpack2(f):
    """float32 carrying two f16 -> (lo, hi) f32 (= ``unpack_half2x16``)."""
    bits = jax.lax.bitcast_convert_type(f, jnp.uint32)
    return _f16_expand(bits & np.uint32(0xFFFF)), _f16_expand(bits >> 16)


def _oct_decode(fx, fy):
    """`core/packing.decode_oct` on two planes -> (nx, ny, nz)."""
    fx = fx * 2.0 - 1.0
    fy = fy * 2.0 - 1.0
    z = 1.0 - jnp.abs(fx) - jnp.abs(fy)
    t = jnp.maximum(-z, 0.0)
    x = fx + jnp.where(fx >= 0.0, -t, t)
    y = fy + jnp.where(fy >= 0.0, -t, t)
    n = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-20)
    return x / n, y / n, z / n


def _unpack_normal3(packed):
    """The jnp path's ``where(n_valid, unpack_normal(packed), 0)``:
    invalid (background) normals were packed as exactly 0.0, and decode
    back to (0, 0, 0) — NOT to oct-decode(0, 0) = (0, 0, -1)."""
    lo, hi = _unpack2(packed)
    x, y, z = _oct_decode(lo, hi)
    bits = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    valid = bits != 0
    zero = jnp.zeros_like(x)
    return (jnp.where(valid, x, zero), jnp.where(valid, y, zero),
            jnp.where(valid, z, zero))


def _poisson_kernel(row0_ref, noise_ref, *refs, n_tex: int, scalar_slots,
                    hg: int, wg: int, aky: int, dky: int, kx: int, cfg):
    c_tot = 3 + sum(1 if s else 2 for s in scalar_slots)
    srcs = refs[:9]
    out_ref = refs[9]
    i = pl.program_id(0)
    j = pl.program_id(1)
    br = srcs[4].shape[1]

    ii = jax.lax.broadcasted_iota(jnp.int32, (br, BC), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (br, BC), 1)
    rr_l = i * br + ii
    row0 = row0_ref[0]
    rr_g = rr_l + row0
    cc = j * BC + jj
    left_half = jj < 64

    # per-channel halo slabs (3*br, 3*BC)
    slabs = [
        jnp.concatenate(
            [
                jnp.concatenate(
                    [srcs[3 * r + cg][c] for cg in range(3)], axis=1
                )
                for r in range(3)
            ],
            axis=0,
        )
        for c in range(c_tot)
    ]
    center = lambda c: slabs[c][br: 2 * br, BC: 2 * BC]

    d_c = center(0)
    nc_x, nc_y, nc_z = _unpack_normal3(center(1))
    rough_c = center(2)

    # flatness from fwidth(quantized normal) (`poisson_denoise.frag:150-152`
    # via math3d.fwidth: forward diffs, edge-replicated at the FRAME edge)
    mid1 = slabs[1][br: 2 * br]
    nr_x, nr_y, nr_z = _unpack_normal3(mid1[:, BC + 1: 2 * BC + 1])
    nd_x, nd_y, nd_z = _unpack_normal3(
        slabs[1][br + 1: 2 * br + 1, BC: 2 * BC]
    )
    right_ok = (cc < wg - 1).astype(jnp.float32)
    down_ok = (rr_g < hg - 1).astype(jnp.float32)
    fw2 = jnp.zeros((br, BC), jnp.float32)
    for c0, cr, cd in ((nc_x, nr_x, nd_x), (nc_y, nr_y, nd_y),
                       (nc_z, nr_z, nd_z)):
        fw = jnp.abs(cr - c0) * right_ok + jnp.abs(cd - c0) * down_ok
        fw2 = fw2 + fw * fw
    flatness = 1.0 - jnp.minimum(jnp.sqrt(fw2), 1.0)
    flatness = flatness * flatness * 0.75 + 0.25

    # tap targets (`poisson_denoise.frag:185-190`)
    angle = noise_ref[0] * _PI2
    s_ = jnp.sin(angle)
    c_ = jnp.cos(angle)
    rscale = cfg.radius * flatness
    uvx = (cc.astype(jnp.float32) + 0.5) * (1.0 / wg)
    uvy = (rr_g.astype(jnp.float32) + 0.5) * (1.0 / hg)

    tgts = []
    for k in range(8):
        off0, off1 = _POISSON8[k]
        ox = (c_ * (off0 / wg) + s_ * (off1 / hg)) * rscale
        oy = (-s_ * (off0 / wg) + c_ * (off1 / hg)) * rscale
        ixt = jnp.clip(
            jnp.floor((uvx + ox) * wg).astype(jnp.int32), 0, wg - 1
        )
        iyt = jnp.clip(
            jnp.floor((uvy + oy) * hg).astype(jnp.int32), 0, hg - 1
        )
        kyk = aky if k < 4 else dky
        dyv = jnp.clip((iyt - row0) - rr_l, -kyk, kyk)
        txa = jj + jnp.clip(ixt - cc, -kx, kx) + BC
        # the off-half index of each pixel is unused but must stay lane-
        # range for the vgather
        lr1 = jnp.clip(txa - (BC - kx), 0, BC - 1)
        lr2 = jnp.clip(txa - (BC + 64 - kx), 0, BC - 1)
        tgts.append((dyv, lr1, lr2))

    # tap fetch: two-window lane-split gather, channel-major
    o1, o2 = BC - kx, BC + 64 - kx
    tv = [[jnp.zeros((br, BC), jnp.float32) for _ in range(c_tot)]
          for _ in range(8)]
    for c in range(c_tot):
        slab = slabs[c]
        for v in range(-aky, aky + 1):
            row_v = slab[br + v: br + v + br]
            w1 = row_v[:, o1: o1 + BC]
            w2 = row_v[:, o2: o2 + BC]
            for k in range(8):
                if abs(v) > (aky if k < 4 else dky):
                    continue
                dyv, lr1, lr2 = tgts[k]
                g = jnp.where(
                    left_half,
                    jnp.take_along_axis(w1, lr1, axis=1),
                    jnp.take_along_axis(w2, lr2, axis=1),
                )
                tv[k][c] = jnp.where(dyv == v, g, tv[k][c])

    # center state per slot (`poisson_denoise_pass` lines 134-144)
    lw = (0.2125, 0.7154, 0.0721)

    def luminance8(r, g, b):
        return _pow(jnp.maximum(r * lw[0] + g * lw[1] + b * lw[2], 0.0),
                    0.125)

    slot_ch = []           # first slab channel of each slot
    ch = 3
    for s_t in range(n_tex):
        slot_ch.append(ch)
        ch += 1 if scalar_slots[s_t] else 2

    slots = []
    for s_t in range(n_tex):
        c0 = slot_ch[s_t]
        if scalar_slots[s_t]:
            v0, alpha = _unpack2(center(c0))
            rgb_raw = (v0, v0, v0)
        else:
            r0, g0 = _unpack2(center(c0))
            b0, alpha = _unpack2(center(c0 + 1))
            rgb_raw = (r0, g0, b0)
        t_rgb = tuple(jnp.log(x * 1.0003 + 1.0) for x in rgb_raw)
        lum = luminance8(*t_rgb)
        age = 1.0 / _pow(alpha + 1.0, 1.2 * cfg.phi)
        slots.append({
            "raw": rgb_raw, "alpha": alpha, "lum": lum, "age": age,
            "acc": list(t_rgb),
            "total": jnp.ones((br, BC), jnp.float32),
        })

    glossiness = jnp.maximum(0.0, 4.0 * (1.0 - rough_c / 0.25))
    specular_factor = jnp.exp(-glossiness * cfg.specular_phi)

    # edge-stopping weights + accumulation (`poisson_denoise.frag:94-127`)
    for k in range(8):
        n_depth = tv[k][0]
        nt_x, nt_y, nt_z = _unpack_normal3(tv[k][1])
        n_rough = tv[k][2]
        ndot = nc_x * nt_x + nc_y * nt_y + nc_z * nt_z
        normal_diff = 1.0 - jnp.maximum(ndot, 0.0)
        depth_diff = 10000.0 * jnp.abs(d_c - n_depth)
        rough_diff = jnp.abs(rough_c - n_rough)
        w_basic = jnp.exp(
            -normal_diff * cfg.normal_phi
            - depth_diff * cfg.depth_phi
            - rough_diff * cfg.roughness_phi
        )
        w_basic = jnp.where(n_depth >= 1.0, 0.0, w_basic)

        for s_t in range(n_tex):
            c0 = slot_ch[s_t]
            if scalar_slots[s_t]:
                tvv, _ = _unpack2(tv[k][c0])
                t_raw = (tvv, tvv, tvv)
            else:
                tr0, tg0 = _unpack2(tv[k][c0])
                tb0, _ = _unpack2(tv[k][c0 + 1])
                t_raw = (tr0, tg0, tb0)
            spec = cfg.is_specular[s_t] if s_t < len(cfg.is_specular) \
                else False
            wgt = w_basic * (specular_factor if spec else 1.0)
            tr = tuple(
                jnp.log(jnp.maximum(x, 0.0) + 1.0) for x in t_raw
            )
            disoccl_w = _pow(jnp.maximum(wgt, 1e-20), 0.1)
            luma_diff = jnp.minimum(
                jnp.abs(slots[s_t]["lum"] - luminance8(*tr)), 0.5
            )
            luma_factor = jnp.exp(-luma_diff * cfg.luma_phi)
            age = slots[s_t]["age"]
            wl = wgt * luma_factor
            wgt = (wl + (disoccl_w - wl) * age) * age
            wgt = wgt * (wgt >= 0.0001)
            for ch_i in range(3):
                slots[s_t]["acc"][ch_i] = (
                    slots[s_t]["acc"][ch_i] + wgt * tr[ch_i]
                )
            slots[s_t]["total"] = slots[s_t]["total"] + wgt

    is_bg = d_c >= 1.0
    for s_t in range(n_tex):
        total = slots[s_t]["total"]
        for ch_i in range(3):
            o = jnp.exp(slots[s_t]["acc"][ch_i] / total) - 1.0
            out_ref[4 * s_t + ch_i] = jnp.where(
                is_bg, slots[s_t]["raw"][ch_i], o
            )
        out_ref[4 * s_t + 3] = slots[s_t]["alpha"]


#: route denoise passes through the fused kernel
USE_FUSED_PASS = True

#: interpret-mode (non-TPU) evaluation of the fused kernel is only for
#: its dedicated parity tests — the unrolled per-block program compiles
#: pathologically slowly on XLA:CPU, so the default CPU path stays the
#: jnp formulation (tests force this flag to exercise the kernel)
FORCE_INTERPRET = False


def fused_pass_supported(cfg, n_tex: int, hg: int, wg: int) -> bool:
    if _use_interpret() and not FORCE_INTERPRET:
        return False
    aky, _dky, kx = _windows(cfg.radius, hg, wg)
    return n_tex <= 4 and aky <= _BR and kx <= _MAX_KX


def poisson_pass_fused(textures, gbuffer, noise_index, cfg,
                       row_offset=0, resolution=None, scalar_slots=None):
    """One fused denoise pass; drop-in for the body of
    ``poisson_denoise_pass`` (same semantics, ULP-level differences).

    Under an active row mesh (and no explicit ``resolution``, i.e. not
    already inside a shard_map) the pass self-shards with a ppermute
    halo exchange like the warp kernels.

    ``scalar_slots[i]`` marks textures whose rgb channels are one
    replicated scalar (the AO path) — they ride a single packed channel."""
    from ...parallel.context import row_mesh_for

    h, w = gbuffer.depth.shape
    hg, wg = resolution if resolution is not None else (h, w)
    n_tex = len(textures)
    if scalar_slots is None:
        scalar_slots = (False,) * n_tex
    aky, dky, kx = _windows(cfg.radius, hg, wg)

    # the reference's packed storage: oct-half2x16 normals, rgba16f texels
    n_valid = (
        jnp.sum(jnp.abs(gbuffer.normal), axis=-1, keepdims=True) > 1e-8
    )
    packed_nrm = jnp.where(
        n_valid[..., 0], pack_normal(gbuffer.normal), 0.0
    )
    planes = [gbuffer.depth, packed_nrm, gbuffer.roughness]
    for s_t, t in enumerate(textures):
        if scalar_slots[s_t]:
            planes.append(pack_half2x16(t[..., 0::3]))  # (value, alpha)
        else:
            planes.append(pack_half2x16(t[..., 0:2]))
            planes.append(pack_half2x16(t[..., 2:4]))
    bundle = jnp.stack(planes, axis=-1)              # (H, W, C)

    mesh = row_mesh_for(h) if resolution is None else None
    if mesh is not None:
        out4 = _fused_sharded(bundle, noise_index, cfg, n_tex,
                              tuple(scalar_slots), aky, dky, kx, h, w, mesh)
    else:
        noise = jnp.moveaxis(
            rolled_noise_tile(noise_index, row_offset=row_offset)[..., :1],
            -1, 0,
        )
        row0 = jnp.asarray(row_offset, jnp.int32).reshape(1)
        out4 = _fused_local(bundle, noise, row0, cfg, n_tex,
                            tuple(scalar_slots), aky, dky, kx, hg, wg)

    return [
        jnp.moveaxis(out4[4 * s_t: 4 * s_t + 4], 0, -1)
        for s_t in range(n_tex)
    ]


def _fused_sharded(bundle, noise_index, cfg, n_tex, scalar_slots,
                   aky, dky, kx, hg, wg, mesh):
    from jax.sharding import PartitionSpec as P

    from ...parallel.halo import halo_exchange_rows
    from ...parallel.sharding import ROW_AXIS

    noise = jnp.moveaxis(
        rolled_noise_tile(noise_index, row_offset=0)[..., :1], -1, 0
    )

    def local(bun_b, noise_b):
        idx = jax.lax.axis_index(ROW_AXIS)
        h_loc = bun_b.shape[0]
        row0 = idx * h_loc - aky
        ext = halo_exchange_rows(bun_b, aky)
        noise_l = jnp.roll(noise_b, -jnp.mod(row0, _TILE), axis=1)
        out4 = _fused_local(ext, noise_l,
                            row0.astype(jnp.int32).reshape(1),
                            cfg, n_tex, scalar_slots, aky, dky, kx, hg, wg)
        return out4[:, aky: aky + h_loc]

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ROW_AXIS), P()),
        out_specs=P(None, ROW_AXIS),
        check_vma=False,
    )(bundle, noise)


def _fused_local(bundle, noise, row0, cfg, n_tex, scalar_slots,
                 aky, dky, kx, hg, wg):
    h, w = bundle.shape[0], bundle.shape[1]
    c_tot = bundle.shape[2]
    planar = _pad_hw(jnp.moveaxis(bundle, -1, 0), _BR, BC)
    hp, wp = planar.shape[1], planar.shape[2]
    nr, nc = hp // _BR, wp // BC

    def mk(dr, dc):
        def im(i, j, dr=dr, dc=dc):
            return (0, jnp.clip(i + dr, 0, nr - 1), jnp.clip(j + dc, 0, nc - 1))
        return pl.BlockSpec((c_tot, _BR, BC), im, memory_space=pltpu.VMEM)

    halo = [mk(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
    noise_spec = pl.BlockSpec((1, _BR, _TILE),
                              lambda i, j: (0, i % (_TILE // _BR), 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(_poisson_kernel, n_tex=n_tex,
                             scalar_slots=scalar_slots, hg=hg, wg=wg,
                             aky=aky, dky=dky, kx=kx, cfg=cfg)
    out = pl.pallas_call(
        kern,
        grid=(nr, nc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), noise_spec] + halo,
        out_specs=pl.BlockSpec((4 * n_tex, _BR, BC), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * n_tex, hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(row0, noise, *([planar] * 9))
    return out[:, :h, :w]
