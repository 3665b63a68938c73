"""Fully-fused Poisson-denoise pass kernel (K6 hot path).

One pallas_call runs an ENTIRE denoise pass of
`/root/reference/src/denoise/shader/poisson_denoise.frag` (via the jnp
formulation in `ops/poisson_denoise.py::poisson_denoise_pass`): per
(64, 128) block it computes the blue-noise tap rotation from the
pre-rolled tile (block rows align with the 128-px noise period), the
fwidth-based flatness, the 8 rotated tap targets, fetches every tap
channel from the in-VMEM 3x3-halo slab (radius-bounded lane-gather +
vertical dense-select, the `warp.py` scheme), and evaluates the
edge-stopping weights and accumulation in registers. The previous
formulation paid ~25 ms/pass at 1080p: a dense-select taps kernel
(~187 (dy,dx) candidates/tap, `poisson_taps.py`) plus ~40 full-res XLA
elementwise planes of weight math round-tripping HBM; here the fetch is
(2*ky+1) candidates/tap and the weight math never leaves VMEM.

Channel layout of the slab (planar f32): [depth, roughness, nq.xyz,
rgb per texture slot] — normals pre-quantized through the reference's
oct-half2x16 codec and textures pre-quantized to f16, so tap values
equal the packed-storage fetches of the jnp path
(`poisson_denoise.frag:59,85`; rgba16f targets). Weight math matches
`poisson_denoise.frag:94-127` op-for-op; values differ from the jnp
path only by transcendental ULPs (tests/test_poisson_fused.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.packing import pack_normal, unpack_normal
from ...core.rng import rolled_noise_tile
from .stencil import _use_interpret
from .warp import BC, _pad_hw
from .hbao import _gather_h

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


def _windows(radius: float, hg: int, wg: int):
    """Vertical tap reach (axis taps, diagonal taps) — the dense_windows
    law of `poisson_taps.py:41-56`, vertical component only (horizontal
    reach is covered by the +-127 lane window)."""
    out = []
    for norm in (1.0, 0.5):
        out.append(int(np.ceil(radius * norm * float(np.hypot(hg / wg, 1.0)))) + 1)
    kx = int(np.ceil(radius * float(np.hypot(1.0, wg / hg)))) + 1
    return out[0], out[1], kx


def _pow(x, e: float):
    """x ** e for x >= 0 (x == 0 -> 0, matching XLA pow on f32)."""
    return jnp.exp(jnp.log(x) * e)


def _poisson_kernel(row0_ref, alpha_ref, noise_ref, *refs, n_tex: int,
                    hg: int, wg: int, aky: int, dky: int, cfg):
    c_tot = 5 + 3 * n_tex
    srcs = refs[:9]
    out_ref = refs[9]
    i = pl.program_id(0)
    j = pl.program_id(1)
    br = alpha_ref.shape[1]

    ii = jax.lax.broadcasted_iota(jnp.int32, (br, BC), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (br, BC), 1)
    rr_l = i * br + ii
    row0 = row0_ref[0]
    rr_g = rr_l + row0
    cc = j * BC + jj

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
    rough_c = center(1)
    n_c = [center(2), center(3), center(4)]

    # flatness from fwidth(normal) (`poisson_denoise.frag:150-152` via
    # math3d.fwidth: forward diffs, edge-replicated at the FRAME edge)
    fw2 = jnp.zeros((br, BC), jnp.float32)
    right_ok = (cc < wg - 1).astype(jnp.float32)
    down_ok = (rr_g < hg - 1).astype(jnp.float32)
    for c in (2, 3, 4):
        mid = slabs[c][br: 2 * br]
        right = mid[:, BC + 1: 2 * BC + 1]
        down = slabs[c][br + 1: 2 * br + 1, BC: 2 * BC]
        fw = jnp.abs(right - center(c)) * right_ok \
            + jnp.abs(down - center(c)) * down_ok
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
        dxk = jnp.clip(ixt - cc, -(BC - 1), BC - 1)
        txa = jj + dxk + BC
        tgts.append((dyv, txa // BC - 1, txa % BC))

    # tap fetch: channel-major over the slabs, vertical dense-select
    tv = [[jnp.zeros((br, BC), jnp.float32) for _ in range(c_tot)]
          for _ in range(8)]
    for c in range(c_tot):
        slab = slabs[c]
        for v in range(-aky, aky + 1):
            row_v = slab[br + v: br + v + br]
            for k in range(8):
                if abs(v) > (aky if k < 4 else dky):
                    continue
                dyv, lq, lr = tgts[k]
                g = _gather_h(row_v, lq, lr)
                tv[k][c] = jnp.where(dyv == v, g, tv[k][c])

    # center state per slot (`poisson_denoise_pass` lines 134-144)
    lw = (0.2125, 0.7154, 0.0721)
    slots = []
    for s_t in range(n_tex):
        rgb_raw = [center(5 + 3 * s_t + ch) for ch in range(3)]
        t_rgb = [jnp.log(r * 1.0003 + 1.0) for r in rgb_raw]
        lum = _pow(
            jnp.maximum(
                t_rgb[0] * lw[0] + t_rgb[1] * lw[1] + t_rgb[2] * lw[2], 0.0
            ),
            0.125,
        )
        alpha = alpha_ref[s_t]
        age = 1.0 / _pow(alpha + 1.0, 1.2 * cfg.phi)
        slots.append({
            "raw": rgb_raw, "lum": lum, "age": age,
            "acc": list(t_rgb),
            "total": jnp.ones((br, BC), jnp.float32),
        })

    glossiness = jnp.maximum(0.0, 4.0 * (1.0 - rough_c / 0.25))
    specular_factor = jnp.exp(-glossiness * cfg.specular_phi)

    # edge-stopping weights + accumulation (`poisson_denoise.frag:94-127`)
    for k in range(8):
        n_depth = tv[k][0]
        n_rough = tv[k][1]
        ndot = n_c[0] * tv[k][2] + n_c[1] * tv[k][3] + n_c[2] * tv[k][4]
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
            spec = cfg.is_specular[s_t] if s_t < len(cfg.is_specular) \
                else False
            wgt = w_basic * (specular_factor if spec else 1.0)
            tr = [
                jnp.log(jnp.maximum(tv[k][5 + 3 * s_t + ch], 0.0) + 1.0)
                for ch in range(3)
            ]
            disoccl_w = _pow(jnp.maximum(wgt, 1e-20), 0.1)
            lum_t = _pow(
                jnp.maximum(
                    tr[0] * lw[0] + tr[1] * lw[1] + tr[2] * lw[2], 0.0
                ),
                0.125,
            )
            luma_diff = jnp.minimum(
                jnp.abs(slots[s_t]["lum"] - lum_t), 0.5
            )
            luma_factor = jnp.exp(-luma_diff * cfg.luma_phi)
            age = slots[s_t]["age"]
            wl = wgt * luma_factor
            wgt = (wl + (disoccl_w - wl) * age) * age
            wgt = wgt * (wgt >= 0.0001)
            for ch in range(3):
                slots[s_t]["acc"][ch] = slots[s_t]["acc"][ch] + wgt * tr[ch]
            slots[s_t]["total"] = slots[s_t]["total"] + wgt

    is_bg = d_c >= 1.0
    for s_t in range(n_tex):
        total = slots[s_t]["total"]
        for ch in range(3):
            o = jnp.exp(slots[s_t]["acc"][ch] / total) - 1.0
            out_ref[3 * s_t + ch] = jnp.where(
                is_bg, slots[s_t]["raw"][ch], o
            )


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
    return n_tex <= 4 and aky <= _BR and kx <= BC - 1


def poisson_pass_fused(textures, gbuffer, noise_index, cfg,
                       row_offset=0, resolution=None):
    """One fused denoise pass; drop-in for the body of
    ``poisson_denoise_pass`` (same semantics, ULP-level differences).

    Under an active row mesh (and no explicit ``resolution``, i.e. not
    already inside a shard_map) the pass self-shards with a ppermute
    halo exchange like the warp kernels."""
    from ...parallel.context import row_mesh_for

    h, w = gbuffer.depth.shape
    hg, wg = resolution if resolution is not None else (h, w)
    n_tex = len(textures)
    aky, dky, _kx = _windows(cfg.radius, hg, wg)

    # quantized inputs: oct-half2x16 normals, f16 texture texels
    n_valid = (
        jnp.sum(jnp.abs(gbuffer.normal), axis=-1, keepdims=True) > 1e-8
    )
    packed_nrm = jnp.where(
        n_valid[..., 0], pack_normal(gbuffer.normal), 0.0
    )
    normal_q = jnp.where(n_valid, unpack_normal(packed_nrm), 0.0)
    texs = [t.astype(jnp.float16).astype(jnp.float32) for t in textures]

    planes = [gbuffer.depth, gbuffer.roughness,
              normal_q[..., 0], normal_q[..., 1], normal_q[..., 2]]
    for t in texs:
        planes.extend([t[..., 0], t[..., 1], t[..., 2]])
    bundle = jnp.stack(planes, axis=-1)              # (H, W, C)
    alpha = jnp.stack([t[..., 3] for t in texs], -1)  # (H, W, n_tex)

    mesh = row_mesh_for(h) if resolution is None else None
    if mesh is not None:
        out3 = _fused_sharded(bundle, alpha, noise_index, cfg, n_tex,
                              aky, dky, h, w, mesh)
    else:
        noise = jnp.moveaxis(
            rolled_noise_tile(noise_index, row_offset=row_offset)[..., :1],
            -1, 0,
        )
        row0 = jnp.asarray(row_offset, jnp.int32).reshape(1)
        out3 = _fused_local(bundle, alpha, noise, row0, cfg, n_tex,
                            aky, dky, hg, wg)

    outs = []
    for s_t in range(n_tex):
        rgb = jnp.moveaxis(out3[3 * s_t: 3 * s_t + 3], 0, -1)
        outs.append(jnp.concatenate([rgb, texs[s_t][..., 3:4]], axis=-1))
    return outs


def _fused_sharded(bundle, alpha, noise_index, cfg, n_tex, aky, dky,
                   hg, wg, mesh):
    from jax.sharding import PartitionSpec as P

    from ...parallel.halo import halo_exchange_rows
    from ...parallel.sharding import ROW_AXIS

    noise = jnp.moveaxis(
        rolled_noise_tile(noise_index, row_offset=0)[..., :1], -1, 0
    )

    def local(bun_b, alpha_b, noise_b):
        idx = jax.lax.axis_index(ROW_AXIS)
        h_loc = bun_b.shape[0]
        row0 = idx * h_loc - aky
        ext = halo_exchange_rows(bun_b, aky)
        alpha_ext = jnp.pad(alpha_b, ((aky, aky), (0, 0), (0, 0)),
                            mode="edge")
        noise_l = jnp.roll(noise_b, -jnp.mod(row0, _TILE), axis=1)
        out3 = _fused_local(ext, alpha_ext, noise_l,
                            row0.astype(jnp.int32).reshape(1),
                            cfg, n_tex, aky, dky, hg, wg)
        return out3[:, aky: aky + h_loc]

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ROW_AXIS), P(ROW_AXIS), P()),
        out_specs=P(None, ROW_AXIS),
        check_vma=False,
    )(bundle, alpha, noise)


def _fused_local(bundle, alpha, noise, row0, cfg, n_tex, aky, dky, hg, wg):
    h, w = bundle.shape[0], bundle.shape[1]
    c_tot = bundle.shape[2]
    planar = _pad_hw(jnp.moveaxis(bundle, -1, 0), _BR, BC)
    alpha_p = _pad_hw(jnp.moveaxis(alpha, -1, 0), _BR, BC)
    hp, wp = planar.shape[1], planar.shape[2]
    nr, nc = hp // _BR, wp // BC

    def mk(dr, dc):
        def im(i, j, dr=dr, dc=dc):
            return (0, jnp.clip(i + dr, 0, nr - 1), jnp.clip(j + dc, 0, nc - 1))
        return pl.BlockSpec((c_tot, _BR, BC), im, memory_space=pltpu.VMEM)

    halo = [mk(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
    alpha_spec = pl.BlockSpec((n_tex, _BR, BC), lambda i, j: (0, i, j),
                              memory_space=pltpu.VMEM)
    noise_spec = pl.BlockSpec((1, _BR, _TILE),
                              lambda i, j: (0, i % (_TILE // _BR), 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(_poisson_kernel, n_tex=n_tex, hg=hg, wg=wg,
                             aky=aky, dky=dky, cfg=cfg)
    out = pl.pallas_call(
        kern,
        grid=(nr, nc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), alpha_spec,
                  noise_spec] + halo,
        out_specs=pl.BlockSpec((3 * n_tex, _BR, BC), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * n_tex, hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(row0, alpha_p, noise, *([planar] * 9))
    return out[:, :h, :w]
