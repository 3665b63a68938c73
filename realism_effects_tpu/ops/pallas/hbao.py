"""Fully-fused HBAO Pallas kernel (K8 hot path).

The XLA formulation of HBAO (`ops/ao.py::hbao`, semantics from
`/root/reference/src/hbao/shader/hbao.frag:80-115` +
`hbao_utils.glsl:21-62`) splits per frame into (a) ~7 ms of elementwise
sample setup (blue noise, cosine-hemisphere directions, clip-space
projection of 8 sample points — each intermediate plane round-trips
HBM) and (b) ~17 ms in the multi-target window-warp kernel fetching the
8 sample depths. This kernel fuses the whole loop into ONE VMEM pass:
each (64, 128) block computes its noise from the pre-rolled 128x128
blue-noise tiles (block rows align with the tile period, so the tile IS
the block's noise — no gather), reconstructs world position, draws the
spp cosine-weighted sample directions, projects them, resolves every
sample depth from the in-VMEM 3x3-halo depth slab (the same
lane-gather + vertical dense-select scheme as `warp.py`), and
accumulates the occlusion integral — nothing but the final AO plane
touches HBM.

Semantics match `ops/ao.py::hbao` with USE_WINDOW_WARP (the
window-clamped sampling radius); values differ only by transcendental
ULPs (Mosaic's sin/cos/rsqrt vs XLA's), pinned by
`tests/test_ao_fused.py` against the jnp formulation. The gather-exact
reference path remains `USE_WINDOW_WARP = False` + the transliteration
fixture `tests/test_ao_parity.py`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.rng import blue_noise_tile, rolled_noise_tile
from .stencil import _use_interpret
from .warp import BC, _pad_hw

_BR = 64            # block rows: divides the 128-px blue-noise period
_TILE = 128         # blue-noise tile size
_PI2 = float(2.0 * np.pi)

# params SMEM layout (f32)
_PMI = 0            # [0:16]  projection_matrix_inverse, row-major
_CMW = 16           # [16:32] camera_matrix_world
_PV = 32            # [32:48] projection_view_matrix
_CPOS = 48          # [48:51] camera position
_DIST = 51          # distance
_POW1 = 52          # distance_power + 1
_BIAS = 53          # bias
_TH = 54            # thickness * 0.01
_ROW0 = 55          # global row of local row 0 (sharded blocks)
_NPARAMS = 56


def _hbao_kernel(params_ref, nrm_ref, noise_ref, *refs, ky: int, kx: int,
                 spp: int, h: int, w: int):
    """Grid (NR, NC). refs: 9 halo blocks of the (1, H', W') depth plane,
    then the (1, br, BC) AO output block."""
    srcs = refs[:9]
    ao_ref = refs[9]
    i = pl.program_id(0)
    j = pl.program_id(1)
    br = nrm_ref.shape[1]
    p = params_ref

    ii = jax.lax.broadcasted_iota(jnp.int32, (br, BC), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (br, BC), 1)
    rr_l = i * br + ii                       # local (padded-array) row
    row0 = p[_ROW0].astype(jnp.int32)
    rr_g = rr_l + row0                       # global image row
    cc = j * BC + jj

    depth = srcs[4][0]                       # center block
    uv_x = (cc.astype(jnp.float32) + 0.5) * (1.0 / w)
    uv_y = (rr_g.astype(jnp.float32) + 0.5) * (1.0 / h)

    # screen -> world, the exact two-step transform_point sequence of
    # `core/math3d.py::screen_to_world` (`reproject.frag:21-28`)
    def tpoint(base, x, y, z):
        outs = []
        for r in range(4):
            o = p[base + 4 * r] * x + p[base + 4 * r + 1] * y \
                + p[base + 4 * r + 2] * z + p[base + 4 * r + 3]
            outs.append(o)
        return (outs[0] / outs[3], outs[1] / outs[3], outs[2] / outs[3])

    ndx = (uv_x - 0.5) * 2.0
    ndy = (uv_y - 0.5) * 2.0
    ndz = (depth - 0.5) * 2.0
    wpx, wpy, wpz = tpoint(_CMW, *tpoint(_PMI, ndx, ndy, ndz))

    nx = nrm_ref[0]
    ny = nrm_ref[1]
    nz = nrm_ref[2]
    cpx, cpy, cpz = p[_CPOS], p[_CPOS + 1], p[_CPOS + 2]
    dist_k, pow1 = p[_DIST], p[_POW1]
    bias_k, th = p[_BIAS] * 1000.0, p[_TH]

    # ---- per-sample setup: direction, projected target, weights --------
    tgts = []
    thetas = []
    dists = []
    for s_i in range(spp):
        u0 = noise_ref[3 * s_i]
        u1 = noise_ref[3 * s_i + 1]
        u2 = noise_ref[3 * s_i + 2]

        # cosine_sample_hemisphere (`ssgi_utils.frag:183-191`):
        # b = normalize(cross(n, (0,1,1))), t = cross(b, n)
        r_ = jnp.sqrt(u0)
        theta = u1 * _PI2
        sth = jnp.sin(theta)
        cth = jnp.cos(theta)
        bx = ny - nz
        by = -nx
        bz = nx
        binv = jax.lax.rsqrt(bx * bx + by * by + bz * bz)
        bx, by, bz = bx * binv, by * binv, bz * binv
        tx_ = by * nz - bz * ny
        ty_ = bz * nx - bx * nz
        tz_ = bx * ny - by * nx
        k1 = r_ * sth
        k2 = jnp.sqrt(jnp.maximum(1.0 - u0, 0.0))
        k3 = r_ * cth
        dx_ = k1 * bx + k2 * nx + k3 * tx_
        dy_ = k1 * by + k2 * ny + k3 * ty_
        dz_ = k1 * bz + k2 * nz + k3 * tz_
        dinv = jax.lax.rsqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
        dx_, dy_, dz_ = dx_ * dinv, dy_ * dinv, dz_ * dinv

        dist = dist_k * jnp.exp(jnp.log(u2) * pow1)   # u2 ** (power + 1)
        spx = wpx + dist * dx_
        spy = wpy + dist * dy_
        spz = wpz + dist * dz_

        cxv = p[_PV] * spx + p[_PV + 1] * spy + p[_PV + 2] * spz + p[_PV + 3]
        cyv = p[_PV + 4] * spx + p[_PV + 5] * spy + p[_PV + 6] * spz \
            + p[_PV + 7]
        cwv = p[_PV + 12] * spx + p[_PV + 13] * spy + p[_PV + 14] * spz \
            + p[_PV + 15]
        safe_w = jnp.where(jnp.abs(cwv) > 1e-8, cwv, 1e-8)
        sux = cxv / safe_w * 0.5 + 0.5
        suy = cyv / safe_w * 0.5 + 0.5
        # background pixels have zero normals -> NaN directions; their AO
        # is overwritten by the depth>=1 discard, but their indices must
        # stay in range for the lane gather
        sux = jnp.where(sux == sux, jnp.clip(sux, -2.0, 3.0), 0.0)
        suy = jnp.where(suy == suy, jnp.clip(suy, -2.0, 3.0), 0.0)
        ixt = jnp.floor(sux * w).astype(jnp.int32)
        iyt = jnp.floor(suy * h).astype(jnp.int32)

        # nearest window targets (`warp.py::_warp_multi_kernel` semantics:
        # window clamp, then global frame clamp, then window clamp);
        # horizontal clamp is the isotropic +-kx (<= 32), which admits the
        # two-window lane-split gather below
        dy = (iyt - row0) - rr_l
        dyv = jnp.clip(
            jnp.clip(jnp.clip(dy, -ky, ky), -rr_g, (h - 1) - rr_g),
            -ky, ky,
        )
        dxk = jnp.clip(jnp.clip(ixt, 0, w - 1) - cc, -kx, kx)
        txa = jj + dxk + BC
        lr1 = jnp.clip(txa - (BC - kx), 0, BC - 1)
        lr2 = jnp.clip(txa - (BC + 64 - kx), 0, BC - 1)
        tgts.append((dyv, lr1, lr2))

        thetas.append(nx * dx_ + ny * dy_ + nz * dz_)
        ddx = spx - cpx
        ddy = spy - cpy
        ddz = spz - cpz
        dists.append(jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz))

    # ---- sample depths from the in-VMEM halo slab ----------------------
    # two-window lane-split gather (see ops/pallas/poisson.py): a target
    # lane of output lane jj < 64 lies in slab lanes [BC-kx, 2BC-kx),
    # jj >= 64 in [BC+64-kx, ...) — 2 lane-rotations per slab row shared
    # by all spp samples, then 2 vgathers + 1 static-mask select each
    rows3 = [
        jnp.concatenate([srcs[3 * r + cg][0] for cg in range(3)], axis=1)
        for r in range(3)
    ]
    slab = jnp.concatenate(rows3, axis=0)    # (3*br, 3*BC)
    left_half = jj < 64
    o1, o2 = BC - kx, BC + 64 - kx

    sdepth = [jnp.zeros((br, BC), jnp.float32) for _ in range(spp)]
    for v in range(-ky, ky + 1):
        row_v = slab[br + v: br + v + br]
        w1 = row_v[:, o1: o1 + BC]
        w2 = row_v[:, o2: o2 + BC]
        for s_i in range(spp):
            dyv, lr1, lr2 = tgts[s_i]
            g = jnp.where(
                left_half,
                jnp.take_along_axis(w1, lr1, axis=1),
                jnp.take_along_axis(w2, lr2, axis=1),
            )
            sdepth[s_i] = jnp.where(dyv == v, g, sdepth[s_i])

    # ---- occlusion integral (`hbao.frag:80-115` via ops/ao.py) ---------
    ao = jnp.zeros((br, BC), jnp.float32)
    tw = jnp.zeros((br, BC), jnp.float32)
    for s_i in range(spp):
        sample_depth = sdepth[s_i]
        d = dists[s_i]
        theta = thetas[s_i]
        delta = (depth - sample_depth) * 0.001 * d * d
        tw = tw + theta
        horizon = sample_depth + delta * bias_k
        occl = jnp.maximum(0.0, horizon - depth) * theta
        m = jnp.maximum(0.0, 1.0 - delta / th)
        occl = jnp.sqrt(
            jnp.maximum(10.0 * occl * m / jnp.maximum(d, 1e-6), 0.0)
        )
        ao = ao + jnp.where(delta < th, occl, 0.0)

    ao = jnp.where(tw > 0.0, ao / tw, ao)
    ao = jnp.clip(1.0 - ao, 0.0, 1.0)
    ao_ref[0] = jnp.where(depth >= 1.0, 1.0, ao)


def rolled_noise_tiles(spp: int, frame, animated: bool,
                       row_offset=0) -> jnp.ndarray:
    """(3*spp, 128, 128) planar pre-rolled blue-noise tiles: channel
    triple ``3*s .. 3*s+2`` holds `blue_noise_image(h, w, frame*spp + s)`
    channels 0..2 for any pixel via ``tile[(y + row_offset) % 128,
    x % 128]`` — the roll+tile identity of `core/rng.py:139-185`."""
    tile = jnp.asarray(blue_noise_tile()[..., :3])
    outs = []
    for s_i in range(spp):
        base = frame * spp if animated else 0
        index = jnp.asarray(s_i, jnp.int32) + base
        rolled = rolled_noise_tile(index, row_offset=row_offset, tile=tile)
        outs.append(jnp.moveaxis(rolled, -1, 0))
    return jnp.concatenate(outs, axis=0)


def _params_vec(cam, cfg, row0) -> jnp.ndarray:
    vals = jnp.concatenate([
        jnp.asarray(cam.projection_matrix_inverse, jnp.float32).reshape(-1),
        jnp.asarray(cam.camera_matrix_world, jnp.float32).reshape(-1),
        jnp.asarray(cam.projection_view_matrix, jnp.float32).reshape(-1),
        jnp.asarray(cam.position, jnp.float32).reshape(-1),
        jnp.asarray(
            [cfg.distance, cfg.distance_power + 1.0, cfg.bias,
             cfg.thickness * 0.01],
            jnp.float32,
        ),
        jnp.asarray(row0, jnp.float32).reshape(1),
    ])
    return jnp.pad(vals, (0, _NPARAMS - vals.shape[0]))


def hbao_fused(depth: jnp.ndarray, normal: jnp.ndarray, cam, frame,
               cfg) -> jnp.ndarray:
    """Fused HBAO: returns the AO plane (H, W).

    ``normal``: world normals (H, W, 3). Routes through shard_map + halo
    exchange under an active row mesh (`parallel/context.py`)."""
    from ...parallel.context import row_mesh_for

    ky = int(cfg.window_ky)
    kx = int(cfg.window_kx)
    assert ky <= _BR, "fused HBAO window exceeds the block height"
    assert kx <= 32, "fused HBAO lane-split window needs kx <= 32"
    noise = rolled_noise_tiles(cfg.spp, frame, cfg.animated_noise)
    mesh = row_mesh_for(int(depth.shape[0]))
    if mesh is not None:
        return _hbao_fused_sharded(depth, normal, noise, cam, cfg, ky, kx,
                                   mesh)
    params = _params_vec(cam, cfg, 0)
    return _hbao_fused_local(depth, normal, params, noise, ky, kx, cfg.spp,
                             depth.shape[0], depth.shape[1])


def _hbao_fused_sharded(depth, normal, noise, cam, cfg, ky, kx, mesh):
    from jax.sharding import PartitionSpec as P

    from ...parallel.halo import halo_exchange_rows
    from ...parallel.sharding import ROW_AXIS

    h, w = depth.shape

    def local(depth_b, normal_b, noise_b):
        idx = jax.lax.axis_index(ROW_AXIS)
        h_loc = depth_b.shape[0]
        row0 = idx * h_loc - ky
        ext = halo_exchange_rows(depth_b, ky)
        nrm_ext = jnp.pad(normal_b, ((ky, ky), (0, 0), (0, 0)), mode="edge")
        # re-base the noise tiles so tile row 0 is local row 0's noise
        noise_l = jnp.roll(noise_b, -jnp.mod(row0, _TILE), axis=1)
        params = _params_vec(cam, cfg, row0)
        ao = _hbao_fused_local(ext, nrm_ext, params, noise_l, ky, kx,
                               cfg.spp, h, w)
        return ao[ky: ky + h_loc]

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ROW_AXIS), P(ROW_AXIS), P()),
        out_specs=P(ROW_AXIS),
        check_vma=False,
    )(depth, normal, noise)


def _hbao_fused_local(depth, normal, params, noise, ky, kx, spp, h_g, w_g):
    h, w = depth.shape
    planar_d = _pad_hw(depth[None], _BR, BC)
    planar_n = _pad_hw(jnp.moveaxis(normal, -1, 0), _BR, BC)
    hp, wp = planar_d.shape[1], planar_d.shape[2]
    nr, nc = hp // _BR, wp // BC

    def mk(dr, dc):
        def im(i, j, dr=dr, dc=dc):
            return (0, jnp.clip(i + dr, 0, nr - 1), jnp.clip(j + dc, 0, nc - 1))
        return pl.BlockSpec((1, _BR, BC), im, memory_space=pltpu.VMEM)

    halo = [mk(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
    nrm_spec = pl.BlockSpec((3, _BR, BC), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    noise_spec = pl.BlockSpec((3 * spp, _BR, _TILE),
                              lambda i, j: (0, i % (_TILE // _BR), 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(_hbao_kernel, ky=ky, kx=kx, spp=spp, h=h_g,
                             w=w_g)
    ao = pl.pallas_call(
        kern,
        grid=(nr, nc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), nrm_spec,
                  noise_spec] + halo,
        out_specs=pl.BlockSpec((1, _BR, BC), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(params, planar_n, noise, *([planar_d] * 9))
    return ao[0, :h, :w]
