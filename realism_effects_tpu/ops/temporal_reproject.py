"""Temporal reprojection + accumulation (kernels K4/K5).

TPU re-implementation of the reference's temporal accumulator:
`/root/reference/src/temporal-reproject/shader/temporal_reproject.frag`
(per-texture reproject, neighborhood clamp, confidence-weighted blend,
effective-sample-count alpha) and its library
`/root/reference/src/temporal-reproject/shader/reproject.frag`
(screen<->world, log color transform, AABB clamp, 3-way disocclusion,
specular hit-point reprojection, Catmull-Rom history sampling).

One fused pure function over the whole frame; all per-pixel branches are
`jnp.where` masks. The MRT loop over textures (`temporal_reproject.frag:203-208`)
is a Python loop over the (static) texture list — XLA fuses across it.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from ..core import math3d
from ..core.framebuffers import VelocityBuffer
from ..core.math3d import (
    fwidth, mix, screen_to_world, transform_point, uv_grid,
)
from ..core.sampling import sample_catmull_rom_5tap, sample_nearest

# Disocclusion scale constants (`reproject.frag:107-109`)
_PLANE_DISTANCE = 20.0
_WORLD_DISTANCE = 10.0
_NORMAL_DISTANCE = 1.0

_MAX_ACC_ALPHA = 65536.0  # `temporal_reproject.frag:68`


@dataclasses.dataclass(frozen=True)
class TemporalReprojectConfig:
    """Static ("define"-like) configuration; changes recompile.

    Mirrors ``defaultTemporalReprojectPassOptions``
    (`TemporalReprojectPass.js:17-32`) + TRAA's overrides
    (`TRAAEffect.js:21-31`).
    """

    texture_count: int = 1
    log_transform: bool = False
    reproject_specular: tuple = (False,)
    neighborhood_clamp: tuple = (True,)
    confidence_power: float = 0.75
    # 'diffuse' | 'specular' | 'diffuse_specular' — selects how roughness
    # and rayLength are read from input alpha channels
    input_type: str = "diffuse"
    #: 3x3 closest-depth velocity dilation (the reference's ``dilation``
    #: option, `TemporalReprojectPass.js:17-19`)
    dilation: bool = False
    #: window for the Pallas window-warp fetches (history Catmull-Rom +
    #: disocclusion probe): +-window_ky rows x +-window_kx columns.
    #: Reprojections whose displacement exceeds it are treated as
    #: disocclusions (confidence 0), the same reset the reference applies
    #: to off-screen reprojections (`reproject.frag:130-167`).
    #: kx <= 30 admits the 2x cheaper lane-split gather (warp.py); the
    #: r4 horizontal reach was +-127 px — one-frame motion beyond
    #: +-30 px now resets instead of reprojecting.
    window_ky: int = 8
    window_kx: int = 30


def _transform_color(c, cfg):
    """Log-space transform (`reproject.frag:39-47`)."""
    return jnp.log(c + 1.0) if cfg.log_transform else c


def _undo_transform_color(c, cfg):
    return jnp.exp(c) - 1.0 if cfg.log_transform else c


def _pack_normal_depth(buf: VelocityBuffer) -> jnp.ndarray:
    """(H, W, 4) = (normal.xyz, depth): the reference's velocity target is
    ONE packed RGBA texture (`VelocityDepthNormalMaterial.js:179-189`), so
    a disocclusion probe costs one nearest gather, not three
    (`reproject.frag:97-105`; the target is NearestFilter,
    `VelocityDepthNormalPass.js:79-80`)."""
    return jnp.concatenate(
        [buf.normal, buf.depth[..., None]], axis=-1
    )


def _validate_reprojected_uv(reproj_uv, depth, world_pos, world_normal,
                             last_nd_packed: jnp.ndarray, cam, prev_cam, cfg):
    """Confidence from 3 disocclusion checks (`reproject.frag:130-167`).

    ``last_nd_packed``: :func:`_pack_normal_depth` of the previous frame's
    velocity buffer (one gather per probe — or a window-warp fetch when
    ``USE_WINDOW_WARP``, with out-of-window displacements treated as
    disocclusions)."""
    in_bounds = (
        (reproj_uv[..., 0] >= 0.0) & (reproj_uv[..., 0] <= 1.0)
        & (reproj_uv[..., 1] >= 0.0) & (reproj_uv[..., 1] <= 1.0)
    )

    if USE_WINDOW_WARP:
        from .pallas.warp import nearest_window

        last_nd, in_win = nearest_window(
            last_nd_packed, reproj_uv, ky=cfg.window_ky, kx=cfg.window_kx
        )
        in_bounds = in_bounds & in_win
    else:
        last_nd = sample_nearest(last_nd_packed, reproj_uv)
    last_normal = last_nd[..., :3]
    last_depth = last_nd[..., 3]
    last_world_pos = screen_to_world(
        reproj_uv, last_depth, prev_cam.camera_matrix_world,
        prev_cam.projection_matrix_inverse,
    )

    view_z = jnp.abs(
        math3d.depth_to_view_z(depth, cam)
    )
    dist_factor = 1.0 + 1.0 / (view_z + 1.0)

    to_current = world_pos - last_world_pos
    world_dist = jnp.linalg.norm(to_current, axis=-1)
    plane_dist = jnp.abs(math3d.dot(to_current, world_normal))
    normal_dist = jnp.minimum(
        1.0 - math3d.dot(world_normal, last_normal), 1.0
    )

    disoccl = (
        world_dist / _WORLD_DISTANCE * dist_factor
        + plane_dist / _PLANE_DISTANCE * dist_factor
        + normal_dist / _NORMAL_DISTANCE * dist_factor
    )
    confidence = jnp.maximum(1.0 - jnp.minimum(disoccl, 1.0), 0.0)
    confidence = confidence ** cfg.confidence_power
    return jnp.where(in_bounds, confidence, 0.0)


def _reproject_hit_point(world_pos, ray_length, curvature, cam, prev_cam):
    """Specular parallax reprojection (`reproject.frag:169-193`).

    Returns (uv, valid): invalid where the surface is too curvy or the ray
    too short.
    """
    valid = (curvature <= 0.05) & (ray_length >= 0.01)
    cam_ray = math3d.normalize(world_pos - cam.position)
    hit_point = cam.position + cam_ray * ray_length[..., None]
    view = transform_point(prev_cam.view_matrix, hit_point)
    clip, w = math3d.transform_point_nodiv(prev_cam.projection_matrix, view)
    ndc_xy = clip[..., :2] / jnp.where(jnp.abs(w) > 1e-8, w, 1e-8)[..., None]
    uv = ndc_xy * 0.5 + 0.5
    return uv, valid


#: route the neighborhood stencil through the Pallas TPU kernel
#: (ops/pallas/stencil.py); the jnp shifted-slice path remains as the
#: reference implementation and interpret-mode fallback.
USE_PALLAS_STENCILS = True

#: route the per-pixel reprojection fetches (Catmull-Rom history +
#: disocclusion probe) through the Pallas bounded-window warp kernel
#: (ops/pallas/warp.py) instead of priced XLA gathers (~19 ms each at
#: 1080p, CLAUDE.md rule 2b). In-window results are identical to the
#: gather path (catrom5 mode reproduces the reference's exact 5-tap
#: filter); displacements beyond the window become disocclusions.
#: The gather path remains as the oracle for the transliteration parity
#: fixtures (tests/test_temporal_parity.py pins it explicitly).
USE_WINDOW_WARP = True


def _neighborhood_minmax(tex, center_raw, radius: int):
    """AABB of the neighborhood (`reproject.frag:53-81`), seeded with the
    center input color; texels with r < 0 are skipped.

    Static-offset stencil: Pallas row-block kernel on TPU, or shifted
    whole-image reads (edge clamp-pad) in jnp.
    """
    if USE_PALLAS_STENCILS:
        from .pallas.stencil import neighborhood_minmax as pallas_minmax

        mn4, mx4 = pallas_minmax(tex, radius)
        mn = jnp.minimum(mn4[..., :3], center_raw)
        mx = jnp.maximum(mx4[..., :3], center_raw)
        return mn, mx
    h, w = tex.shape[:2]
    mn = center_raw
    mx = center_raw
    rgb = tex[..., :3]
    valid = tex[..., 0] >= 0.0
    big = jnp.float32(1e30)
    rgb_mn = jnp.where(valid[..., None], rgb, big)
    rgb_mx = jnp.where(valid[..., None], rgb, -big)
    # pad with edge replication then take shifted slices
    pad = radius
    mn_p = jnp.pad(rgb_mn, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    mx_p = jnp.pad(rgb_mx, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            sl_mn = mn_p[pad + dy: pad + dy + h, pad + dx: pad + dx + w]
            sl_mx = mx_p[pad + dy: pad + dy + h, pad + dx: pad + dx + w]
            mn = jnp.minimum(mn, sl_mn)
            mx = jnp.maximum(mx, sl_mx)
    return mn, mx


def _dilate_closest(buf: VelocityBuffer):
    """3x3 closest-depth dilation: each pixel takes the velocity/normal/
    depth of its nearest (minimum-depth) neighbor — stabilizes edges of
    moving objects under TAA."""
    h, w = buf.depth.shape
    best_d = buf.depth
    best_v = buf.velocity
    best_n = buf.normal
    dp = jnp.pad(buf.depth, 1, mode="edge")
    vp = jnp.pad(buf.velocity, ((1, 1), (1, 1), (0, 0)), mode="edge")
    np_ = jnp.pad(buf.normal, ((1, 1), (1, 1), (0, 0)), mode="edge")
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            d = dp[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
            closer = d < best_d
            best_v = jnp.where(
                closer[..., None], vp[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w], best_v
            )
            best_n = jnp.where(
                closer[..., None], np_[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w], best_n
            )
            best_d = jnp.where(closer, d, best_d)
    return best_v, best_n, best_d


def temporal_reproject(
    inputs: Sequence[jnp.ndarray],
    history: Sequence[jnp.ndarray],
    velocity: VelocityBuffer,
    last_velocity: VelocityBuffer,
    cam,
    prev_cam,
    cfg: TemporalReprojectConfig,
    max_blend=1.0,
    neighborhood_clamp_intensity=1.0,
    full_accumulate=False,
    keep_data=1.0,
    roughness_tex=None,
):
    """One temporal-reprojection step over ``texture_count`` MRT slots.

    ``inputs[i]``/``history[i]``: (H, W, 4) rgb + alpha. For input types
    with specular, alpha carries roughness/rayLength per
    `temporal_reproject.frag:167-176`. Returns the list of new accumulated
    textures (same shapes); alpha = effective sample count.
    """
    assert len(inputs) == cfg.texture_count == len(history)
    h, w = velocity.depth.shape
    uv = uv_grid(h, w)

    if cfg.dilation:
        vel, world_normal, depth = _dilate_closest(velocity)
    else:
        vel = velocity.velocity
        world_normal = velocity.normal
        depth = velocity.depth

    curvature = jnp.linalg.norm(fwidth(world_normal), axis=-1)
    world_pos = screen_to_world(
        uv, depth, cam.camera_matrix_world, cam.projection_matrix_inverse
    )

    # roughness / rayLength (`temporal_reproject.frag:167-176`)
    if cfg.input_type == "diffuse_specular":
        ray_length = inputs[1][..., 3]
        roughness = jnp.clip(inputs[0][..., 3], 0.0, 1.0)
    elif cfg.input_type == "specular":
        # SoA build: alpha of the single specular texture is rayLength;
        # roughness comes from the G-buffer via ``roughness_tex`` (the
        # packed reference encodes both as half2x16 in alpha,
        # `temporal_reproject.frag:171-175`)
        ray_length = inputs[0][..., 3]
        roughness = (
            jnp.clip(roughness_tex, 0.0, 1.0)
            if roughness_tex is not None else jnp.ones_like(ray_length)
        )
    else:
        ray_length = jnp.zeros_like(depth)
        roughness = jnp.ones_like(depth)

    move_factor = jnp.minimum(jnp.sum(vel * vel, axis=-1) * 10000.0, 1.0)

    # --- reprojected uv + confidence per path -----------------------------
    last_nd_packed = _pack_normal_depth(last_velocity)
    diffuse_uv = uv - vel
    diffuse_conf = _validate_reprojected_uv(
        diffuse_uv, depth, world_pos, world_normal,
        last_nd_packed, cam, prev_cam, cfg,
    )

    any_specular = any(cfg.reproject_specular)
    if any_specular:
        hit_uv, hit_valid = _reproject_hit_point(
            world_pos, ray_length, curvature, cam, prev_cam
        )
        spec_conf = _validate_reprojected_uv(
            hit_uv, depth, world_pos, world_normal,
            last_nd_packed, cam, prev_cam, cfg,
        )
        specular_uv = jnp.where(hit_valid[..., None], hit_uv, diffuse_uv)
        specular_conf = jnp.where(hit_valid, spec_conf, diffuse_conf)
    else:
        specular_uv, specular_conf = diffuse_uv, diffuse_conf

    outputs = []
    for i in range(cfg.texture_count):
        is_spec = cfg.reproject_specular[i]
        reproj_uv = specular_uv if is_spec else diffuse_uv
        confidence = specular_conf if is_spec else diffuse_conf

        inp = inputs[i]
        sampled = inp[..., 0] >= 0.0                       # preprocessInput
        inp_rgb = _transform_color(jnp.maximum(inp[..., :3], 0.0), cfg)

        # --- reproject (`temporal_reproject.frag:83-122`) ------------------
        # history = the rgba16f LinearFilter framebuffer copy
        # (`TemporalReprojectPass.js:141-144`): half quad-packed taps —
        # or ONE window-warp catrom5 fetch (same filter, same storage)
        if USE_WINDOW_WARP:
            from .pallas.warp import catmull_rom5_window

            acc, _ = catmull_rom5_window(
                history[i], reproj_uv, ky=cfg.window_ky, kx=cfg.window_kx
            )
        else:
            acc = sample_catmull_rom_5tap(history[i], reproj_uv, half=True)
        acc_rgb = _transform_color(acc[..., :3], cfg)
        acc_rgb_raw = acc_rgb  # pre-clamp value used when nothing sampled
        acc_a = acc[..., 3] + 1.0

        if is_spec:
            # radius 1 for smooth specular, else 2 (`:105`)
            mn1, mx1 = _neighborhood_minmax(inp, _undo_transform_color(inp_rgb, cfg), 1)
            mn2, mx2 = _neighborhood_minmax(inp, _undo_transform_color(inp_rgb, cfg), 2)
            use1 = (roughness < 0.25)[..., None]
            mn = jnp.where(use1, mn1, mn2)
            mx = jnp.where(use1, mx1, mx2)
        else:
            mn, mx = _neighborhood_minmax(inp, _undo_transform_color(inp_rgb, cfg), 2)
        mn = _transform_color(mn, cfg)
        mx = _transform_color(mx, cfg)
        clamped = jnp.clip(acc_rgb, mn, mx)

        r = roughness if is_spec else jnp.ones_like(roughness)
        clamp_aggr = jnp.minimum(1.0, confidence * r)
        clamp_intensity = (
            jnp.minimum(1.0, move_factor * 50.0 + neighborhood_clamp_intensity)
            * clamp_aggr
        )
        new_rgb = mix(acc_rgb, clamped, clamp_intensity[..., None])
        color_diff = jnp.minimum(
            jnp.linalg.norm(new_rgb - acc_rgb, axis=-1), 1.0
        )
        acc_a = acc_a * (1.0 - color_diff)
        acc_rgb = new_rgb

        # when nothing was sampled this frame, the input IS the (unclamped)
        # history (`temporal_reproject.frag:94-97`); alpha not incremented
        inp_rgb = jnp.where(sampled[..., None], inp_rgb, acc_rgb_raw)
        acc_rgb = jnp.where(sampled[..., None], acc_rgb, acc_rgb_raw)
        acc_a = jnp.where(sampled, acc_a, acc[..., 3])

        # --- accumulate (`temporal_reproject.frag:42-79`) ------------------
        conf2 = confidence ** cfg.confidence_power  # pow applied twice upstream
        accum_blend = (1.0 - 1.0 / (acc_a + 1.0)) * conf2
        max_value = jnp.where(full_accumulate, 1.0, max_blend) * keep_data

        if cfg.input_type != "diffuse" and is_spec:
            roughness_maximum = 0.1
            low_rough = (roughness >= 0.0) & (roughness < roughness_maximum)
            max_rough_value = max_value * (roughness / roughness_maximum)
            gated = mix(
                max_value, max_rough_value, jnp.minimum(100.0 * move_factor, 1.0)
            )
            max_value = jnp.where(low_rough, gated, max_value)

        t = jnp.minimum(accum_blend, max_value)
        out_a = jnp.minimum(1.0 / (1.0 - t) - 1.0, _MAX_ACC_ALPHA)
        out_rgb = _undo_transform_color(
            mix(inp_rgb, acc_rgb, t[..., None]), cfg
        )
        outputs.append(jnp.concatenate([out_rgb, out_a[..., None]], axis=-1))
    return outputs
