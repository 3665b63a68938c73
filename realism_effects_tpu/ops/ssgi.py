"""SSGI/SSR: stochastic screen-space ray-marched global illumination (K1).

TPU re-implementation of `/root/reference/src/ssgi/shader/ssgi.frag` with
its sampling library `ssgi_utils.frag` (K2, already in ``core.brdf`` /
``core.envmap``): per pixel, one GGX-VNDF or cosine-hemisphere or
env-CDF-importance sample, a fixed-trip masked ray march with exponential
step easing and binary refinement, radiance fetched from the previous
frame's denoised output via velocity reprojection, environment fallback
with MIS.

The reference's per-pixel divergent loops (`ssgi.frag:441-503`) become
fixed-trip lane-masked loops — every pixel runs ``steps`` iterations with
hit state carried in masks (TPU-friendly; no data-dependent control flow).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import brdf, math3d
from ..core.envmap import (
    EquirectEnv, sample_equirect_color, sample_equirect_probability,
)
from ..core.framebuffers import GBuffer, VelocityBuffer
from ..core.math3d import (
    dot, luminance, mix, normalize, smoothstep, transform_dir_transpose,
    uv_grid,
)
from ..core.rng import blue_noise_image
from ..core.sampling import sample_bilinear, sample_nearest

EPS = 1e-5

#: route the sweep trace's radiance feedback through the prewarped-
#: accumulated window kernel (see the prewarp block in :func:`ssgi`);
#: False falls back to the reference's velocity-then-radiance gather
#: chain (used by the gather-budget fixture, where interpret-mode Pallas
#: would pollute the HLO gather census).
USE_WINDOW_WARP = True


@dataclasses.dataclass(frozen=True)
class SSGIConfig:
    """Static knobs; defaults mirror ``defaultSSGIOptions``
    (`/root/reference/src/ssgi/SSGIOptions.js:26-48`)."""

    mode: str = "ssgi"               # "ssgi" | "ssr"
    steps: int = 20
    refine_steps: int = 5
    #: trace discretization: "sweep" (default — the TPU-native
    #: direction-binned roll sweep, `ops/ssgi_sweep.py`: gather-free,
    #: same hit law, snap noise integrated temporally; the configuration
    #: every benched number describes); "march" = the reference's exact
    #: per-pixel gather march (`ssgi.frag:441-503`), kept for the
    #: transliteration parity fixtures — each executed full-res gather
    #: costs ~14-19 ms at 1080p on the target TPU (CLAUDE.md rule 2b)
    trace: str = "sweep"
    sweep_dirs: int = 16             # direction bins (sweep trace)
    sweep_steps: int = 32            # radii per bin (sweep trace)
    missed_rays: bool = False
    importance_sampling: bool = True
    env_lum_clamp: bool = True
    #: add the direct-light texture to both GI outputs
    #: (`ssgi.frag:267-272`); ON to match the reference render-pass path
    #: (`SSGIEffect.js:29,144-148`) and the SSGIEffect layer's default
    use_direct_light: bool = True
    #: box-projected env parallax correction (`ssgi_utils.frag:40-57`):
    #: ((sx, sy, sz), (px, py, pz)) or None
    env_box: tuple | None = None
    #: sweep-trace env fetch decimation: each stride x stride pixel quad
    #: shares ONE equirect fetch per frame, with the fetched quad member
    #: rotating every frame so each pixel's own direction is sampled
    #: every stride^2 frames and the temporal accumulator integrates the
    #: rest (an XLA gather is priced per index — CLAUDE.md rule 2b — so
    #: stride 2 cuts the two per-ray env fetches from ~24 ms to ~6 ms
    #: each at 1080p). 1 = the reference's per-pixel fetch (march mode
    #: always fetches per pixel). Deviation notes: PARITY.md sweep-mode
    #: sampling approximations.
    env_fetch_stride: int = 2


def _get_view_z(depth, cam):
    """`ssgi_utils.frag:7-13` (perspective/orthographic dispatch)."""
    return math3d.depth_to_view_z(depth, cam)


def _view_space_ray_march(view_pos, l, depth_tex, cam, random_b, thickness,
                          ray_distance, cfg: SSGIConfig):
    """RayMarch + BinarySearch (`ssgi.frag:441-503`), lane-masked.

    Returns (uv, hit_pos (view), missed) where missed lanes have
    hit_pos = 1e9 like the reference sentinel.
    """
    step_dir = l * (ray_distance / float(cfg.steps))

    hit0 = jnp.zeros(view_pos.shape[:-1], bool)
    uv0 = math3d.view_to_screen(view_pos, cam.projection_matrix)

    def march_body(i, carry):
        hit, hit_pos, uv = carry
        cs = 1.0 - jnp.exp(
            -0.25 * (i.astype(jnp.float32) + random_b - 0.5) ** 2
        )
        advanced = hit_pos + step_dir * cs[..., None]
        cur_pos = jnp.where(hit[..., None], hit_pos, advanced)

        cur_uv = math3d.view_to_screen(cur_pos, cam.projection_matrix)
        # NEAREST: the G-buffer depth texture is NearestFilter-bound
        # (`GBufferPass.js:35-36`; fetch sites `ssgi.frag:458,487`)
        d = sample_nearest(depth_tex, cur_uv)
        z = _get_view_z(d, cam)
        diff = z - cur_pos[..., 2]
        newly_hit = (~hit) & (diff >= 0.0) & (diff < thickness)

        uv = jnp.where(hit[..., None], uv, cur_uv)
        return hit | newly_hit, cur_pos, uv

    hit, hit_pos, uv = jax.lax.fori_loop(
        1, cfg.steps, march_body, (hit0, view_pos, uv0)
    )

    # binary refinement on hit lanes (`ssgi.frag:477-503`)
    if cfg.refine_steps > 0:
        def refine_body(_, carry):
            bdir, bpos = carry
            b_uv = math3d.view_to_screen(bpos, cam.projection_matrix)
            d = sample_nearest(depth_tex, b_uv)
            z = _get_view_z(d, cam)
            diff = z - bpos[..., 2]
            bdir = bdir * 0.5
            bpos = bpos + jnp.where((diff >= 0.0)[..., None], -bdir, bdir)
            return bdir, bpos

        bdir0 = jnp.broadcast_to(step_dir * 0.5, hit_pos.shape)
        _, bpos = jax.lax.fori_loop(
            0, cfg.refine_steps, refine_body, (bdir0, hit_pos - bdir0)
        )
        refined_uv = math3d.view_to_screen(bpos, cam.projection_matrix)
        uv = jnp.where(hit[..., None], refined_uv, uv)
        hit_pos = jnp.where(hit[..., None], bpos, hit_pos)

    missed = ~hit
    hit_pos = jnp.where(missed[..., None], 1.0e9, hit_pos)
    return uv, hit_pos, missed


def _parallax_correct(reflected_ws, world_pos, cfg: SSGIConfig):
    """Box-projected env correction (`ssgi_utils.frag:44-56`)."""
    size = jnp.asarray(cfg.env_box[0], jnp.float32)
    pos = jnp.asarray(cfg.env_box[1], jnp.float32)
    n_dir = reflected_ws
    safe = jnp.where(jnp.abs(n_dir) > 1e-8, n_dir, 1e-8)
    rbmax = (0.5 * size + pos - world_pos) / safe
    rbmin = (-0.5 * size + pos - world_pos) / safe
    rbminmax = jnp.where(n_dir > 0.0, rbmax, rbmin)
    correction = jnp.min(rbminmax, axis=-1, keepdims=True)
    box_hit = world_pos + n_dir * correction
    return normalize(box_hit - pos)


def _env_fetch_strided(env, dirs_ws, lod, stride, frame, quantize):
    """Quad-shared equirect fetch: one gather per stride x stride quad.

    The sampled quad member rotates with ``frame`` (phase = frame in
    base-stride digits), so over stride^2 frames every pixel's own
    direction is fetched once and the temporal accumulator integrates
    the neighbours' samples in between — the same mechanism that
    integrates the reference's per-frame stochastic ray. Spatially this
    mixes env fallback within quads (wrong-normal bleed is <= 1 px at
    geometry edges).

    The member pick is a quad-axis reshape + dynamic-slice, NOT a roll
    over the frame: a dynamic roll along H lowers to a per-index priced
    gather on the single chip (CLAUDE.md rule 2b) and forces GSPMD to
    materialize full-height planes under row sharding, while the
    (H/stride, stride, ...) dynamic index is local to every row shard."""
    h, w = dirs_ws.shape[:2]
    fy = jnp.mod(jnp.asarray(frame, jnp.int32), stride)
    fx = jnp.mod(jnp.asarray(frame, jnp.int32) // stride, stride)
    ph, pw = (-h) % stride, (-w) % stride
    d, ll = dirs_ws, lod
    if ph or pw:
        d = jnp.pad(d, ((0, ph), (0, pw), (0, 0)), mode="edge")
        ll = jnp.pad(ll, ((0, ph), (0, pw)), mode="edge")
    hq, wq = (h + ph) // stride, (w + pw) // stride
    d = d.reshape(hq, stride, wq, stride, 3)
    ll = ll.reshape(hq, stride, wq, stride)
    d = jax.lax.dynamic_index_in_dim(d, fy, 1, keepdims=False)
    d = jax.lax.dynamic_index_in_dim(d, fx, 2, keepdims=False)
    ll = jax.lax.dynamic_index_in_dim(ll, fy, 1, keepdims=False)
    ll = jax.lax.dynamic_index_in_dim(ll, fx, 2, keepdims=False)
    s = sample_equirect_color(env, d, ll, quantize=quantize)
    s = jnp.broadcast_to(
        s[:, None, :, None, :], (hq, stride, wq, stride, 3)
    ).reshape(hq * stride, wq * stride, 3)
    return s[:h, :w]


def _get_env_color(env: EquirectEnv | None, l_view, view_matrix, roughness,
                   is_diffuse, is_env_sample, env_blur, cfg: SSGIConfig,
                   world_pos=None, frame=None):
    """`ssgi.frag:311-346`: equirect fetch with roughness-scaled mip and
    luminance clamping; optional box-projected parallax correction.

    The sweep trace quantizes the per-pixel lod to the nearest mip (one
    priced gather instead of the trilinear pair; the temporal filter
    integrates across the per-frame-stochastic ray directions anyway)
    and decimates the fetch by ``cfg.env_fetch_stride`` (see
    :class:`SSGIConfig`)."""
    if env is None:
        return jnp.zeros(l_view.shape[:-1] + (3,), jnp.float32)
    reflected_ws = normalize(transform_dir_transpose(view_matrix, l_view))
    if cfg.env_box is not None and world_pos is not None:
        reflected_ws = _parallax_correct(reflected_ws, world_pos, cfg)
    max_mip = float(env.max_mip_level)
    mip = env_blur * max_mip
    mip_scale = jnp.where(
        (~is_diffuse) & (roughness < 0.15), roughness / 0.15, 1.0
    )
    lod = jnp.broadcast_to(mip * mip_scale, l_view.shape[:-1])
    if (cfg.trace == "sweep" and cfg.env_fetch_stride > 1
            and frame is not None):
        sample = _env_fetch_strided(
            env, reflected_ws, lod, cfg.env_fetch_stride, frame,
            quantize=True,
        )
    else:
        sample = sample_equirect_color(env, reflected_ws, lod,
                                       quantize=cfg.trace == "sweep")
    if cfg.env_lum_clamp:
        max_env_lum = jnp.where(is_env_sample, 100.0, 25.0)
        env_lum = luminance(sample)
        scale = jnp.where(
            env_lum > max_env_lum, max_env_lum / jnp.maximum(env_lum, EPS), 1.0
        )
        sample = sample * scale[..., None]
    return sample


def _saturation(c):
    """`ssgi.frag:348-360`."""
    mx = jnp.max(c, axis=-1)
    mn = jnp.min(c, axis=-1)
    return jnp.where(mx == mn, 0.0, (mx - mn) / jnp.maximum(mx, EPS))


def ssgi(
    gbuffer: GBuffer,
    velocity: VelocityBuffer,
    accumulated: jnp.ndarray,        # prev frame's denoised output (H, W, >=3)
    direct_light: jnp.ndarray,       # lit scene color (H, W, 3)
    env: EquirectEnv | None,
    cam,
    frame,
    cfg: SSGIConfig,
    ray_distance=10.0,
    thickness=10.0,
    env_blur=0.5,
):
    """One SSGI sample per pixel.

    Returns (g_diffuse (H, W, 4), g_specular (H, W, 4)):
    ``g_diffuse = (diffuseGI | -1, roughness)``,
    ``g_specular = (specularGI, rayLength)`` matching `ssgi.frag:274-308`
    (SoA instead of packTwoVec4).
    """
    h, w = gbuffer.depth.shape
    uv = uv_grid(h, w)
    depth = gbuffer.depth
    is_bg = depth >= 1.0

    roughness = gbuffer.roughness
    metalness = gbuffer.metalness
    diffuse = gbuffer.diffuse[..., :3]
    roughness_sq = jnp.clip(roughness * roughness, 1e-6, 1.0)

    view_z = _get_view_z(depth, cam)
    view_pos = math3d.get_view_position(
        uv, view_z, cam.projection_matrix, cam.projection_matrix_inverse
    )
    view_dir = normalize(view_pos)
    world_normal = gbuffer.normal
    # world -> view rotation == transpose of camera_matrix_world rotation
    view_normal = normalize(
        transform_dir_transpose(cam.camera_matrix_world, world_normal)
    )
    world_pos = math3d.transform_point(cam.camera_matrix_world, view_pos)

    n = view_normal
    v = -view_dir
    nov = jnp.maximum(EPS, dot(n, v))

    # view dir to world-space (`ssgi.frag:136`)
    v_world = transform_dir_transpose(cam.view_matrix, v)
    n_world = world_normal
    t_w, b_w = brdf.onb(n_world)
    v_local = brdf.to_local(t_w, b_w, n_world, v_world)

    f0 = mix(jnp.full_like(diffuse, 0.04), diffuse, metalness[..., None])

    random = blue_noise_image(h, w, frame)
    r1, r2, r3, r4 = (random[..., i] for i in range(4))

    # GGX-VNDF reflection direction (`ssgi.frag:156-166`)
    h_local = brdf.sample_ggx_vndf(v_local, roughness_sq, roughness_sq, r1, r2)
    h_local = jnp.where((h_local[..., 2:3] < 0.0), -h_local, h_local)
    l_local = normalize(math3d.reflect(-v_local, h_local))
    l_world = brdf.to_world(t_w, b_w, n_world, l_local)
    l_view = normalize(transform_dir_transpose(cam.camera_matrix_world, l_world))

    _, nol, noh, loh, voh = brdf.calculate_angles(l_view, v, n)

    if cfg.mode == "ssgi":
        fresnel = brdf.f_schlick(f0, voh)
        diff_w = jnp.maximum((1.0 - metalness) * luminance(diffuse), EPS)
        spec_w = jnp.maximum(luminance(fresnel), EPS)
        inv_w = 1.0 / (diff_w + spec_w)
        is_diffuse_sample = r3 < diff_w * inv_w
    else:
        is_diffuse_sample = jnp.zeros((h, w), bool)

    # environment importance sampling (`ssgi.frag:191-215`)
    ems_pdf = jnp.ones((h, w), jnp.float32)
    is_env_sample = jnp.zeros((h, w), bool)
    env_mis_dir = jnp.zeros((h, w, 3), jnp.float32)
    if cfg.importance_sampling and env is not None:
        # the CDF inversion depends ONLY on the blue noise, which is a
        # rolled+tiled 128x128 texture — evaluate it on the tile and
        # roll+tile the result (bit-identical, ~100x fewer gather
        # indices; core.rng.blue_noise_transform)
        from ..core.rng import blue_noise_transform

        def _cdf_on_tile(t):
            pdf_t, dir_t = sample_equirect_probability(
                env, t[..., :2], fast=cfg.trace == "sweep"
            )
            return jnp.concatenate([pdf_t[..., None], dir_t], axis=-1)

        packed_env = blue_noise_transform(h, w, frame, _cdf_on_tile)
        env_pdf, env_dir_ws = packed_env[..., 0], packed_env[..., 1:4]
        env_mis_dir = normalize(
            transform_dir_transpose(cam.camera_matrix_world, env_dir_ws)
        )
        prob = dot(env_mis_dir, view_normal) * roughness
        prob = jnp.minimum(1.0 - EPS, prob)
        is_env_sample = r4 < prob
        ems_pdf = jnp.where(
            is_env_sample, env_pdf / jnp.maximum(1.0 - prob, EPS), 1.0 - prob
        )
        ems_pdf = jnp.maximum(ems_pdf, EPS)

    cos_hemi = brdf.cosine_sample_hemisphere(
        view_normal, jnp.stack([r1, r2], axis=-1)
    )
    diffuse_ray = jnp.where(is_env_sample[..., None], env_mis_dir, cos_hemi)
    specular_ray = jnp.where(is_env_sample[..., None], env_mis_dir, l_view)

    if cfg.trace == "sweep":
        # both rays swept in one loop, every step's roll shared
        from .ssgi_sweep import sweep_ray_march

        sweep_rays = [specular_ray] + (
            [diffuse_ray] if cfg.mode == "ssgi" else []
        )

        # Prewarped accumulated radiance: A'(q) = acc(q - vel(q)), built
        # once by a bounded window-warp (velocity is a few px/frame), so
        # each ray's radiance fetch at its hit point needs ONE read of
        # A' instead of a velocity gather + a reprojected radiance gather
        # (`ssgi.frag:380-388` fetches velocity then accumulatedTexture).
        # Deviation vs the gather chain: the bilinear mixes 4 texels each
        # prewarped with its own velocity (PARITY.md; march stays exact).
        if USE_WINDOW_WARP:
            from .pallas.warp import bilinear_window

            acc16 = accumulated[..., :3].astype(
                jnp.float16).astype(jnp.float32)
            pre_uv = uv - velocity.velocity
            warped_acc, in_win = bilinear_window(acc16, pre_uv, ky=8, kx=30)
            pre_ok = (
                (pre_uv[..., 0] >= 0.0) & (pre_uv[..., 0] <= 1.0)
                & (pre_uv[..., 1] >= 0.0) & (pre_uv[..., 1] <= 1.0) & in_win
            )
            prewarped = jnp.concatenate(
                [warped_acc, pre_ok.astype(jnp.float32)[..., None]], axis=-1
            ).astype(jnp.float16)
        else:
            prewarped = None

        # stochastic bin rounding wants noise independent of r1-r4 (which
        # pick the ray/diffuse/env sample): a second blue-noise image
        # with an offset seed is still just a roll+tile
        bin_noise = blue_noise_image(h, w, frame + 2048)[..., 0]
        sweep_traces = sweep_ray_march(
            view_pos, sweep_rays, depth, cam, frame, thickness,
            ray_distance, dirs=cfg.sweep_dirs, steps=cfg.sweep_steps,
            bin_noise=bin_noise,
            radiance=(prewarped.astype(jnp.float32)
                      if prewarped is not None else None),
            # missed_rays consumes the march-end radiance on missed
            # lanes (`ssgi.frag:430-436`); the in-march gi must then
            # keep tracking until the ray ends, not only record hits
            miss_radiance=cfg.missed_rays,
        )
        traced = {id(r): t for r, t in zip(sweep_rays, sweep_traces)}
    else:
        traced = None
        prewarped = None

    def do_sample(l, is_diffuse_mask):
        """`ssgi.frag:362-439` for one ray direction."""
        _, s_nol, s_noh, s_loh, s_voh = brdf.calculate_angles(l, v, n)
        cos_theta = jnp.maximum(0.0, dot(view_normal, l))

        diffuse_brdf = brdf.eval_disney_diffuse(
            s_nol, nov, s_loh, roughness_sq, metalness
        )
        diffuse_pdf = s_nol / jnp.pi
        spec_brdf = brdf.eval_disney_specular(roughness_sq, s_noh, nov, s_nol)
        spec_pdf = brdf.ggx_vndf_pdf(s_noh, nov, roughness_sq)

        brdf_val = jnp.where(is_diffuse_mask, diffuse_brdf, spec_brdf)
        pdf = jnp.maximum(
            jnp.where(is_diffuse_mask, diffuse_pdf, spec_pdf), EPS
        )
        brdf_val = brdf_val * cos_theta

        trace_gi = None
        if traced is not None:
            entry = traced[id(l)]
            coords, hit_pos, missed = entry[0], entry[1], entry[2]
            if len(entry) > 3:
                trace_gi = entry[3]
        else:
            coords, hit_pos, missed = _view_space_ray_march(
                view_pos, l, depth, cam, r3, thickness, ray_distance, cfg
            )

        env_color = _get_env_color(
            env, l, cam.view_matrix, roughness, is_diffuse_mask,
            is_env_sample, env_blur, cfg, world_pos=world_pos, frame=frame,
        )

        # reproject hit into last frame's accumulated radiance
        if trace_gi is not None:
            # sweep: the prewarped radiance (+ validity flag channel) was
            # read at the hit texel DURING the march — zero extra fetches
            reproj_gi = trace_gi[..., :3]
            in_bounds = trace_gi[..., 3] > 0.5
        elif prewarped is not None:
            # sweep without the in-march read: one f16 quad-packed gather
            # of the prewarped radiance at the hit point
            pw = sample_bilinear(prewarped, coords)
            reproj_gi = pw[..., :3]
            in_bounds = pw[..., 3] > 0.5
        else:
            # velocity target is NearestFilter
            # (`VelocityDepthNormalPass.js:79-80`)
            vel_at_hit = sample_nearest(velocity.velocity, coords)
            reproj_uv = coords - vel_at_hit
            in_bounds = (
                (reproj_uv[..., 0] >= 0.0) & (reproj_uv[..., 0] <= 1.0)
                & (reproj_uv[..., 1] >= 0.0) & (reproj_uv[..., 1] <= 1.0)
            )
            # accumulated radiance is an rgba16f LinearFilter target
            # (`TemporalReprojectPass.js:141-144`): half quad-packed tap
            reproj_gi = sample_bilinear(
                accumulated[..., :3], reproj_uv, half=True)
        sat = _saturation(diffuse)
        desat = (1.0 - roughness) * sat * 0.4
        reproj_gi = mix(
            reproj_gi, luminance(reproj_gi)[..., None], desat[..., None]
        )

        border = 0.15
        bf = (
            smoothstep(0.0, border, coords[..., 0])
            * smoothstep(1.0, 1.0 - border, coords[..., 0])
            * smoothstep(0.0, border, coords[..., 1])
            * smoothstep(1.0, 1.0 - border, coords[..., 1])
        )
        bf = jnp.sqrt(jnp.maximum(bf, 0.0))
        ssgi_radiance = mix(env_color, reproj_gi, bf[..., None])
        ssgi_radiance = jnp.where(
            in_bounds[..., None], ssgi_radiance, env_color
        )

        if cfg.missed_rays:
            # keep the brighter of env/ssgi on missed lanes (`:430-436`)
            take_env = luminance(env_color) > luminance(ssgi_radiance)
            gi = jnp.where(
                missed[..., None] & take_env[..., None], env_color, ssgi_radiance
            )
        else:
            gi = jnp.where(missed[..., None], env_color, ssgi_radiance)

        return gi, hit_pos, missed, brdf_val, pdf

    def finalize(gi, brdf_val, pdf):
        """brdf/pdf/MIS weighting (`ssgi.frag:252-259`)."""
        gi = gi * brdf_val[..., None]
        mis = brdf.mis_heuristic(ems_pdf, pdf)
        weight = jnp.where(is_env_sample, mis, 1.0 / pdf)
        return gi * (weight / ems_pdf)[..., None]

    # specular ray is traced every frame (`ssgi.frag:245-265`); note the
    # reference passes the pixel's isDiffuseSample flag into this call too
    spec_gi_raw, spec_hit_pos, spec_missed, spec_brdf_v, spec_pdf_v = do_sample(
        specular_ray, is_diffuse_sample
    )
    specular_gi = finalize(spec_gi_raw, spec_brdf_v, spec_pdf_v)

    if cfg.mode == "ssgi":
        diff_gi_raw, _, _, diff_brdf_v, diff_pdf_v = do_sample(
            diffuse_ray, is_diffuse_sample
        )
        diffuse_gi = finalize(diff_gi_raw, diff_brdf_v, diff_pdf_v)
        # pixels that didn't take a diffuse sample mark -1 (`:277-278`)
        diffuse_gi = jnp.where(
            is_diffuse_sample[..., None], diffuse_gi, -1.0
        )
    else:
        diffuse_gi = jnp.full((h, w, 3), -1.0, jnp.float32)

    if cfg.use_direct_light:
        # `ssgi.frag:267-272`
        specular_gi = specular_gi + direct_light
        if cfg.mode == "ssgi":
            diffuse_gi = jnp.where(
                is_diffuse_sample[..., None], diffuse_gi + direct_light,
                diffuse_gi,
            )

    # world-space ray length for hit-point reprojection (`ssgi.frag:282-296`)
    is_missed = spec_hit_pos[..., 0] > 1.0e8
    hit_ws = math3d.transform_point(cam.camera_matrix_world, spec_hit_pos)
    ray_length = jnp.where(
        is_missed, 0.0, jnp.linalg.norm(hit_ws - cam.position, axis=-1)
    )

    g_diffuse = jnp.concatenate(
        [diffuse_gi, roughness[..., None]], axis=-1
    )
    g_specular = jnp.concatenate(
        [specular_gi, ray_length[..., None]], axis=-1
    )

    # background shows the direct light (`ssgi.frag:108-113`)
    bg = jnp.concatenate(
        [direct_light, jnp.zeros((h, w, 1), jnp.float32)], axis=-1
    )
    g_diffuse = jnp.where(is_bg[..., None], bg, g_diffuse)
    g_specular = jnp.where(is_bg[..., None], bg, g_specular)
    return g_diffuse, g_specular
