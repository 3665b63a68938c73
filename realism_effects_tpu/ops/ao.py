"""Ambient occlusion kernels: HBAO (K8) and GTAO (K9).

TPU re-implementations of
`/root/reference/src/hbao/shader/hbao.frag` + `hbao_utils.glsl` and
`/root/reference/src/gtao/shader/gtao.frag`. The per-pixel ``spp`` loops
are static Python loops over fully vectorized whole-image sample steps;
every texture fetch is a gather from the depth plane.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core import math3d
from ..core.brdf import cosine_sample_hemisphere
from ..core.math3d import screen_to_world, smoothstep, uv_grid
from ..core.rng import blue_noise_image, vogel_disk
from ..core.sampling import sample_nearest


# the reference's literal 16-point sample table (`gtao.frag:69-75`) — a
# shuffled Vogel distribution baked into the shader; kept verbatim so the
# 16-sample GTAO path is numerically identical
VOGEL16 = np.array(
    [
        (0.030909661398755346, -0.35219964910859053),
        (0.24815307104280765, 0.7911510938702059),
        (-0.18434221951957994, 0.16887257356538096),
        (0.47167354889397395, -0.30004010277588555),
        (0.2634617551286817, 0.3436392055405124),
        (-0.12442994035028206, -0.9602172618446438),
        (-0.49235674265771434, -0.08709097518965582),
        (-0.15897452050963823, 0.5913772922836407),
        (-0.6932591671033536, 0.2861673063562022),
        (0.0, 0.0),
        (0.6642004583437224, 0.24256494210002652),
        (-0.5379843192229464, 0.7652273337186949),
        (0.8803636453299621, -0.19354547781165166),
        (0.33507968037296143, -0.7160458140378687),
        (-0.30486134122856906, -0.586991961294461),
        (-0.7492948872853635, -0.4342317029973909),
    ],
    np.float32,
)


@dataclasses.dataclass(frozen=True)
class AOConfig:
    """Static knobs; defaults mirror ``defaultAOOptions``
    (`/root/reference/src/ao/AOEffect.js:8-21`)."""

    spp: int = 8
    distance: float = 2.0
    distance_power: float = 1.0
    bias: float = 40.0
    thickness: float = 0.075
    animated_noise: bool = True
    #: use G-buffer normals instead of depth-derived ones
    use_normal_texture: bool = True
    #: sampling window for the Pallas window-warp depth taps (see
    #: USE_WINDOW_WARP below): +-window_ky rows x +-window_kx columns,
    #: isotropic by default (the r4 window was +-32 rows x +-127 cols;
    #: kx <= 32 admits the 2x cheaper lane-split gather — PARITY.md
    #: sweep-mode approximations)
    window_ky: int = 32
    window_kx: int = 32


#: route HBAO's per-sample depth fetches through the multi-target Pallas
#: window kernel (ops/pallas/warp.py) instead of 8 priced XLA gathers
#: (~19 ms each at 1080p, CLAUDE.md rule 2b). Taps whose screen
#: displacement exceeds the window sample the window-clamped position —
#: i.e. the sampling radius is clamped in screen space, the same
#: radius-clamping real-time HBAO implementations apply deliberately
#: (and the reference's own taps clamp at the frame border,
#: `hbao.frag:107` clamp-to-edge). Bounded-displacement results are
#: bit-identical to the gather path; the transliteration parity fixture
#: (tests/test_ao_parity.py) pins the gather path explicitly.
USE_WINDOW_WARP = True

#: fuse the entire HBAO loop (noise, hemisphere sampling, projection,
#: window depth fetch, occlusion integral) into one VMEM-resident Pallas
#: kernel (ops/pallas/hbao.py). Same window-clamped semantics as
#: USE_WINDOW_WARP; values differ from the jnp formulation only by
#: transcendental ULPs (tests/test_ao_fused.py pins the error)
USE_FUSED_KERNEL = True


def depth_world_normals(depth: jnp.ndarray, cam) -> jnp.ndarray:
    """World normals from the depth buffer via the 9-tap curvature-aware
    stencil (`hbao_utils.glsl:46-68`), vectorized with shifted slices.

    Returns (H, W, 3).
    """
    h, w = depth.shape
    uv = uv_grid(h, w)

    def world_pos(d, uvx):
        return screen_to_world(
            uvx, d, cam.camera_matrix_world, cam.projection_matrix_inverse
        )

    pad = jnp.pad(depth, 2, mode="edge")
    sh = lambda dy, dx: pad[2 + dy: 2 + dy + h, 2 + dx: 2 + dx + w]
    c0 = depth
    l1, l2 = sh(0, -1), sh(0, -2)
    r1, r2 = sh(0, 1), sh(0, 2)
    b1, b2 = sh(-1, 0), sh(-2, 0)
    t1, t2 = sh(1, 0), sh(2, 0)

    dl = jnp.abs(2.0 * l1 - l2 - c0)
    dr = jnp.abs(2.0 * r1 - r2 - c0)
    db = jnp.abs(2.0 * b1 - b2 - c0)
    dt = jnp.abs(2.0 * t1 - t2 - c0)

    ce = world_pos(c0, uv)
    px = jnp.array([1.0 / w, 0.0])
    py = jnp.array([0.0, 1.0 / h])
    wp_l = world_pos(l1, uv - px)
    wp_r = world_pos(r1, uv + px)
    wp_b = world_pos(b1, uv - py)
    wp_t = world_pos(t1, uv + py)

    dpdx = jnp.where((dl < dr)[..., None], ce - wp_l, wp_r - ce)
    dpdy = jnp.where((db < dt)[..., None], ce - wp_b, wp_t - ce)
    return math3d.normalize(jnp.cross(dpdx, dpdy))


def _pack_depth_stencil(depth: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 9) = the 9-tap normal-reconstruction depth stencil
    [c0, l1, l2, r1, r2, b1, b2, t1, t2] as channels, built once with
    static edge-clamped shifts. One nearest gather of this plane hands a
    GTAO sample its depth *and* every stencil value its normal needs —
    1 gather/tap instead of the 10 a per-texel formulation costs
    (CLAUDE.md rule 2b). Channel values are bit-identical to clamped
    ``texelFetch`` at the shifted coordinate."""
    h, w = depth.shape
    pad = jnp.pad(depth, 2, mode="edge")
    sh = lambda dy, dx: pad[2 + dy: 2 + dy + h, 2 + dx: 2 + dx + w]
    return jnp.stack(
        [depth, sh(0, -1), sh(0, -2), sh(0, 1), sh(0, 2),
         sh(-1, 0), sh(-2, 0), sh(1, 0), sh(2, 0)],
        axis=-1,
    )


def _depth_world_normals_at(stencil9: jnp.ndarray, uv: jnp.ndarray, cam):
    """Depth-derived normals at arbitrary uv (gather version, used by GTAO
    per-sample normal fetch, `gtao.frag:110`). Depth fetches are NEAREST
    (three.js ``DepthTexture`` defaults, the composer depth target bound
    at `AOEffect.js:44`) but reconstruction uses the continuous ``uv``
    exactly as `hbao_utils.glsl:46-52` does.

    ``stencil9``: :func:`_pack_depth_stencil` of the depth plane.
    Returns (normal (..., 3), center depth)."""
    h, w = stencil9.shape[0], stencil9.shape[1]
    s = sample_nearest(stencil9, uv)
    c0 = s[..., 0]
    l1, l2, r1, r2 = s[..., 1], s[..., 2], s[..., 3], s[..., 4]
    b1, b2, t1, t2 = s[..., 5], s[..., 6], s[..., 7], s[..., 8]

    dl = jnp.abs(2.0 * l1 - l2 - c0)
    dr = jnp.abs(2.0 * r1 - r2 - c0)
    db = jnp.abs(2.0 * b1 - b2 - c0)
    dt = jnp.abs(2.0 * t1 - t2 - c0)

    def world_pos(d, uvx):
        return screen_to_world(
            uvx, d, cam.camera_matrix_world, cam.projection_matrix_inverse
        )

    pxv = jnp.stack([jnp.full_like(c0, 1.0 / w), jnp.zeros_like(c0)], -1)
    pyv = jnp.stack([jnp.zeros_like(c0), jnp.full_like(c0, 1.0 / h)], -1)
    ce = world_pos(c0, uv)
    dpdx = jnp.where(
        (dl < dr)[..., None], ce - world_pos(l1, uv - pxv), world_pos(r1, uv + pxv) - ce
    )
    dpdy = jnp.where(
        (db < dt)[..., None], ce - world_pos(b1, uv - pyv), world_pos(t1, uv + pyv) - ce
    )
    return math3d.normalize(jnp.cross(dpdx, dpdy)), c0


def hbao(depth: jnp.ndarray, normal: jnp.ndarray | None, cam, frame,
         cfg: AOConfig):
    """HBAO kernel (K8). Returns (normal (H, W, 3), ao (H, W)).

    ``normal``: world normals (G-buffer); None selects the depth-derived
    path (`hbao_utils.glsl:70-79`).
    """
    h, w = depth.shape
    uv = uv_grid(h, w)
    world_pos = screen_to_world(
        uv, depth, cam.camera_matrix_world, cam.projection_matrix_inverse
    )
    if normal is None or not cfg.use_normal_texture:
        world_normal = depth_world_normals(depth, cam)
    else:
        world_normal = normal

    from .pallas.stencil import _use_interpret

    if (USE_FUSED_KERNEL and USE_WINDOW_WARP and cfg.window_ky <= 64
            and not _use_interpret()):
        # interpret-mode (non-TPU) fused evaluation is reserved for the
        # dedicated parity tests (pathological XLA:CPU compile times);
        # the CPU path keeps the jnp + window-warp formulation below
        from .pallas.hbao import hbao_fused

        return world_normal, hbao_fused(depth, world_normal, cam, frame, cfg)

    cam_pos = cam.position
    proj_view = cam.projection_view_matrix

    # per-sample directions / positions / uvs (elementwise; XLA fuses)
    dirs_pos_uv = []
    for i in range(cfg.spp):
        # the reference advances its frame counter BY spp per frame
        # (`AOPass.js:86-88`) so per-sample seeds never collide across
        # frames; reproduce that stride here
        base = frame * cfg.spp if cfg.animated_noise else 0
        seed = jnp.asarray(i, jnp.int32) + base
        noise = blue_noise_image(h, w, seed)

        sample_dir = cosine_sample_hemisphere(world_normal, noise[..., :2])
        dist = cfg.distance * noise[..., 2] ** (cfg.distance_power + 1.0)
        sample_pos = world_pos + dist[..., None] * sample_dir

        clip, cw = math3d.transform_point_nodiv(proj_view, sample_pos)
        safe_w = jnp.where(jnp.abs(cw) > 1e-8, cw, 1e-8)
        sample_uv = clip[..., :2] / safe_w[..., None] * 0.5 + 0.5
        dirs_pos_uv.append((sample_dir, sample_pos, sample_uv))

    # NEAREST: composer depth texture (`hbao.frag:107` fetch; three.js
    # DepthTexture defaults, bound at `AOEffect.js:44`) — all spp taps
    # resolved by ONE multi-target window kernel (see USE_WINDOW_WARP)
    if USE_WINDOW_WARP:
        from .pallas.warp import window_warp_multi

        uvs = jnp.stack([uv_ for _, _, uv_ in dirs_pos_uv], axis=0)
        # pre-clamp the horizontal displacement to the isotropic window
        # (the kernel's own lane window is +-127; the fused kernel and
        # this path share the +-window_kx law)
        ix = jnp.floor(uvs[..., 0] * w).astype(jnp.int32)
        iy = jnp.floor(uvs[..., 1] * h).astype(jnp.int32)
        xs = jnp.arange(w, dtype=jnp.int32)[None, None, :]
        ix = xs + jnp.clip(
            jnp.clip(ix, 0, w - 1) - xs, -cfg.window_kx, cfg.window_kx
        )
        sample_depths, _ = window_warp_multi(depth, iy, ix,
                                             ky=cfg.window_ky,
                                             kx=cfg.window_kx)
    else:
        sample_depths = None

    ao = jnp.zeros((h, w), jnp.float32)
    total_weight = jnp.zeros((h, w), jnp.float32)
    for i in range(cfg.spp):
        sample_dir, sample_pos, sample_uv = dirs_pos_uv[i]
        sample_depth = (
            sample_depths[i] if sample_depths is not None
            else sample_nearest(depth, sample_uv)
        )

        delta_depth = depth - sample_depth
        d = jnp.linalg.norm(sample_pos - cam_pos, axis=-1)
        delta_depth = delta_depth * 0.001 * d * d
        th = cfg.thickness * 0.01

        theta = math3d.dot(world_normal, sample_dir)
        total_weight = total_weight + theta

        horizon = sample_depth + delta_depth * cfg.bias * 1000.0
        occlusion = jnp.maximum(0.0, horizon - depth) * theta
        m = jnp.maximum(0.0, 1.0 - delta_depth / th)
        occlusion = jnp.sqrt(
            jnp.maximum(10.0 * occlusion * m / jnp.maximum(d, 1e-6), 0.0)
        )
        ao = ao + jnp.where(delta_depth < th, occlusion, 0.0)

    ao = jnp.where(total_weight > 0.0, ao / total_weight, ao)
    ao = jnp.clip(1.0 - ao, 0.0, 1.0)
    ao = jnp.where(depth >= 1.0, 1.0, ao)  # background discard
    return world_normal, ao


def gtao(depth: jnp.ndarray, cam, frame, cfg: AOConfig):
    """GTAO kernel (K9): Vogel-disk hemisphere samples, depth-diff^4 +
    normal-dot occlusion (`gtao.frag:77-125`).

    ``cfg.spp`` sets the sample count and ``cfg.distance`` scales the
    sampling radius (the reference hardcodes 16 samples / radius 0.25,
    part of its unfinished GTAO; defaults here reproduce that).
    ``bias``/``thickness``/``distance_power`` are unused by this kernel,
    as upstream. Returns ao (H, W)."""
    h, w = depth.shape
    uv = uv_grid(h, w)
    normal = depth_world_normals(depth, cam)
    world_pos = screen_to_world(
        uv, depth, cam.camera_matrix_world, cam.projection_matrix_inverse
    )
    view_z = jnp.abs(math3d.depth_to_view_z(depth, cam))

    n_samples = cfg.spp if cfg.spp > 0 else 16
    vogel = jnp.asarray(
        VOGEL16 if n_samples == 16 else vogel_disk(n_samples)
    )
    radius = 0.25 * (cfg.distance / 2.0)
    proj_view = cam.projection_view_matrix
    stencil9 = _pack_depth_stencil(depth)

    ao = jnp.zeros((h, w), jnp.float32)
    base_index = frame if cfg.animated_noise else 0
    for i in range(n_samples):
        noise = blue_noise_image(h, w, jnp.asarray(base_index) * n_samples + i)
        a = vogel[i] * 0.5 + 0.5
        sample_dir = cosine_sample_hemisphere(
            normal, jnp.broadcast_to(a, uv.shape)
        )
        sample_pos = world_pos + 4.0 * noise[..., 0:1] * radius * sample_dir

        clip, cw = math3d.transform_point_nodiv(proj_view, sample_pos)
        safe_w = jnp.where(jnp.abs(cw) > 1e-8, cw, 1e-8)
        sample_uv = clip[..., :2] / safe_w[..., None] * 0.5 + 0.5

        # one 9-channel nearest gather: sample depth + its normal stencil
        # (`gtao.frag:109-110`; depth texture is NearestFilter)
        sample_normal, sample_depth = _depth_world_normals_at(
            stencil9, sample_uv, cam
        )
        sample_view_z = jnp.abs(
            math3d.depth_to_view_z(sample_depth, cam)
        )
        depth_diff = jnp.maximum(0.0, view_z - sample_view_z) ** 4.0
        normal_dot = math3d.dot(normal, sample_normal)
        ao = ao + smoothstep(0.0, 1.0, 1.0 - depth_diff) * normal_dot

    ao = ao / float(n_samples)
    return jnp.where(depth >= 1.0, 1.0, jnp.clip(ao, 0.0, 1.0))
