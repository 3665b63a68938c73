"""Motion-blur line-integral kernel (K12).

`/root/reference/src/motion-blur/shader/motion_blur.frag`: early-out when
static (as a mask), blue-noise jittered start/end UVs centered on the
pixel (per John Chapman's per-object motion blur), ``samples + 1`` taps
averaged with the center color counted twice (`:35-42`).

Two discretizations of the same integral:

* :func:`motion_blur` — the reference's: ``samples + 1`` bilinear taps
  at per-pixel uvs.  Each tap is a full-resolution dynamic gather,
  priced per index on this TPU (CLAUDE.md rule 2b): the measured cost
  was ~550 ms at 1080p — the single most expensive stage of the
  flagship frame.
* :func:`motion_blur_sweep` — gather-free: pixels bin by velocity
  *direction* (R2-rotated per frame), the blur segment integrates over
  a shared geometric radius ladder, and every (direction, radius) cell
  is served by ONE whole-frame ``jnp.roll`` (a bulk copy).  Each
  pixel's line integral weights every cell by its overlap with the
  pixel's own jittered segment, so varying blur lengths come out exact
  up to the cell quantization; the <= pi/dirs direction snap and the
  radial cell size are dithered by the per-frame bin rotation and the
  reference's own forward segment jitter, which TRAA integrates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math3d import mix, uv_grid
from ..core.rng import blue_noise_image
from ..core.sampling import sample_bilinear

_R2_PHI = 0.6180339887498949


def motion_blur(color: jnp.ndarray, velocity: jnp.ndarray, frame,
                intensity=1.0, jitter=1.0, delta_time=1.0 / 60.0,
                samples: int = 16) -> jnp.ndarray:
    h, w = color.shape[:2]
    uv = uv_grid(h, w)

    vel = velocity * intensity
    did_move = jnp.sum(velocity * velocity, axis=-1) > 1e-9

    noise = blue_noise_image(h, w, frame)
    jitter_offset = jitter * vel * noise[..., :2]
    frame_speed = (1.0 / 100.0) / delta_time

    start_uv = jnp.maximum(uv + (jitter_offset - vel * 0.5) * frame_speed, 0.0)
    end_uv = jnp.minimum(uv + (jitter_offset + vel * 0.5) * frame_speed, 1.0)

    acc = color
    samples_f = float(samples)
    for i in range(samples + 1):
        t = i / samples_f
        tap_uv = mix(start_uv, end_uv, t)
        # inputTexture is the composer's HalfFloat framebuffer
        # (`example/main.js` frameBufferType): half quad-packed taps
        acc = acc + sample_bilinear(color, tap_uv, half=True)
    blurred = acc / (samples_f + 2.0)

    return jnp.where(did_move[..., None], blurred, color)


def motion_blur_sweep(color: jnp.ndarray, velocity: jnp.ndarray, frame,
                      intensity=1.0, jitter=1.0, delta_time=1.0 / 60.0,
                      dirs: int = 16, steps: int = 12,
                      min_radius: float = 0.75,
                      max_radius_frac: float = 0.25) -> jnp.ndarray:
    """Gather-free K12: direction-binned roll-sweep line integral.

    Same integral as :func:`motion_blur` (`motion_blur.frag:23-42`):
    average scene color over the segment ``uv + (jitterOffset ± vel/2) *
    frameSpeed``.  Discretization: the segment's pixel-space direction
    picks one of ``dirs`` R2-rotated bins per side (+/-); a shared
    geometric radius ladder ``min_radius .. max_radius_frac * diag``
    partitions [0, r_max) into cells; cell k of bin d is sampled by ONE
    whole-frame roll, and each pixel weights it by the overlap of the
    cell with its own jittered per-side extent — piecewise-constant
    quadrature with exactly the reference's segment (incl. the
    forward-biased ``jitter * noise * vel`` shift).  Out-of-frame taps
    drop and renormalize (the reference clamps uvs to the border
    instead); the uncovered near-origin sliver plus the reference's
    double-counted center tap weight the pixel's own color.
    """
    h, w = color.shape[:2]

    vel = velocity * intensity
    did_move = jnp.sum(velocity * velocity, axis=-1) > 1e-9
    frame_speed = (1.0 / 100.0) / delta_time

    # segment geometry in pixel space
    px = jnp.asarray([w, h], jnp.float32)
    seg = vel * frame_speed * px          # full extent, pixels
    seg_len = jnp.linalg.norm(seg, axis=-1)
    half = 0.5 * seg_len                  # L: half-length
    theta = jnp.arctan2(seg[..., 1], seg[..., 0])

    # the reference's forward segment shift: jitterOffset = jitter *
    # vel * noise (componentwise rg noise; we use the scalar r channel
    # along the segment, same distribution along the line)
    noise = blue_noise_image(h, w, frame)
    j_px = jitter * noise[..., 0] * seg_len
    # per-side integration extents: s in [0, u_pos] along +theta and
    # [0, u_neg] along -theta covers the shifted segment [j-L, j+L]
    u_pos = jnp.maximum(j_px + half, 0.0)
    u_neg = jnp.maximum(half - j_px, 0.0)

    xi = jnp.mod(jnp.asarray(frame, jnp.float32) * _R2_PHI, 1.0)
    two_pi = 2.0 * jnp.pi
    bin_w = two_pi / dirs
    bin_pos = jnp.mod(jnp.round(theta / bin_w - xi), float(dirs))
    bin_neg = jnp.mod(jnp.round((theta + jnp.pi) / bin_w - xi), float(dirs))

    # shared radius ladder: geometric nodes, cell edges at geometric
    # midpoints (cell 0 starts at 0 so short blurs stay covered)
    diag = float((h * h + w * w) ** 0.5)
    r_max = max_radius_frac * diag
    ks = jnp.arange(steps, dtype=jnp.float32)
    nodes = min_radius * (r_max / min_radius) ** (ks / (steps - 1))
    edges_mid = jnp.sqrt(nodes[:-1] * nodes[1:])
    e_lo = jnp.concatenate([jnp.zeros((1,)), edges_mid])
    e_hi = jnp.concatenate([edges_mid, nodes[-1:]])

    ang = (jnp.arange(dirs, dtype=jnp.float32) + xi) * bin_w
    dxs = jnp.round(nodes[None, :] * jnp.cos(ang)[:, None])
    dys = jnp.round(nodes[None, :] * jnp.sin(ang)[:, None])
    table = jnp.stack(
        [dys.reshape(-1), dxs.reshape(-1),
         jnp.broadcast_to(e_lo[None, :], dxs.shape).reshape(-1),
         jnp.broadcast_to(e_hi[None, :], dxs.shape).reshape(-1),
         jnp.broadcast_to(
             jnp.arange(dirs, dtype=jnp.float32)[:, None], dxs.shape
         ).reshape(-1)],
        axis=-1,
    )

    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]

    # roll source: (r,g) and (b,0) as two half2x16 channels — the input
    # IS the composer's HalfFloat framebuffer (the gather path samples it
    # with half=True), so f16 texels are the spec storage, and each
    # whole-frame roll moves 2/3 of the f32 bytes
    from ..core.packing import pack_half2x16, unpack_half2x16
    color16 = jnp.stack(
        [pack_half2x16(color[..., 0:2]),
         pack_half2x16(jnp.concatenate(
             [color[..., 2:3], jnp.zeros_like(color[..., 2:3])], -1))],
        axis=-1,
    )
    # under a mesh the rolled color plane is replicated once (see
    # parallel.context.replicate_for_rolls) so per-step rolls stay local
    from ..parallel.context import replicate_for_rolls
    color_src = replicate_for_rolls(color16)

    # K cells per fori step: the accumulator read-modify-write (f32 rgb +
    # weight, ~64 MB/update at 1080p) amortizes over K rolls instead of
    # paying per cell — the loop was accumulator-bandwidth-bound
    k_batch = 8
    n_cells = dirs * steps
    pad_c = (-n_cells) % k_batch
    if pad_c:
        # zero rows carry lo == hi == 0 -> weight 0 (u_pos/u_neg >= 0)
        table = jnp.concatenate(
            [table, jnp.zeros((pad_c, table.shape[1]), table.dtype)], 0
        )

    def body(m, carry):
        acc, wsum = carry
        rows = jax.lax.dynamic_slice(
            table, (m * k_batch, 0), (k_batch, table.shape[1])
        )
        for t in range(k_batch):
            row = rows[t]
            dy = row[0].astype(jnp.int32)
            dx = row[1].astype(jnp.int32)
            lo, hi, d_bin = row[2], row[3], row[4]

            rolled = jnp.roll(color_src, (-dy, -dx), (0, 1))
            rg = unpack_half2x16(rolled[..., 0])
            b = unpack_half2x16(rolled[..., 1])[..., 0]
            in_frame = (
                (yy + dy >= 0) & (yy + dy < h)
                & (xx + dx >= 0) & (xx + dx < w)
            )
            # cell-overlap weight per side, on the side whose bin matches
            w_pos = jnp.clip(jnp.minimum(u_pos, hi) - lo, 0.0, None) \
                * (bin_pos == d_bin)
            w_neg = jnp.clip(jnp.minimum(u_neg, hi) - lo, 0.0, None) \
                * (bin_neg == d_bin)
            wgt = (w_pos + w_neg) * in_frame
            acc = acc + jnp.concatenate(
                [rg, b[..., None]], axis=-1
            ) * wgt[..., None]
            wsum = wsum + wgt
        return acc, wsum

    acc0 = jnp.zeros_like(color)
    wsum0 = jnp.zeros(color.shape[:2], jnp.float32)
    acc, wsum = jax.lax.fori_loop(
        0, (n_cells + pad_c) // k_batch, body, (acc0, wsum0)
    )

    # center: the near-origin sliver both sides leave uncovered when the
    # extent is shorter than cell 0, plus the reference's double-counted
    # center tap (2 of samples+2 ~ a 2/(16+2) fraction of the extent)
    covered = jnp.minimum(u_pos, e_hi[-1]) + jnp.minimum(u_neg, e_hi[-1])
    w_center = jnp.maximum(u_pos + u_neg - covered, 0.0) \
        + (u_pos + u_neg) * (2.0 / 18.0) + 1e-6
    acc = acc + color * w_center[..., None]
    blurred = acc / (wsum + w_center)[..., None]

    return jnp.where(did_move[..., None], blurred, color)
