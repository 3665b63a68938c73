"""Direction-binned sweep ray tracing: the TPU-native SSGI march.

The reference's screen-space march (`/root/reference/src/ssgi/shader/
ssgi.frag:441-503`) fetches depth at a per-pixel computed uv every
step — a dynamic gather. On the target TPU a gather is priced per
*index* (~7 ns), so the reference discretization costs ~14 ms per step
at 1080p and the 2-ray x (20+5)-step default ~700 ms/frame: dynamic
addressing, not FLOPs, is the wall (CLAUDE.md rule 2b).

This module re-discretizes the *same* trace — same ray geometry, same
``diff in [0, thickness)`` hit law, same miss/env fallback contract —
so that every depth fetch is a whole-frame ``jnp.roll`` (a bulk copy,
no per-index pricing):

* A ray's perspective projection is a 2-D screen line, and 1/w is
  linear in screen distance ``s`` along it (perspective-correct
  interpolation), so the ray's view-z at any screen point is closed
  form: no per-step 3-D advance is needed.
* Rays are binned by their projected screen *direction* into ``dirs``
  sectors. All pixels in a bin sample depth at the same integer texel
  offsets, so one roll per (direction, radius) step serves the whole
  frame; a pixel only accepts hits from its own bin's steps.
* Radii follow a shared geometric schedule (dense near the origin like
  the reference's eased steps, reaching the full frame diagonal).
* The bin set rotates every frame by an R2 low-discrepancy angle, so
  the <= pi/dirs direction snap is zero-mean over frames and the
  temporal accumulator converges to the unsnapped estimate (the same
  mechanism that integrates the reference's per-frame stochastic ray).
* Instead of the reference's 5 binary-refine fetches, the hit position
  is refined *analytically*: with the hit texel's depth already in
  hand, ``z_ray(s) = z_depth`` solves in closed form for ``s`` within
  the bracketing step interval. Zero fetches, tighter than 5 halvings.

Both of SSGI's rays (diffuse + specular) are swept in ONE loop sharing
each step's roll, so the second ray costs only elementwise work.

Deliberate deviations from the gather march (documented in PARITY.md):
out-of-frame samples are misses (the reference's edge-clamped fetches
can manufacture hits from border texels), and rays whose projection
moves less than a texel (|screen dir| ~ 0) miss instead of
sub-pixel-self-hitting. Both are border/degenerate cases the border
fade and temporal filter already suppress.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math3d

EPS = 1e-6
_R2_PHI = 0.6180339887498949  # golden-ratio rotation per frame


def _project_ray(view_pos, l, cam, height, width):
    """Per-pixel screen-line parametrization of the view-space ray.

    Returns (q0, e_hat, k_len, w0, wd, phi):
      q0     (H, W, 2) ray origin in pixel coords
      e_hat  (H, W, 2) unit screen direction of the projected ray
      k_len  (H, W)    |K| with K = (xy_d*w0 - xy_0*w_d) in pixel units;
                       screen distance s and ray parameter t relate via
                       t(s) = s*w0^2 / (|K| - s*w0*wd)
      w0, wd (H, W)    clip-w of the origin / per-unit-t increment
    """
    p = cam.projection_matrix
    scale = jnp.asarray([width * 0.5, height * 0.5], jnp.float32)

    xy0, w0 = math3d.transform_point_nodiv(p, view_pos)
    xy0 = xy0[..., :2] * scale
    # direction rows (no translation): P @ (l, 0)
    lx, ly, lz = l[..., 0], l[..., 1], l[..., 2]
    xyd = jnp.stack(
        [
            (p[0, 0] * lx + p[0, 1] * ly + p[0, 2] * lz) * scale[0],
            (p[1, 0] * lx + p[1, 1] * ly + p[1, 2] * lz) * scale[1],
        ],
        axis=-1,
    )
    wd = p[3, 0] * lx + p[3, 1] * ly + p[3, 2] * lz

    q0 = xy0 / jnp.maximum(w0[..., None], EPS) + scale
    k = xyd * w0[..., None] - xy0 * wd[..., None]
    k_len = jnp.linalg.norm(k, axis=-1)
    e_hat = k / jnp.maximum(k_len[..., None], EPS)
    return q0, e_hat, k_len, w0, wd


def _t_of_s(s, k_len, w0, wd):
    """Ray parameter t at screen distance s (pixels) along the line.

    Multiply order (w0*wd and w0*w0 as separate products) matches the
    Pallas executor's precomputed-plane arithmetic bit for bit.
    """
    denom = k_len - s * (w0 * wd)
    t = s * (w0 * w0) / jnp.where(jnp.abs(denom) > EPS, denom, EPS)
    return t, denom


def _s_of_t(t, k_len, w0, wd):
    """Inverse of :func:`_t_of_s`."""
    w_t = w0 + t * wd
    return k_len * t / jnp.maximum(w0 * w_t, EPS)


def sweep_ray_march(view_pos, rays, depth_tex, cam, frame, thickness,
                    ray_distance, dirs: int = 16, steps: int = 32,
                    min_radius: float = 1.5, bin_noise=None,
                    radiance=None, miss_radiance: bool = False):
    """Trace ``rays`` (list of (H, W, 3) view-space directions) against
    the depth buffer with zero per-pixel gathers.

    Returns a list of (uv, hit_pos, missed) triples with the same
    contract as the gather march (`ops/ssgi.py::_view_space_ray_march`):
    uv in [0,1]^2, hit_pos in view space (1e9 sentinel on miss).

    ``bin_noise`` (optional (H, W) in [0,1)): stochastic bin rounding.
    A ray's projected angle generally falls between two bin directions;
    deterministic nearest-rounding snaps it coherently (error integrates
    out only through the global per-frame R2 rotation). With noise, the
    bin is rounded stochastically in proportion to the angular fraction
    — unbiased per pixel per frame, so the temporal accumulator
    converges to the angular *interpolation* of the two adjacent bins
    and pixel-decorrelated rather than globally-coherent snap error.
    None (or a constant 0.5) reproduces deterministic nearest-rounding.

    ``radiance`` (optional (H, W, 4) f32, f16-rangeable — the prewarped
    accumulated radiance + validity): when given, each ray's tuple gains
    a 4th element ``gi`` (H, W, 4): ``radiance`` read at the hit step's
    texel, accumulated DURING the march from the already-fetched step
    planes — replacing the post-trace per-pixel bilinear gather at the
    hit point (`ssgi.frag:380-388`), which an XLA gather prices at
    ~24 ms/ray at 1080p (CLAUDE.md rule 2b). Deviation: nearest texel at
    the *unrefined* step offset instead of bilinear at the refined
    sub-texel uv (PARITY.md, sweep-mode sampling approximations).

    ``miss_radiance``: additionally keep ``gi`` updated on NOT-yet-hit
    lanes at every valid step, so missed rays end the loop holding the
    radiance at their march-end texel (last in-frame step within
    ``s_end``) — the march-end accumulated fetch `ssgi.frag:430-436`
    blends against env for ``missedRays``. Off by default: it costs two
    extra selects per (radius, ray) in the hot kernel and only the
    ``missed_rays`` option consumes it. (The post-trace gather path —
    no ``radiance`` — needs no flag: it samples at the returned miss
    uv, which already IS the march end.)

    On the TPU backend (1080p-class frames) the march executes inside
    the VMEM-resident Pallas kernel (`ops/pallas/sweep.py`) — identical
    values, HBM-free steps; elsewhere (CPU tests, 4K) the jnp roll loop
    below IS the executor.
    """
    h, w = depth_tex.shape
    n_rays = len(rays)

    # per-frame rotation of the bin set (R2 sequence)
    xi = jnp.mod(jnp.asarray(frame, jnp.float32) * _R2_PHI, 1.0)
    two_pi = 2.0 * jnp.pi
    bin_width = two_pi / dirs

    # shared radial schedule: geometric from min_radius to the diagonal
    diag = float((h * h + w * w) ** 0.5)
    ks = jnp.arange(steps, dtype=jnp.float32)
    radii = min_radius * (diag / min_radius) ** (ks / (steps - 1))
    radii_prev = jnp.concatenate([jnp.zeros((1,)), radii[:-1]])

    # (dirs*steps, 5) step table: dy, dx, s_eff, s_prev, bin index —
    # built inside the trace (jnp) because xi is a traced value
    ang = (jnp.arange(dirs, dtype=jnp.float32) + xi) * bin_width
    dxs = jnp.round(radii[None, :] * jnp.cos(ang)[:, None])
    dys = jnp.round(radii[None, :] * jnp.sin(ang)[:, None])
    # screen distance of the *rounded* texel offset along the bin dir
    s_eff = dxs * jnp.cos(ang)[:, None] + dys * jnp.sin(ang)[:, None]
    s_prev = jnp.broadcast_to(radii_prev[None, :], s_eff.shape)
    bin_of_step = jnp.broadcast_to(
        jnp.arange(dirs, dtype=jnp.float32)[:, None], s_eff.shape
    )
    table = jnp.stack(
        [dys.reshape(-1), dxs.reshape(-1), s_eff.reshape(-1),
         s_prev.reshape(-1), bin_of_step.reshape(-1)], axis=-1
    )

    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]

    # hoisted: view-z commutes with the per-step roll (elementwise), and
    # the f16-packed radiance (2 f32 lanes carry 4 f16 channels) rolls
    # alongside it when the hit-point fetch is folded into the march
    z_full = math3d.depth_to_view_z(depth_tex, cam)
    rad_packed = None
    if radiance is not None:
        rad_packed = jax.lax.bitcast_convert_type(
            radiance.astype(jnp.float16).reshape(h, w, 2, 2), jnp.float32
        )
    # under a mesh: rays traverse arbitrary screen distance, so the roll
    # sources ride ONE all-gather each instead of per-step permute chains
    from ..parallel.context import replicate_for_rolls
    z_full, rad_packed = replicate_for_rolls(z_full, rad_packed)

    per_ray = []
    for l in rays:
        q0, e_hat, k_len, w0, wd = _project_ray(view_pos, l, cam, h, w)
        phi = jnp.arctan2(e_hat[..., 1], e_hat[..., 0])  # (-pi, pi]
        rnd = 0.5 if bin_noise is None else bin_noise
        bin_idx = jnp.mod(
            jnp.floor(phi / bin_width - xi + rnd), float(dirs)
        )
        # screen length of the whole ray (t = ray_distance); rays whose
        # far end is behind the eye (w <= 0) run to the vanishing point
        w_end = w0 + ray_distance * wd
        s_end = jnp.where(
            w_end > EPS,
            _s_of_t(jnp.asarray(ray_distance, jnp.float32), k_len, w0, wd),
            jnp.inf,
        )
        z0 = view_pos[..., 2]
        lz = l[..., 2]
        per_ray.append(dict(
            q0=q0, e_hat=e_hat, k_len=k_len, w0=w0, wd=wd,
            bin_idx=bin_idx, s_end=s_end, z0=z0, lz=lz,
            hit=jnp.zeros((h, w), bool),
            # the refine is deferred: record (s, s_lo, z_depth) at the
            # first hit, solve z_ray(s*) == z_d once after the loop
            s_hit=jnp.zeros((h, w), jnp.float32),
            s_lo_hit=jnp.zeros((h, w), jnp.float32),
            z_d_hit=jnp.zeros((h, w), jnp.float32),
            gi=(jnp.zeros((h, w, 2), jnp.float32)
                if rad_packed is not None else None),
        ))

    use_kernel = kernel_gi = False
    if jax.default_backend() == "tpu":
        from .pallas.sweep import fits_vmem, sweep_march_vmem

        # full variant (in-march hit-point radiance) when z + the two
        # packed radiance planes fit VMEM (1080p-class); z-only variant
        # at 4K — the march still runs HBM-free, the hit-point radiance
        # falls back to the caller's one post-trace bilinear gather/ray
        kernel_gi = fits_vmem(h, w, 3)
        use_kernel = kernel_gi or fits_vmem(h, w, 1)

    if use_kernel:
        planes = [per_ray[0]["z0"]]
        for r in per_ray:
            planes += [
                r["k_len"], r["w0"] * r["w0"], r["w0"] * r["wd"], r["lz"],
                r["bin_idx"], r["s_end"],
            ]
        ktab = jnp.stack(
            [dys.reshape(-1), dxs.reshape(-1), s_eff.reshape(-1)], axis=-1)
        kout = sweep_march_vmem(
            z_full,
            rad_packed if kernel_gi else None,
            ktab, radii_prev, jnp.stack(planes, axis=0),
            thickness, ray_distance, n_rays, dirs, steps,
            miss_gi=miss_radiance,
        )
        for r, (hit, s_raw, s_lo, z_d_hit, gi) in zip(per_ray, kout):
            r["hit"] = hit
            r["s_hit"] = s_raw
            r["s_lo_hit"] = s_lo
            r["z_d_hit"] = z_d_hit
            r["gi"] = gi if (rad_packed is not None and kernel_gi) else None
    else:
        def body(m, carry):
            row = table[m]
            dy = row[0].astype(jnp.int32)
            dx = row[1].astype(jnp.int32)
            s = row[2]
            s_lo = row[3]
            d_bin = row[4]

            z_d = jnp.roll(z_full, (-dy, -dx), (0, 1))
            rad_s = (
                jnp.roll(rad_packed, (-dy, -dx), (0, 1))
                if rad_packed is not None else None
            )
            in_frame = (
                (yy + dy >= 0) & (yy + dy < h)
                & (xx + dx >= 0) & (xx + dx < w)
            )

            out = []
            for r in carry:
                t_s, denom = _t_of_s(s, r["k_len"], r["w0"], r["wd"])
                valid = (denom > EPS) & (t_s >= 0.0) \
                    & (t_s <= ray_distance) & (s <= r["s_end"])
                z_ray = r["z0"] + t_s * r["lz"]
                diff = z_d - z_ray
                cond = (diff >= 0.0) & (diff < thickness)
                upd = (r["bin_idx"] == d_bin) & (~r["hit"]) & in_frame \
                    & valid & cond

                nxt = dict(
                    r,
                    hit=r["hit"] | upd,
                    s_hit=jnp.where(upd, s, r["s_hit"]),
                    s_lo_hit=jnp.where(upd, s_lo, r["s_lo_hit"]),
                    z_d_hit=jnp.where(upd, z_d, r["z_d_hit"]),
                )
                if rad_s is not None:
                    # miss_radiance: track every valid step until hit, so
                    # missed lanes end holding their march-end radiance
                    # (the hit step writes the same value — superset)
                    upd_gi = (
                        (r["bin_idx"] == d_bin) & (~r["hit"]) & in_frame
                        & valid
                    ) if miss_radiance else upd
                    nxt["gi"] = jnp.where(upd_gi[..., None], rad_s, r["gi"])
                out.append(nxt)
            return out

        per_ray = jax.lax.fori_loop(0, dirs * steps, body, per_ray)

    # deferred analytic refine: s* where z_ray(s) == z_d at the recorded
    # hit, clamped to the bracketing step interval (replaces
    # `ssgi.frag:477-503`'s five fetching binary halvings; identical
    # values to refining inside the loop — same inputs, same formula)
    for r in per_ray:
        lz_safe = jnp.where(jnp.abs(r["lz"]) > EPS, r["lz"], EPS)
        t_star = (r["z_d_hit"] - r["z0"]) / lz_safe
        s_star = _s_of_t(t_star, r["k_len"], r["w0"], r["wd"])
        s_ref = jnp.clip(s_star, r["s_lo_hit"], r["s_hit"])
        s_ref = jnp.where(
            (t_star >= 0.0) & (t_star <= ray_distance), s_ref, r["s_hit"]
        )
        r["s_hit"] = jnp.where(r["hit"], s_ref, r["s_hit"])

    results = []
    size = jnp.asarray([w, h], jnp.float32)
    for r, l in zip(per_ray, rays):
        missed = ~r["hit"]
        # miss uv: the march's final position — the ray end or the frame
        # exit along the line, whichever comes first (border-fade input)
        sx = jnp.where(
            r["e_hat"][..., 0] > EPS, (w - r["q0"][..., 0]) / r["e_hat"][..., 0],
            jnp.where(r["e_hat"][..., 0] < -EPS,
                      -r["q0"][..., 0] / r["e_hat"][..., 0], jnp.inf),
        )
        sy = jnp.where(
            r["e_hat"][..., 1] > EPS, (h - r["q0"][..., 1]) / r["e_hat"][..., 1],
            jnp.where(r["e_hat"][..., 1] < -EPS,
                      -r["q0"][..., 1] / r["e_hat"][..., 1], jnp.inf),
        )
        s_exit = jnp.minimum(jnp.minimum(sx, sy), jnp.minimum(r["s_end"], diag))
        s_out = jnp.where(missed, jnp.maximum(s_exit, 0.0), r["s_hit"])

        q = r["q0"] + s_out[..., None] * r["e_hat"]
        uv = q / size
        t_hit, _ = _t_of_s(s_out, r["k_len"], r["w0"], r["wd"])
        hit_pos = view_pos + t_hit[..., None] * l
        hit_pos = jnp.where(missed[..., None], 1.0e9, hit_pos)
        if r["gi"] is not None:
            gi4 = jax.lax.bitcast_convert_type(
                r["gi"], jnp.float16
            ).reshape(h, w, 4).astype(jnp.float32)
            results.append((uv, hit_pos, missed, gi4))
        else:
            results.append((uv, hit_pos, missed))
    return results
