"""VMEM-resident sweep ray march: the whole SSGI trace in one kernel.

The jnp sweep executor (`ops/ssgi_sweep.py`) runs dirs*steps whole-frame
rolls through a `lax.fori_loop`; every iteration round-trips the depth
plane and the per-ray carry through HBM (~100 MB/step at 1080p), so the
trace is HBM-bound even though every fetch is gather-free. This kernel
keeps the WHOLE depth texture (and the prewarped radiance, f16-packed)
resident in VMEM, so each step costs only VPU-rate vector work:

* grid over row blocks; the full (3, H, W) packed texture [view-z,
  radiance-lo, radiance-hi] is replicated into every block's VMEM
  (~25 MB at 1080p — why this kernel gates on resolution, see
  :func:`fits_vmem`).
* radius-major loop (`lax.fori_loop` over the shared radial schedule):
  for each radius, the 16 direction offsets are fetched by dynamic
  8-aligned row slice + sublane/lane rolls (a "roll" at VMEM speed) and
  each pixel SELECTS its own bin's fetch — the same one-roll-serves-
  the-frame discretization as the jnp executor, restructured so the
  per-ray hit math runs once per radius instead of once per (dir, step).
* the kernel is TABLE-EXACT: the per-(dir, step) screen distance
  ``s_eff`` comes from the same SMEM table the jnp executor uses (no
  per-pixel re-rounding), out-of-frame samples are masked by selecting
  a -inf depth sentinel (hit condition can never fire), and
  ``_t_of_s``'s multiply order matches the jnp path — the two
  executors compute identical f32 expressions on identical inputs.
* the analytic refine (`ssgi_sweep.py` docstring) is DEFERRED: the
  kernel records (s, s_lo, z_depth) at the first hit and the caller
  solves `z_ray(s) == z_d` once per pixel outside the loop — identical
  values, ~8 fewer vector ops per ray per step.
* the hit-point radiance (`ssgi.frag:380-388`'s accumulatedTexture
  fetch, prewarped like the XLA path) is accumulated DURING the march
  from the same rolled planes: the post-trace per-pixel bilinear gather
  (~24 ms/ray) disappears. Deviation vs the gather path: the radiance
  is read at the hit *step texel* (nearest) instead of bilinearly at
  the refined sub-texel position — PARITY.md "sweep-mode sampling
  approximations".

The kernel's only per-step scalars are the (dy, dx, s_eff) rows + the
bracketing radii, passed as SMEM tables (xi — the per-frame R2 bin
rotation — is traced, so the tables cannot be baked in).

This executor is TPU-only; on CPU (tests) `sweep_ray_march` keeps the
jnp roll loop, which this kernel matches value-for-value (same
formulas, same f32 precision, same table; the equality harness
`tools/check_sweep_kernel.py` verifies this on real hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6
_BR = 64          # rows per program
_LANE = 128
_SLAB = _BR + 8   # fetched rows: 8-aligned start + sublane roll slack
# depth sentinel for out-of-frame samples: diff = z_d - z_ray is hugely
# negative, so the `diff in [0, thickness)` hit law can never fire
_Z_FAR = -3.0e38

#: VMEM budget for the replicated packed texture (z + radiance): the
#: kernel additionally holds ~30 (BR, W) planes, so cap the texture at
#: 48 MB (1080p packs 25 MB with the radiance planes; 4K needs 100 MB
#: -> the z-only variant below, whose 34 MB texture still fits).
_TEX_VMEM_CAP = 48 * 1024 * 1024


def fits_vmem(height: int, width: int, channels: int = 3) -> bool:
    """Whether the replicated texture fits the kernel's VMEM budget.

    ``channels=3`` is the full variant (view-z + 2 packed-f16 radiance
    planes, in-march hit-point gi); ``channels=1`` the z-only variant
    (4K path: the march fits, the hit-point radiance falls back to the
    caller's one post-trace bilinear gather per ray)."""
    hp = -(-height // _BR) * _BR
    wp = -(-width // _LANE) * _LANE
    return channels * (hp + 8) * wp * 4 <= _TEX_VMEM_CAP


def _sweep_kernel(tab_ref, slo_ref, par_ref, tex_ref, planes_ref,
                  out_ref, *, n_rays: int, dirs: int, steps: int,
                  br: int, hp: int, wp: int, with_gi: bool = True,
                  miss_gi: bool = False):
    """Grid (hp // br,).

    tab_ref   (dirs*steps, 3) SMEM: (dy, dx, s_eff) per (dir, step)
    slo_ref   (steps,)        SMEM: bracketing previous radius (s_lo)
    par_ref   (4,)            SMEM: thickness, ray_distance, h, w
    tex_ref   (C, hp + 8, wp) VMEM: [view-z, rad_packed0, rad_packed1]
              (C=3 with_gi; C=1 z-only)
    planes_ref (1 + 6*n_rays, br, wp): z0 then per ray
               [k_len, p2=w0^2, rwd=w0*wd, lz, bin, s_end]
    out_ref   (P*n_rays, br, wp): per ray
               [hit, s_hit, s_lo, z_d_hit(, gi0, gi1)] (P=6/4)
    """
    n_out = 6 if with_gi else 4
    n_tex = 3 if with_gi else 1
    i = pl.program_id(0)
    y0 = i * br

    thickness = par_ref[0]
    ray_distance = par_ref[1]
    h = par_ref[2].astype(jnp.int32)
    w = par_ref[3].astype(jnp.int32)

    z0 = planes_ref[0]
    rays = []
    for r in range(n_rays):
        b = 1 + 6 * r
        rays.append(dict(
            k_len=planes_ref[b], p2=planes_ref[b + 1],
            rwd=planes_ref[b + 2], lz=planes_ref[b + 3],
            bin=planes_ref[b + 4], s_end=planes_ref[b + 5],
        ))

    for r in range(n_rays):
        for p in range(n_out):
            out_ref[n_out * r + p] = jnp.zeros((br, wp), jnp.float32)

    rr = jax.lax.broadcasted_iota(jnp.int32, (br, wp), 0) + y0
    cc = jax.lax.broadcasted_iota(jnp.int32, (br, wp), 1)

    def fetch(dy, dx):
        """tex[:, y + dy, x + dx] for every (y, x) in the block.

        The 8-aligned dynamic row slice always stays inside the
        (hp + 8)-row padded texture; whenever the true source row
        0 <= y + dy < h the returned value is exact (the slab bounds
        cover [max(start, 0), min(start + br, h)) for any start), and
        out-of-frame rows return arbitrary texture rows — callers mask
        them via the in-frame select.
        """
        start = y0 + dy
        # multiply-by-8 LAST so Mosaic can statically prove the dynamic
        # sublane slice offset is 8-aligned ((hp + 8) - _SLAB = hp - br
        # is a multiple of 8)
        start8 = jnp.clip(start // 8, 0, (hp - br) // 8) * 8
        fine = start - start8
        out = []
        for ch in range(n_tex):
            slab = tex_ref[ch, pl.ds(start8, _SLAB), :]
            rows = pltpu.roll(slab, (-fine) % _SLAB, axis=0)[:br]
            out.append(pltpu.roll(rows, (-dx) % wp, axis=1))
        return out

    def body(k, carry):
        s_lo_k = slo_ref[k]

        # per-dir fetch + per-pixel bin select (z sentinel masks
        # out-of-frame samples; s is the table's scalar, bit-identical
        # to the jnp executor's)
        z_sel = [jnp.full((br, wp), _Z_FAR, jnp.float32)
                 for _ in range(n_rays)]
        s_sel = [jnp.zeros((br, wp), jnp.float32) for _ in range(n_rays)]
        g0_sel = [jnp.zeros((br, wp), jnp.float32) for _ in range(n_rays)]
        g1_sel = [jnp.zeros((br, wp), jnp.float32) for _ in range(n_rays)]
        for d in range(dirs):
            m = d * steps + k
            dy = tab_ref[m, 0].astype(jnp.int32)
            dx = tab_ref[m, 1].astype(jnp.int32)
            s_dk = tab_ref[m, 2]
            fetched = fetch(dy, dx)
            z_d = fetched[0]
            in_frame = (
                (rr + dy >= 0) & (rr + dy < h)
                & (cc + dx >= 0) & (cc + dx < w)
            )
            for r in range(n_rays):
                mine = rays[r]["bin"] == float(d)
                sel = mine & in_frame
                z_sel[r] = jnp.where(sel, z_d, z_sel[r])
                s_sel[r] = jnp.where(mine, s_dk, s_sel[r])
                if with_gi:
                    g0_sel[r] = jnp.where(sel, fetched[1], g0_sel[r])
                    g1_sel[r] = jnp.where(sel, fetched[2], g1_sel[r])

        # per-radius ray math (once per ray, on its selected bin)
        for r in range(n_rays):
            ray = rays[r]
            s = s_sel[r]
            denom = ray["k_len"] - s * ray["rwd"]
            t_s = s * ray["p2"] / jnp.where(jnp.abs(denom) > EPS,
                                            denom, EPS)
            valid = (denom > EPS) & (t_s >= 0.0) \
                & (t_s <= ray_distance) & (s <= ray["s_end"])
            z_ray = z0 + t_s * ray["lz"]
            diff = z_sel[r] - z_ray
            cond = (diff >= 0.0) & (diff < thickness)
            b = n_out * r
            hit_prev = out_ref[b + 0]
            upd = (hit_prev < 0.5) & valid & cond
            out_ref[b + 0] = jnp.where(upd, 1.0, hit_prev)
            out_ref[b + 1] = jnp.where(upd, s, out_ref[b + 1])
            out_ref[b + 2] = jnp.where(upd, s_lo_k, out_ref[b + 2])
            out_ref[b + 3] = jnp.where(upd, z_sel[r], out_ref[b + 3])
            if with_gi:
                if miss_gi:
                    # track every valid in-frame step until hit: missed
                    # lanes end holding their march-end radiance (see
                    # ssgi_sweep.sweep_ray_march miss_radiance). The
                    # z sentinel marks out-of-frame/unselected lanes.
                    upd_gi = ((hit_prev < 0.5) & valid
                              & (z_sel[r] > _Z_FAR * 0.5))
                else:
                    upd_gi = upd
                out_ref[b + 4] = jnp.where(upd_gi, g0_sel[r],
                                           out_ref[b + 4])
                out_ref[b + 5] = jnp.where(upd_gi, g1_sel[r],
                                           out_ref[b + 5])
        return carry

    jax.lax.fori_loop(0, steps, body, 0)


def sweep_march_vmem(z_tex, rad_packed, table, radii_prev,
                     planes, thickness, ray_distance, n_rays: int,
                     dirs: int, steps: int, miss_gi: bool = False):
    """Run the VMEM-resident march.

    z_tex      (H, W) f32 view-space depth (negative z)
    rad_packed (H, W, 2) f32 (bitcast pairs of the f16 prewarped
               radiance), or None for the z-only variant (4K path)
    table      (dirs*steps, 3) f32 rounded (dy, dx, s_eff)
    radii_prev (steps,) f32 bracketing lower radius per step
    planes     (1 + 6*n_rays, H, W) f32 (see kernel docstring)
    Returns (hit bool, s_hit, s_lo, z_d_hit, gi_packed (H, W, 2) | None)
    per ray as a list of tuples.
    """
    with_gi = rad_packed is not None
    n_out = 6 if with_gi else 4
    h, w = z_tex.shape
    hp = -(-h // _BR) * _BR
    wp = -(-w // _LANE) * _LANE
    ph, pw = hp - h, wp - w

    chans = [z_tex]
    if with_gi:
        chans += [rad_packed[..., 0], rad_packed[..., 1]]
    tex = jnp.stack(chans, axis=0)
    # pad rows by 8 beyond the block multiple so the kernel's 8-aligned
    # dynamic slab slice never has to clamp across a needed row
    tex = jnp.pad(tex, ((0, 0), (0, ph + 8), (0, pw)))
    if ph or pw:
        planes = jnp.pad(planes, ((0, 0), (0, ph), (0, pw)))

    params = jnp.stack([
        jnp.asarray(thickness, jnp.float32),
        jnp.asarray(ray_distance, jnp.float32),
        jnp.float32(h), jnp.float32(w),
    ])

    kern = functools.partial(
        _sweep_kernel, n_rays=n_rays, dirs=dirs, steps=steps,
        br=_BR, hp=hp, wp=wp, with_gi=with_gi, miss_gi=miss_gi)
    out = pl.pallas_call(
        kern,
        grid=(hp // _BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((len(chans), hp + 8, wp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((planes.shape[0], _BR, wp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out * n_rays, _BR, wp),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_out * n_rays, hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=False,
    )(table, radii_prev, params, tex, planes)
    out = out[:, :h, :w]
    res = []
    for r in range(n_rays):
        b = n_out * r
        hit = out[b + 0] > 0.5
        gi = (jnp.stack([out[b + 4], out[b + 5]], axis=-1)
              if with_gi else None)
        res.append((hit, out[b + 1], out[b + 2], out[b + 3], gi))
    return res
