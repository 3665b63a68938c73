"""Piece-profile the SSGI stage on the real TPU (fresh process).

Times each component of the SSGI effect independently with pre-staged
device args and amortized-batch readback-synced timing (CLAUDE.md rules
2/8): the sweep trace loop, env sampling, the prewarp, temporal
reproject, Poisson denoise, and compose. Prints one line per piece.

Usage: python tools/profile_ssgi.py [--cpu] [--size HxW]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    h, w = 1080, 1920
    if "--size" in sys.argv:
        h, w = map(int, sys.argv[sys.argv.index("--size") + 1].split("x"))

    import jax.numpy as jnp

    import realism_effects_tpu as re_tpu
    from realism_effects_tpu.core.rng import blue_noise_image
    from realism_effects_tpu.ops import ssgi as ssgi_mod
    from realism_effects_tpu.ops.ssgi_sweep import sweep_ray_march

    # --- build a realistic frame's inputs once (host), stage on device
    scene = re_tpu.Scene()
    scene.environment = re_tpu.build_equirect_env(
        re_tpu.procedural_sky(64, 128))
    scene.add(re_tpu.make_plane(20, re_tpu.Material(
        diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(re_tpu.make_box((1, 1, 1), re_tpu.Material(
        diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(re_tpu.translation(0, 0.5, 0))
    sph = scene.add(re_tpu.make_sphere(0.6, material=re_tpu.Material(
        diffuse=(0.2, 0.5, 0.9, 1.0), roughness=0.2, metalness=0.8)))
    sph.set_matrix(re_tpu.translation(1.5, 0.6, 0.5))
    cam = re_tpu.PerspectiveCamera(50, w / h, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    composer = re_tpu.EffectComposer(scene, cam, w, h)
    eff = re_tpu.SSGIEffect()
    composer.add_effect(eff)
    composer.render(dt=1 / 60)  # builds state
    img = composer.render(dt=1 / 60)
    print("warmup readback:", float(jnp.max(img)), file=sys.stderr)

    cfg = eff.cfg
    cams = cam.matrices()
    from realism_effects_tpu.scene.rasterizer import (
        rasterize_gbuffer, rasterize_velocity,
    )
    from realism_effects_tpu.scene.shading import shade_direct

    packed = scene.pack()
    mm = scene.model_matrices()
    gb = rasterize_gbuffer(packed, mm, cams.projection_view_matrix, h, w)
    vel = rasterize_velocity(
        packed, mm, mm, cams.projection_view_matrix,
        cams.projection_view_matrix, h, w)
    direct = shade_direct(gb, cams, scene.lighting_params(),
                          env=scene.environment)
    acc = jnp.zeros((h, w, 4), jnp.float32) + 0.25
    env = scene.environment
    frame = jnp.int32(7)

    gb = jax.device_put(gb)
    vel = jax.device_put(vel)

    def timeit(name, fn, *args, iters=8, batches=3):
        jfn = jax.jit(fn)
        out = jfn(*args)
        _ = float(jnp.max(jax.tree.leaves(out)[0]))  # compile+sync
        best = np.inf
        for _b in range(batches):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = jfn(*args)
            _ = float(jnp.max(jax.tree.leaves(o)[0]))
            best = min(best, (time.perf_counter() - t0) * 1000.0 / iters)
        print(f"{name:34s} {best:8.2f} ms")
        return best

    uv = re_tpu.core.math3d.uv_grid(h, w) if hasattr(re_tpu, "core") else None

    from realism_effects_tpu.core import math3d
    from realism_effects_tpu.core.math3d import (
        normalize, transform_dir_transpose,
    )

    uv = math3d.uv_grid(h, w)

    def make_rays(gbuf, camm, fr):
        depth = gbuf.depth
        view_z = ssgi_mod._get_view_z(depth, camm)
        view_pos = math3d.get_view_position(
            uv, view_z, camm.projection_matrix,
            camm.projection_matrix_inverse)
        noise = blue_noise_image(h, w, fr)
        r1, r2 = noise[..., 0], noise[..., 1]
        view_normal = normalize(transform_dir_transpose(
            camm.camera_matrix_world, gbuf.normal))
        from realism_effects_tpu.core import brdf
        cos_hemi = brdf.cosine_sample_hemisphere(
            view_normal, jnp.stack([r1, r2], axis=-1))
        return view_pos, cos_hemi, depth

    # 0. ray setup alone (blue noise, view pos, hemisphere sample) —
    # subtract from the pieces below that embed it
    def rays_only(gbuf, camm, fr):
        view_pos, ray, depth = make_rays(gbuf, camm, fr)
        return view_pos + ray

    timeit("make_rays (noise+viewpos+hemi)", rays_only, gb, cams, frame)

    # pre-staged ray directions/positions for fetch-isolation pieces
    vp_dev, ray_dev, _ = jax.jit(make_rays)(gb, cams, frame)
    ray_ws_dev = jax.jit(
        lambda r, c: transform_dir_transpose(c.view_matrix, r)
    )(ray_dev, cams)
    _ = float(jnp.max(ray_ws_dev))

    # 1. full ssgi kernel (trace+env+brdf, no denoiser)
    def full_ssgi(gbuf, velb, accb, directb, camm, fr):
        return ssgi_mod.ssgi(gbuf, velb, accb, directb, env, camm, fr, cfg,
                             ray_distance=10.0, thickness=10.0, env_blur=0.5)

    timeit("ssgi kernel (trace+env+brdf)", full_ssgi,
           gb, vel, acc, direct, cams, frame)

    # 2. the sweep trace alone (2 rays, default dirs/steps), rays staged
    def trace_only(vp, ray, gbuf, camm, fr):
        res = sweep_ray_march(
            vp, [ray, -ray], gbuf.depth, camm, fr, 10.0, 10.0,
            dirs=cfg.sweep_dirs, steps=cfg.sweep_steps)
        return res[0][0] + res[1][0]

    timeit(f"sweep trace 2 rays {cfg.sweep_dirs}x{cfg.sweep_steps}",
           trace_only, vp_dev, ray_dev, gb, cams, frame)

    # 3. env color fetch (sample_equirect_color), direction staged
    def env_fetch(ray_ws):
        from realism_effects_tpu.core.envmap import sample_equirect_color
        return sample_equirect_color(env, ray_ws, 0.5, quantize=True)

    timeit("env color fetch (1 ray, staged)", env_fetch, ray_ws_dev)

    # 4. env CDF importance sampling (on-tile evaluation)
    def env_cdf(gbuf, camm, fr):
        from realism_effects_tpu.core.envmap import (
            sample_equirect_probability,
        )
        from realism_effects_tpu.core.rng import blue_noise_transform

        def _cdf_on_tile(t):
            pdf_t, dir_t = sample_equirect_probability(
                env, t[..., :2], fast=True)
            return jnp.concatenate([pdf_t[..., None], dir_t], axis=-1)

        return blue_noise_transform(h, w, fr, _cdf_on_tile)

    timeit("env CDF inversion (on-tile)", env_cdf, gb, cams, frame)

    # 5. prewarp + hit fetch
    def prewarp(velb, accb):
        from realism_effects_tpu.ops.pallas.warp import bilinear_window
        acc16 = accb[..., :3].astype(jnp.float16).astype(jnp.float32)
        pre_uv = uv - velb.velocity
        warped, ok = bilinear_window(acc16, pre_uv, ky=8)
        return warped

    timeit("radiance prewarp (window)", prewarp, vel, acc)

    def hit_fetch(accb, ray):
        from realism_effects_tpu.core.sampling import sample_bilinear
        coords = jnp.stack([ray[..., 0] * 0.5 + 0.5,
                            ray[..., 1] * 0.5 + 0.5], axis=-1)
        return sample_bilinear(accb[..., :3].astype(jnp.float16), coords)

    timeit("hit-point radiance fetch (staged)", hit_fetch, acc, ray_dev)

    # 6. denoiser chain pieces: temporal reproject, Poisson denoise,
    # denoiser compose, final ssgi compose — together with piece 1 these
    # account for the bench's whole ssgi-stage ms (BENCH_breakdown).
    from realism_effects_tpu.ops.denoiser_compose import denoiser_compose
    from realism_effects_tpu.ops.compose import ssgi_compose
    from realism_effects_tpu.ops.poisson_denoise import poisson_denoise
    from realism_effects_tpu.ops.temporal_reproject import temporal_reproject

    g_diffuse, g_specular = jax.jit(full_ssgi)(
        gb, vel, acc, direct, cams, frame)
    _ = float(jnp.max(g_diffuse))
    history = [jnp.zeros((h, w, 4), jnp.float32) + 0.2,
               jnp.zeros((h, w, 4), jnp.float32) + 0.2]

    def temporal_piece(gd, gs, hist, velb, gbuf, camm):
        return temporal_reproject(
            [gd, gs], hist, velb, velb, camm, camm, eff.temporal_cfg,
            max_blend=1.0, neighborhood_clamp_intensity=0.5,
            full_accumulate=jnp.asarray(False),
            keep_data=jnp.asarray(True),
            roughness_tex=gbuf.roughness,
        )

    timeit("temporal reproject (2 tex)", temporal_piece,
           g_diffuse, g_specular, history, vel, gb, cams)

    temporal = jax.jit(temporal_piece)(
        g_diffuse, g_specular, history, vel, gb, cams)
    _ = float(jnp.max(temporal[0]))

    def poisson_piece(tmp, gbuf, fr):
        return poisson_denoise(list(tmp), gbuf, fr, eff.denoise_cfg)

    timeit("poisson denoise (1 iter, 2 tex)", poisson_piece,
           tuple(temporal), gb, frame)

    denoised = jax.jit(poisson_piece)(tuple(temporal), gb, frame)
    _ = float(jnp.max(denoised[0]))

    def compose_piece(dn, gbuf, camm, directb):
        comp = denoiser_compose(
            dn[0], dn[1], gbuf, camm,
            scene_color=None, input_type="diffuse_specular")
        return ssgi_compose(comp, directb, gbuf.depth, camm,
                            fog_color=None, fog_density=0.0)

    timeit("denoiser+ssgi compose", compose_piece,
           tuple(denoised), gb, cams, direct)


if __name__ == "__main__":
    main()
