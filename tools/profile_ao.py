"""Piece-profile the HBAO stage on the real TPU (fresh process).

BENCH_r04: hbao = 53.2 ms at 1080p. Times the parts: blue-noise +
sample-direction setup, the multi-tap window depth fetch (Pallas), the
occlusion combine, the Poisson denoise iterations, and the compose —
with pre-staged device args, amortized readback-synced (CLAUDE.md 2/8).

Usage: python tools/profile_ao.py [--cpu] [--size HxW] [--ky N]
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
    ky = 32
    if "--ky" in sys.argv:
        ky = int(sys.argv[sys.argv.index("--ky") + 1])

    import jax.numpy as jnp

    import realism_effects_tpu as re_tpu
    from realism_effects_tpu.ops import ao as ao_mod

    scene = re_tpu.Scene()
    scene.add(re_tpu.make_plane(20, re_tpu.Material(
        diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(re_tpu.make_box((1, 1, 1), re_tpu.Material(
        diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(re_tpu.translation(0, 0.5, 0))
    cam = re_tpu.PerspectiveCamera(50, w / h, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    cams = cam.matrices()

    from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer

    gb = rasterize_gbuffer(scene.pack(), scene.model_matrices(),
                           cams.projection_view_matrix, h, w)
    depth = jax.device_put(gb.depth)
    normal = jax.device_put(gb.normal)
    frame = jnp.int32(7)
    print("warmup readback:", float(jnp.max(depth)), file=sys.stderr)

    cfg = ao_mod.AOConfig(window_ky=ky)

    def timeit(name, fn, *args, iters=8, batches=3):
        jfn = jax.jit(fn)
        out = jfn(*args)
        _ = float(jnp.max(jax.tree.leaves(out)[0]))
        best = np.inf
        for _b in range(batches):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = jfn(*args)
            _ = float(jnp.max(jax.tree.leaves(o)[0]))
            best = min(best, (time.perf_counter() - t0) * 1000.0 / iters)
        print(f"{name:40s} {best:8.2f} ms")
        return best

    # 1. the full HBAO kernel (fused Pallas vs jnp+window paths)
    timeit(f"hbao fused (spp=8, ky={ky})",
           lambda d, n, f: ao_mod.hbao(d, n, cams, f, cfg),
           depth, normal, frame)

    def hbao_unfused(d, n, f):
        old = ao_mod.USE_FUSED_KERNEL
        ao_mod.USE_FUSED_KERNEL = False
        try:
            return ao_mod.hbao(d, n, cams, f, cfg)
        finally:
            ao_mod.USE_FUSED_KERNEL = old

    timeit(f"hbao jnp+window (spp=8, ky={ky})", hbao_unfused,
           depth, normal, frame)

    # 1b. the AO Poisson denoise alone
    from realism_effects_tpu.ops.poisson_denoise import (
        PoissonDenoiseConfig, poisson_denoise_ao,
    )
    dn_cfg = PoissonDenoiseConfig()
    ao_plane = jax.device_put(jnp.clip(gb.depth * 0.9, 0.0, 1.0))
    _ = float(jnp.max(ao_plane))
    timeit("poisson_denoise_ao (1 iter)",
           lambda a, n, f: poisson_denoise_ao(a, n, gb, f, dn_cfg),
           ao_plane, normal, frame)

    # 2. sample setup only (noise + hemisphere + project), no fetch
    def setup_only(d, n, f):
        from realism_effects_tpu.core import math3d
        from realism_effects_tpu.core.brdf import cosine_sample_hemisphere
        from realism_effects_tpu.core.math3d import screen_to_world, uv_grid
        from realism_effects_tpu.core.rng import blue_noise_image
        uv = uv_grid(h, w)
        world_pos = screen_to_world(uv, d, cams.camera_matrix_world,
                                    cams.projection_matrix_inverse)
        acc = jnp.zeros((h, w, 2), jnp.float32)
        for i in range(cfg.spp):
            noise = blue_noise_image(h, w, jnp.asarray(i, jnp.int32) + f)
            sd = cosine_sample_hemisphere(n, noise[..., :2])
            dist = cfg.distance * noise[..., 2] ** 2.0
            sp = world_pos + dist[..., None] * sd
            clip, cw = math3d.transform_point_nodiv(
                cams.projection_view_matrix, sp)
            acc = acc + clip[..., :2] / jnp.where(
                jnp.abs(cw) > 1e-8, cw, 1e-8)[..., None]
        return acc

    timeit("  sample setup x8 (no fetch)", setup_only, depth, normal, frame)

    # 3. the multi-target window fetch alone (uvs staged)
    from realism_effects_tpu.core.math3d import uv_grid
    uv = uv_grid(h, w)
    uvs8 = jax.device_put(jnp.broadcast_to(
        uv[None] + jnp.linspace(-0.01, 0.01, 8)[:, None, None, None],
        (8, h, w, 2)))
    _ = float(jnp.max(uvs8))

    def window_fetch(d, uvs):
        from realism_effects_tpu.ops.pallas.warp import nearest_window_multi
        vals, ok = nearest_window_multi(d, uvs, ky=ky)
        return vals

    timeit(f"  nearest_window_multi x8 (ky={ky})", window_fetch,
           depth, uvs8)

    for ky2 in (8, 16):
        timeit(f"  nearest_window_multi x8 (ky={ky2})",
               lambda d, uvs, k=ky2: __import__(
                   "realism_effects_tpu.ops.pallas.warp",
                   fromlist=["nearest_window_multi"]
               ).nearest_window_multi(d, uvs, ky=k)[0],
               depth, uvs8)

    # 4. denoise + compose (the rest of the AO effect stage)
    from realism_effects_tpu.effects.ao import HBAOEffect
    eff = HBAOEffect()
    composer = re_tpu.EffectComposer(scene, cam, w, h)
    composer.add_effect(eff)
    img = composer.render(dt=1 / 60)
    _ = float(jnp.max(img))
    composer.collect_timings = True
    for _ in range(4):
        img = composer.render(dt=1 / 60)
        _ = float(jnp.max(img))
    print("composer stage timings:", composer.last_timings, file=sys.stderr)


if __name__ == "__main__":
    main()
