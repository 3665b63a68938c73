"""Equality + timing harness for the VMEM-resident sweep kernel.

Runs `sweep_ray_march` twice on the real TPU — once with the Pallas
executor (ops/pallas/sweep.py), once forced onto the jnp roll loop —
on a realistic rasterized scene, and compares (uv, hit_pos, missed, gi)
per ray. The two executors compute the same formulas in the same f32
precision; the only tolerated divergence is round-to-even ties in the
per-pixel offset rounding (a hit/miss flip on a handful of border
texels), so the check reports mismatch *fractions* and value errors on
agreeing pixels. Also times both executors (amortized, readback-synced;
CLAUDE.md rule 2).

Usage: python tools/check_sweep_kernel.py [--size HxW]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    h, w = 1080, 1920
    if "--size" in sys.argv:
        h, w = map(int, sys.argv[sys.argv.index("--size") + 1].split("x"))

    import realism_effects_tpu as re_tpu
    from realism_effects_tpu.core import brdf, math3d
    from realism_effects_tpu.core.math3d import (
        normalize, transform_dir_transpose,
    )
    from realism_effects_tpu.core.rng import blue_noise_image
    from realism_effects_tpu.ops import ssgi_sweep
    from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer

    scene = re_tpu.Scene()
    scene.add(re_tpu.make_plane(20, re_tpu.Material(
        diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(re_tpu.make_box((1, 1, 1), re_tpu.Material(
        diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(re_tpu.translation(0, 0.5, 0))
    sph = scene.add(re_tpu.make_sphere(0.6, material=re_tpu.Material(
        diffuse=(0.2, 0.5, 0.9, 1.0))))
    sph.set_matrix(re_tpu.translation(1.5, 0.6, 0.5))
    cam = re_tpu.PerspectiveCamera(50, w / h, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    cams = cam.matrices()

    gb = rasterize_gbuffer(scene.pack(), scene.model_matrices(),
                           cams.projection_view_matrix, h, w)
    depth = gb.depth
    uv = math3d.uv_grid(h, w)
    view_z = math3d.depth_to_view_z(depth, cams)
    view_pos = math3d.get_view_position(
        uv, view_z, cams.projection_matrix, cams.projection_matrix_inverse)
    noise = blue_noise_image(h, w, jnp.int32(7))
    view_normal = normalize(transform_dir_transpose(
        cams.camera_matrix_world, gb.normal))
    ray1 = brdf.cosine_sample_hemisphere(
        view_normal, noise[..., :2])
    ray2 = normalize(ray1 + jnp.asarray([0.3, -0.2, 0.1]))
    bin_noise = blue_noise_image(h, w, jnp.int32(2055))[..., 0]
    radiance = jnp.concatenate([
        jnp.stack([jnp.sin(uv[..., 0] * 37.0) * 0.5 + 0.5,
                   uv[..., 1], uv[..., 0] * uv[..., 1]], axis=-1),
        jnp.ones((h, w, 1), jnp.float32),
    ], axis=-1)

    def run(force_jnp):
        def fn(vp, r1, r2, d, bn, rad, fr):
            return ssgi_sweep.sweep_ray_march(
                vp, [r1, r2], d, cams, fr, 2.0, 10.0,
                dirs=16, steps=32, bin_noise=bn, radiance=rad)
        if force_jnp:
            import realism_effects_tpu.ops.pallas.sweep as sk
            orig = sk.fits_vmem
            sk.fits_vmem = lambda *a: False
            try:
                jfn = jax.jit(fn)
                out = jfn(view_pos, ray1, ray2, depth, bin_noise,
                          radiance, jnp.int32(7))
                jax.block_until_ready(out)
            finally:
                sk.fits_vmem = orig
            return jfn, out
        jfn = jax.jit(fn)
        out = jfn(view_pos, ray1, ray2, depth, bin_noise, radiance,
                  jnp.int32(7))
        jax.block_until_ready(out)
        return jfn, out

    fn_k, out_k = run(False)
    fn_j, out_j = run(True)
    _ = float(jnp.max(out_k[0][0]))  # enter synchronous mode

    names = ["uv", "hit_pos", "missed", "gi"]
    worst_flip = 0.0
    for r in range(2):
        miss_k = np.asarray(out_k[r][2])
        miss_j = np.asarray(out_j[r][2])
        flip = float((miss_k != miss_j).mean())
        worst_flip = max(worst_flip, flip)
        agree = ~(miss_k != miss_j)
        print(f"ray{r}: hit/miss flip fraction {flip:.2e} "
              f"(hit rate {1 - miss_j.mean():.3f})")
        for t, name in enumerate(names):
            a = np.asarray(out_k[r][t])
            b = np.asarray(out_j[r][t])
            if a.dtype == bool:
                continue
            m = agree if a.ndim == 2 else agree[..., None]
            # hit_pos miss sentinel is 1e9: compare hits only
            if name == "hit_pos":
                m = m & (b < 1e8)
            err = np.abs(np.where(m, a - b, 0.0))
            print(f"  {name:8s} max|err| on agreeing px: {err.max():.3e}")

    def timeit(label, jfn):
        best = np.inf
        for _b in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(8):
                o = jfn(view_pos, ray1, ray2, depth, bin_noise,
                        radiance, jnp.int32(7))
            _ = float(jnp.max(o[0][0]))
            best = min(best, (time.perf_counter() - t0) * 1000.0 / 8)
        print(f"{label}: {best:.2f} ms")

    timeit("pallas executor", fn_k)
    timeit("jnp executor   ", fn_j)
    print("OK" if worst_flip < 2e-3 else "FLIP FRACTION TOO HIGH")


if __name__ == "__main__":
    main()
