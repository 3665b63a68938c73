"""Equality + timing harness: Pallas z-scan kernel vs the XLA scan.

Runs `scene/rasterizer._visibility` both ways on the real TPU for the
bench scene (and a torture camera inside the geometry), reporting
winner flips, depth mismatches, and amortized timings. A winner can
legitimately flip only where two triangles tie within ~1 ulp of z
(the kernel hoists the interpolant sums per-triangle, see
ops/pallas/raster.py docstring) — expect zero in practice.

Usage: python tools/check_raster_kernel.py [--size HxW]
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

    import realism_effects_tpu as re_tpu
    from realism_effects_tpu.ops.pallas import raster as kmod
    from realism_effects_tpu.scene import rasterizer as rz

    h, w = 1080, 1920
    if "--size" in sys.argv:
        h, w = map(int, sys.argv[sys.argv.index("--size") + 1].split("x"))

    scene = re_tpu.Scene()
    scene.add(re_tpu.make_plane(20, re_tpu.Material(
        diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(re_tpu.make_box((1, 1, 1), re_tpu.Material(
        diffuse=(0.9, 0.3, 0.2, 1.0))))
    box.set_matrix(re_tpu.translation(0, 0.5, 0))
    sph = scene.add(re_tpu.make_sphere(0.6, material=re_tpu.Material(
        diffuse=(0.2, 0.5, 0.9, 1.0))))
    sph.set_matrix(re_tpu.translation(1.5, 0.6, 0.5))
    packed = jax.device_put(scene.pack())
    mm = jax.device_put(scene.model_matrices())

    cams = []
    cam = re_tpu.PerspectiveCamera(50, w / h, 0.1, 100)
    cam.set_position(3, 2.5, 4)
    cam.look_at((0, 0.5, 0))
    cams.append(("bench", cam.matrices().projection_view_matrix))
    cam.set_position(0.2, 0.4, 0.2)   # inside the geometry (clipless)
    cam.look_at((2, 0.5, 1))
    cams.append(("inside", cam.matrices().projection_view_matrix))

    def vis(pk, m, p, force_scan: bool):
        world_pos, _ = rz._world_transform(pk, m)
        clip = rz._clip_positions(world_pos, p)
        if force_scan:
            orig = kmod._MAX_TRIS
            kmod._MAX_TRIS = -1          # gate the kernel off
            try:
                return rz._visibility(clip, pk.faces, h, w)
            finally:
                kmod._MAX_TRIS = orig
        return rz._visibility(clip, pk.faces, h, w)

    for name, pv in cams:
        pv = jax.device_put(pv)
        jk = jax.jit(lambda pk, m, p: vis(pk, m, p, False))
        js = jax.jit(lambda pk, m, p: vis(pk, m, p, True))
        ids_k, d_k = jk(packed, mm, pv)
        _ = float(jnp.max(d_k))
        ids_s, d_s = js(packed, mm, pv)
        _ = float(jnp.max(d_s))
        ids_k, d_k, ids_s, d_s = map(np.asarray, (ids_k, d_k, ids_s, d_s))
        flips = int((ids_k != ids_s).sum())
        derr = float(np.abs(d_k - d_s).max())
        print(f"[{name}] winner flips: {flips} / {h*w}  "
              f"max |depth diff|: {derr:.2e}")

        def timeit(fn):
            best = np.inf
            for _b in range(3):
                t0 = time.perf_counter()
                o = None
                for _ in range(8):
                    o = fn(packed, mm, pv)
                _ = float(jnp.max(o[1]))
                best = min(best, (time.perf_counter() - t0) * 125.0)
            return best

        print(f"[{name}] kernel {timeit(jk):7.2f} ms   "
              f"scan {timeit(js):7.2f} ms")


if __name__ == "__main__":
    main()
