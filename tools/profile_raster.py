"""Piece-profile the raster+shade stage on the real TPU (fresh process).

BENCH_r04 showed raster+shade = 66.6 ms at 1080p for a 3-mesh scene —
not triangle-bound. This times the parts independently with pre-staged
device args and amortized readback-synced timing (CLAUDE.md rules 2/8):
the z-scan visibility loop, the per-face record fetch, texture/atlas
sampling, shade_direct, and the env background, for both rasterize
passes (G-buffer + velocity).

Usage: python tools/profile_raster.py [--cpu] [--size HxW] [--sponza]
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
    from realism_effects_tpu.scene import rasterizer as rz
    from realism_effects_tpu.scene.shading import shade_direct

    scene = re_tpu.Scene()
    scene.environment = re_tpu.build_equirect_env(
        re_tpu.procedural_sky(64, 128))
    if "--sponza" in sys.argv:
        from realism_effects_tpu.scene.gltf import load_gltf_asset
        asset = load_gltf_asset(
            "/root/reference/example/public/gltf/"
            "sponza_no_textures.optimized.glb")
        for m in asset.meshes:
            scene.add(m)
        cam = re_tpu.PerspectiveCamera(55, w / h, 0.05, 400)
        cam.set_position(8.0, 2.2, -0.5)
        cam.look_at((-6.0, 3.0, 0.0))
    else:
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

    packed = jax.device_put(scene.pack())
    mm = jax.device_put(scene.model_matrices())
    cams = cam.matrices()
    lighting = scene.lighting_params()
    env = scene.environment
    pv = jax.device_put(cams.projection_view_matrix)
    print(f"faces: {packed.faces.shape[0]}", file=sys.stderr)

    # warmup readback (enters synchronous mode; first is slow — expected)
    warm = rz.rasterize_gbuffer(packed, mm, pv, h, w)
    print("warmup readback:", float(jnp.max(warm.depth)), file=sys.stderr)

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
        print(f"{name:40s} {best:8.2f} ms")
        return best

    # 1. the full stage as the composer runs it
    def full_stage(pk, m, p):
        gb = rz.rasterize_gbuffer(pk, m, p, h, w)
        velb = rz.rasterize_velocity(pk, m, m, p, p, h, w)
        color = shade_direct(gb, cams, lighting, env)
        return gb, velb, color

    timeit("raster_stage (gbuf+vel+shade)", full_stage, packed, mm, pv)

    # 2. each pass alone
    timeit("rasterize_gbuffer", lambda pk, m, p: rz.rasterize_gbuffer(
        pk, m, p, h, w), packed, mm, pv)
    timeit("rasterize_velocity", lambda pk, m, p: rz.rasterize_velocity(
        pk, m, m, p, p, h, w), packed, mm, pv)

    gb_dev = jax.jit(
        lambda pk, m, p: rz.rasterize_gbuffer(pk, m, p, h, w)
    )(packed, mm, pv)
    _ = float(jnp.max(gb_dev.depth))
    timeit("shade_direct (with env bg)",
           lambda g: shade_direct(g, cams, lighting, env), gb_dev)
    timeit("shade_direct (no env)",
           lambda g: shade_direct(g, cams, lighting, None), gb_dev)

    # 3. inside rasterize_gbuffer: visibility z-scan vs attribute fetch
    def vis_only(pk, m, p):
        world_pos, _ = rz._world_transform(pk, m)
        clip = rz._clip_positions(world_pos, p)
        ids, depth01 = rz._visibility(clip, pk.faces, h, w)
        return ids, depth01

    timeit("  visibility z-scan (gbuffer)", vis_only, packed, mm, pv)

    ids_dev, depth_dev = jax.jit(vis_only)(packed, mm, pv)
    _ = float(jnp.max(depth_dev))

    def attr_fetch(pk, m, p, ids):
        world_pos, world_nrm = rz._world_transform(pk, m)
        clip = rz._clip_positions(world_pos, p)
        edge9 = rz._face_edge_coeffs(clip, pk.faces, h, w)
        face_mesh = pk.vert_mesh_id[pk.faces[:, 0]]
        cols = [
            rz._face_attr_coeffs(edge9, world_nrm[pk.faces]),
            rz._face_denominator(edge9),
            face_mesh.astype(jnp.float32),
            pk.materials[face_mesh],
        ]
        rec = rz._fetch_face_table(rz._pack_face_table(cols), ids)
        den = rz._eval_planes(rec[..., 9:12], h, w)[..., 0]
        nrm = rz._eval_planes(rec[..., 0:9], h, w) / jnp.where(
            jnp.abs(den) > 1e-20, den, 1e-20)[..., None]
        return nrm

    timeit("  face-record fetch + planes", attr_fetch,
           packed, mm, pv, ids_dev)

    # 4. scan-granularity probe: one z-scan chunk step's work, times
    # n_chunks (what the scan costs if per-step overhead were zero)
    F = packed.faces.shape[0]
    n_chunks = -(-F // rz._CHUNK)
    print(f"  (z-scan: {n_chunks} chunk steps of {rz._CHUNK} tris)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
