"""Time the Poisson denoise fused kernel vs the jnp path on the TPU.

Usage: python tools/profile_poisson.py [--cpu] [--size HxW]
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

    from realism_effects_tpu.core.framebuffers import GBuffer
    from realism_effects_tpu.ops import poisson_denoise as pd
    from realism_effects_tpu.ops.pallas import poisson as fused

    print("backend:", jax.default_backend(), file=sys.stderr)
    print("fused supported:",
          fused.fused_pass_supported(pd.PoissonDenoiseConfig(), 2, h, w),
          file=sys.stderr)

    rng = np.random.default_rng(0)
    depth = np.clip(0.8 + 0.1 * rng.random((h, w)), 0, 1)
    nrm = rng.uniform(-1, 1, (h, w, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    gb = GBuffer(
        diffuse=jnp.zeros((h, w, 4), jnp.float32),
        normal=jax.device_put(jnp.asarray(nrm, jnp.float32)),
        roughness=jax.device_put(jnp.asarray(rng.random((h, w)), jnp.float32)),
        metalness=jnp.zeros((h, w), jnp.float32),
        emissive=jnp.zeros((h, w, 3), jnp.float32),
        depth=jax.device_put(jnp.asarray(depth, jnp.float32)),
    )
    texs = [
        jax.device_put(jnp.asarray(rng.random((h, w, 4)), jnp.float32))
        for _ in range(2)
    ]
    frame = jnp.int32(7)
    print("warmup readback:", float(jnp.max(gb.depth)), file=sys.stderr)

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
        print(f"{name:44s} {best:8.2f} ms")
        return best

    cfg2 = pd.PoissonDenoiseConfig(is_specular=(False, True), iterations=1)

    def run2(t0, t1, f, use_fused):
        old = fused.USE_FUSED_PASS
        fused.USE_FUSED_PASS = use_fused
        try:
            return tuple(pd.poisson_denoise([t0, t1], gb, f, cfg2))
        finally:
            fused.USE_FUSED_PASS = old

    timeit("poisson 2-tex 2-pass FUSED",
           lambda a, b, f: run2(a, b, f, True), texs[0], texs[1], frame)
    timeit("poisson 2-tex 2-pass jnp+dense",
           lambda a, b, f: run2(a, b, f, False), texs[0], texs[1], frame)

    cfg1 = pd.PoissonDenoiseConfig(is_specular=(False,), iterations=1)
    ao = jnp.clip(gb.depth * 0.9, 0.0, 1.0)

    def run_ao(a, n, f, use_fused):
        old = fused.USE_FUSED_PASS
        fused.USE_FUSED_PASS = use_fused
        try:
            return pd.poisson_denoise_ao(a, n, gb, f, cfg1)
        finally:
            fused.USE_FUSED_PASS = old

    timeit("poisson AO 2-pass FUSED",
           lambda a, n, f: run_ao(a, n, f, True), ao, gb.normal, frame)
    timeit("poisson AO 2-pass jnp+dense",
           lambda a, n, f: run_ao(a, n, f, False), ao, gb.normal, frame)


if __name__ == "__main__":
    main()
