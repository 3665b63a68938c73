"""Cost-model probe for the window-warp kernels on the real TPU.

Measures window_warp / window_warp_multi at 1080p across (ky, n, c,
mode) to find the scaling law (per-candidate-row vertical select is the
expected dominant term) and the within-vreg take_along_axis throughput
ceiling. Informs which restructuring actually pays (smaller ky, shared
slabs, fewer channels, hierarchical select).

Usage: python tools/probe_warp_cost.py
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

    from realism_effects_tpu.ops.pallas.warp import (
        window_warp, window_warp_multi,
    )

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    tex1 = jnp.asarray(rng.standard_normal((h, w)), jnp.float32)
    tex4 = jnp.asarray(rng.standard_normal((h, w, 4)), jnp.float32)
    # targets: small displacements (typical reprojection)
    ty = jnp.asarray(
        np.clip(np.arange(h)[:, None] + rng.integers(-6, 7, (h, w)), 0, h - 1),
        jnp.int32) * jnp.ones((h, w), jnp.int32)
    tx = jnp.asarray(
        np.clip(np.arange(w)[None, :] + rng.integers(-6, 7, (h, w)), 0, w - 1),
        jnp.int32)
    fy = jnp.asarray(rng.random((h, w)), jnp.float32)

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

    for ky in (4, 8, 16, 32):
        timeit(f"nearest c=1 ky={ky}", lambda t=tex1, k=ky: window_warp(
            t, ty, tx, ky=k, mode="nearest")[0])
    for ky in (8, 32):
        timeit(f"nearest c=4 ky={ky}", lambda t=tex4, k=ky: window_warp(
            t, ty, tx, ky=k, mode="nearest")[0])
    for ky in (8,):
        timeit(f"bilinear c=4 ky={ky}", lambda t=tex4, k=ky: window_warp(
            t, ty, tx, fy=fy, fx=fy, ky=k, mode="bilinear")[0])
        timeit(f"catrom5 c=4 ky={ky}", lambda t=tex4, k=ky: window_warp(
            t, ty, tx, fy=fy, fx=fy, ky=k, mode="catrom5")[0])
    tyn = jnp.stack([ty] * 8, 0)
    txn = jnp.stack([tx] * 8, 0)
    for ky in (8, 16, 32):
        timeit(f"multi n=8 c=1 ky={ky}", lambda k=ky: window_warp_multi(
            tex1, tyn, txn, ky=k)[0])
    timeit("multi n=2 c=1 ky=32", lambda: window_warp_multi(
        tex1, tyn[:2], txn[:2], ky=32)[0])


if __name__ == "__main__":
    main()
