"""Probe: per-group take_along_axis on full-width VMEM blocks.

Variant of probe_fullwidth_ta: the kernel loops over 128-lane groups
with static slices and does the 3-group take_along gather per group.
Times the per-gather cost at 1080p to validate the VMEM-resident warp
kernel design.

Usage: python tools/probe_group_ta.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BR, W, BC = 64, 1920, 128
H = 1080


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    tex_b = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    cc = np.arange(W)[None, :] * np.ones((H, 1), int)
    ta_b = jnp.asarray(
        np.clip(cc + rng.integers(-100, 101, (H, W)), 0, W - 1), jnp.int32)
    ng = W // BC

    def kernel_n(tex_ref, ta_ref, out_ref, *, reps):
        x = tex_ref[...]
        t = ta_ref[...]
        acc = jnp.zeros(x.shape, jnp.float32)
        for _ in range(reps):
            cols = []
            for g in range(ng):
                tg = t[:, g * BC:(g + 1) * BC]
                lr = tg % BC
                q = tg // BC - g
                out = None
                for d in (-1, 0, 1):
                    gg = min(max(g + d, 0), ng - 1)
                    grp = x[:, gg * BC:(gg + 1) * BC]
                    v = jnp.take_along_axis(grp, lr, axis=1)
                    out = v if out is None else jnp.where(q == d, v, out)
                cols.append(out)
            acc = acc + jnp.concatenate(cols, axis=1)
            x = x + 1e-9
        out_ref[...] = acc

    for reps in (1, 8, 32):
        fn = pl.pallas_call(
            functools.partial(kernel_n, reps=reps),
            grid=(H // BR,),
            in_specs=[
                pl.BlockSpec((BR, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BR, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        )
        jfn = jax.jit(fn)
        try:
            out = jfn(tex_b, ta_b)
        except Exception as e:  # noqa: BLE001
            print(f"x{reps}: FAIL", str(e).split(chr(10))[0][:160])
            return
        if reps == 1:
            ref = np.asarray(tex_b)[np.arange(H)[:, None], np.asarray(ta_b)]
            err = np.abs(np.asarray(out) - ref).max()
            print(f"correctness max|err|={err:.2e}")
        _ = float(jnp.max(out))
        best = np.inf
        for _b in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = jfn(tex_b, ta_b)
            _ = float(jnp.max(out))
            best = min(best, (time.perf_counter() - t0) * 1000.0 / 8)
        print(f"1080p group-sliced gather x{reps:3d}: {best:8.3f} ms"
              f"  ({best / reps:6.3f} ms per gather)")


if __name__ == "__main__":
    main()
