"""Probe: full-width take_along_axis with group-local indices in Pallas.

The warp kernels gather horizontally with jnp.take_along_axis on
(br, 128) lane groups. A VMEM-resident redesign wants the same gather on
full-width (br, W) blocks with indices guaranteed to stay inside each
lane's own 128-group (plus +-128-lane pltpu.roll to bring neighbor
groups in). This probes whether Mosaic lowers that form, and times it.

Usage: python tools/probe_fullwidth_ta.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BR, W, BC = 64, 1920, 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.standard_normal((BR, W)), jnp.float32)
    # global targets within +-100 columns
    cc = np.arange(W)[None, :] * np.ones((BR, 1), int)
    ta = np.clip(cc + rng.integers(-100, 101, (BR, W)), 0, W - 1)
    ta = jnp.asarray(ta, jnp.int32)

    def kernel(tex_ref, ta_ref, out_ref):
        x = tex_ref[...]
        t = ta_ref[...]
        jj = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 1)
        q = t // BC - jj // BC          # group delta in {-1, 0, 1}
        gidx = (jj // BC) * BC + t % BC  # own-group base + target lane
        out = jnp.zeros((BR, W), jnp.float32)
        for d in (-1, 0, 1):
            sh = pltpu.roll(x, (-d * BC) % W, axis=1) if d else x
            g = jnp.take_along_axis(sh, gidx, axis=1)
            out = jnp.where(q == d, g, out)
        out_ref[...] = out

    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BR, W), jnp.float32),
    )

    try:
        out = jax.jit(fn)(tex, ta)
        ref = np.asarray(tex)[np.arange(BR)[:, None], np.asarray(ta)]
        err = np.abs(np.asarray(out) - ref).max()
        print(f"full-width take_along: OK  max|err|={err:.2e}")
    except Exception as e:  # noqa: BLE001
        print("full-width take_along: FAIL", str(e).split("\n")[0][:200])
        return

    # timing: 100 sequential gathers over a (1080, 1920) image worth of
    # work, amortized
    H = 1080
    tex_b = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    cc = np.arange(W)[None, :] * np.ones((H, 1), int)
    ta_b = jnp.asarray(
        np.clip(cc + rng.integers(-100, 101, (H, W)), 0, W - 1), jnp.int32)

    def kernel_n(tex_ref, ta_ref, out_ref, *, reps):
        x = tex_ref[...]
        t = ta_ref[...]
        jj = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        q = t // BC - jj // BC
        gidx = (jj // BC) * BC + t % BC
        acc = jnp.zeros(x.shape, jnp.float32)
        for _ in range(reps):
            out = jnp.zeros(x.shape, jnp.float32)
            for d in (-1, 0, 1):
                sh = pltpu.roll(x, (-d * BC) % W, axis=1) if d else x
                g = jnp.take_along_axis(sh, gidx, axis=1)
                out = jnp.where(q == d, g, out)
            acc = acc + out
            x = x + 1e-9  # defeat CSE
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
        out = jfn(tex_b, ta_b)
        _ = float(jnp.max(out))
        best = np.inf
        for _b in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = jfn(tex_b, ta_b)
            _ = float(jnp.max(out))
            best = min(best, (time.perf_counter() - t0) * 1000.0 / 8)
        print(f"1080p full-width 3-roll gather x{reps:3d}: {best:8.3f} ms"
              f"  ({best / reps:6.3f} ms per gather)")


if __name__ == "__main__":
    main()
