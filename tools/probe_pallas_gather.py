"""Probe which in-kernel dynamic-indexing forms Mosaic/TPU supports.

Tries several candidate lowerings for "each pixel reads table[idx]"
inside a Pallas TPU kernel and reports compile + run + correctness for
each. Used to pick the env-fetch strategy (gathers are priced ~10ns per
index in XLA; an in-VMEM gather at VPU rate would be ~100x cheaper).

Usage: python tools/probe_pallas_gather.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, K = 256, 512, 2048


def probe(name, build):
    try:
        fn = build()
        out = jax.jit(fn)(TABLE, IDX)
        out = np.asarray(out)
        ref = np.asarray(TABLE)[np.asarray(IDX)]
        err = np.abs(out - ref).max()
        print(f"{name:28s} OK   max|err|={err:.2e}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        print(f"{name:28s} FAIL {msg}")


def k_take(table_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take(table_ref[...], idx_ref[...], axis=0)


def k_take_along(table_ref, idx_ref, out_ref):
    # broadcast table rows across sublanes? 1-D table in lanes:
    t = table_ref[...]  # (1, K)
    idx = idx_ref[...]  # (8, 128) block of indices
    out_ref[...] = jnp.take_along_axis(
        jnp.broadcast_to(t, (idx.shape[0], t.shape[1])),
        idx, axis=1, mode="clip"
    )


def k_dyn_gather(table_ref, idx_ref, out_ref):
    out_ref[...] = pltpu.dynamic_gather(
        jnp.broadcast_to(table_ref[...], idx_ref.shape + ()),
        idx_ref[...], 1)


def make(kernel, bh=8, bw=128):
    def fn(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(H // bh, W // bw),
            in_specs=[
                pl.BlockSpec((1, K), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        )(table.reshape(1, K), idx)
    return fn


def main():
    global TABLE, IDX
    rng = np.random.default_rng(0)
    TABLE = jnp.asarray(rng.standard_normal(K), jnp.float32)
    IDX = jnp.asarray(rng.integers(0, K, (H, W)), jnp.int32)

    probe("jnp.take(axis=0)", lambda: make(k_take))
    probe("take_along_axis(axis=1)", lambda: make(k_take_along))
    if hasattr(pltpu, "dynamic_gather"):
        probe("pltpu.dynamic_gather", lambda: make(k_dyn_gather))
    else:
        print(f"pltpu.dynamic_gather           ABSENT "
              f"({[n for n in dir(pltpu) if 'gather' in n.lower()]})")


if __name__ == "__main__":
    main()
