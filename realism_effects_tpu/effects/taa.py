"""TAA: simple accumulative anti-aliasing for static cameras.

TPU port of `/root/reference/src/taa/TAAPass.js` + `taa.frag` (K10): while
the camera is still, blend the (jittered) frame into a running average
``mix(acc, color, 1/(n+1))``; any camera motion resets accumulation.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Effect


class TAAPass(Effect):
    name = "taa"
    needs_jitter = True

    def init_state(self, height, width):
        return {"accumulated": jnp.zeros((height, width, 3), jnp.float32)}

    def apply(self, ctx, color, state):
        g = ctx.params["__global__"]
        n = g["camera_not_moved_frames"]
        acc = state["accumulated"]
        # taa.frag:9-16: first still-frame (n==0) shows the raw input
        out = jnp.where(
            n == 0.0, color, acc + (color - acc) * (1.0 / (n + 1.0))
        )
        return out, {"accumulated": out}
