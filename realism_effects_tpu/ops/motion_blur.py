"""Motion-blur line-integral kernel (K12).

`/root/reference/src/motion-blur/shader/motion_blur.frag`: early-out when
static (as a mask), blue-noise jittered start/end UVs centered on the
pixel (per John Chapman's per-object motion blur), ``samples + 1`` taps
averaged with the center color counted twice (`:35-42`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math3d import mix, uv_grid
from ..core.rng import blue_noise_image
from ..core.sampling import sample_bilinear


def motion_blur(color: jnp.ndarray, velocity: jnp.ndarray, frame,
                intensity=1.0, jitter=1.0, delta_time=1.0 / 60.0,
                samples: int = 16) -> jnp.ndarray:
    h, w = color.shape[:2]
    uv = uv_grid(h, w)

    vel = velocity * intensity
    did_move = jnp.sum(velocity * velocity, axis=-1) > 1e-9

    noise = blue_noise_image(h, w, frame)
    jitter_offset = jitter * vel * noise[..., :2]
    frame_speed = (1.0 / 100.0) / delta_time

    start_uv = jnp.maximum(uv + (jitter_offset - vel * 0.5) * frame_speed, 0.0)
    end_uv = jnp.minimum(uv + (jitter_offset + vel * 0.5) * frame_speed, 1.0)

    acc = color
    samples_f = float(samples)
    for i in range(samples + 1):
        t = i / samples_f
        tap_uv = mix(start_uv, end_uv, t)
        # inputTexture is the composer's HalfFloat framebuffer
        # (`example/main.js` frameBufferType): half quad-packed taps
        acc = acc + sample_bilinear(color, tap_uv, half=True)
    blurred = acc / (samples_f + 2.0)

    return jnp.where(did_move[..., None], blurred, color)
