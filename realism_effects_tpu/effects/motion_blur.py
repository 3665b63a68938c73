"""Per-object motion blur (kernel K12).

TPU port of `/root/reference/src/motion-blur/MotionBlurEffect.js` +
`shader/motion_blur.frag`: a ``samples``-tap jittered line integral along
the per-pixel velocity, frame-rate normalized by ``frameSpeed =
(1/100)/deltaTime``, blue-noise jittered start/end UVs.
"""

from __future__ import annotations

from ..ops import motion_blur as _op
from .base import Effect


class MotionBlurEffect(Effect):
    name = "motion_blur"

    def __init__(self, intensity: float = 1.0, jitter: float = 1.0,
                 samples: int = 16):
        self.intensity = intensity
        self.jitter = jitter
        self.samples = int(samples)
        self.delta_time = 1.0 / 60.0

    def static_key(self):
        return (self.samples,)

    def host_update(self, composer):
        # measured per-frame dt, already clamped to >= 1 ms by the
        # composer — the reference's `max(1/1000, deltaTime)`
        # (`MotionBlurEffect.js:87-89`)
        self.delta_time = composer.delta_time

    def uniforms(self):
        return {
            "intensity": float(self.intensity),
            "jitter": float(self.jitter),
            "delta_time": float(self.delta_time),
        }

    def apply(self, ctx, color, state):
        u = ctx.params[self.name]
        out = _op.motion_blur(
            color, ctx.velocity.velocity, ctx.frame_index,
            intensity=u["intensity"], jitter=u["jitter"],
            delta_time=u["delta_time"], samples=self.samples,
        )
        return out, state
