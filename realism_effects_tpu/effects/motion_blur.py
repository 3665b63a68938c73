"""Per-object motion blur (kernel K12).

TPU port of `/root/reference/src/motion-blur/MotionBlurEffect.js` +
`shader/motion_blur.frag`: a ``samples``-tap jittered line integral along
the per-pixel velocity, frame-rate normalized by ``frameSpeed =
(1/100)/deltaTime``, blue-noise jittered start/end UVs.

``mode`` picks the discretization of that integral (static option →
retrace on change):

* ``"taps"`` — the reference's per-pixel bilinear taps
  (`ops/motion_blur.motion_blur`).  Each tap is a priced full-res
  gather on the target TPU: ~550 ms at 1080p for the default 16
  samples — the single most expensive stage of the flagship frame.
* ``"sweep"`` — the TPU-native direction-binned roll sweep
  (`ops/motion_blur.motion_blur_sweep`): zero per-pixel gathers, every
  tap a whole-frame bulk copy shared by all pixels in a direction bin.
"""

from __future__ import annotations

from ..ops import motion_blur as _op
from .base import Effect


class MotionBlurEffect(Effect):
    name = "motion_blur"

    #: ``mode`` default is "sweep" — the TPU-native direction-binned roll
    #: integral (gather-free; the configuration every benched number
    #: describes). "taps" is the reference's exact jittered per-pixel
    #: gather integral (`motion_blur.frag:23-42`), kept for the parity
    #: fixtures (each executed full-res gather costs ~14-19 ms at 1080p
    #: on the target TPU, CLAUDE.md rule 2b).
    def __init__(self, intensity: float = 1.0, jitter: float = 1.0,
                 samples: int = 16, mode: str = "sweep",
                 sweep_dirs: int = 16, sweep_steps: int = 12):
        if mode not in ("taps", "sweep"):
            raise ValueError("mode must be 'taps' or 'sweep'")
        self.intensity = intensity
        self.jitter = jitter
        self.samples = int(samples)
        self.mode = mode
        self.sweep_dirs = int(sweep_dirs)
        self.sweep_steps = int(sweep_steps)
        self.delta_time = 1.0 / 60.0

    def static_key(self):
        return (self.samples, self.mode, self.sweep_dirs, self.sweep_steps)

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
        if self.mode == "sweep":
            out = _op.motion_blur_sweep(
                color, ctx.velocity.velocity, ctx.frame_index,
                intensity=u["intensity"], jitter=u["jitter"],
                delta_time=u["delta_time"], dirs=self.sweep_dirs,
                steps=self.sweep_steps,
            )
        else:
            out = _op.motion_blur(
                color, ctx.velocity.velocity, ctx.frame_index,
                intensity=u["intensity"], jitter=u["jitter"],
                delta_time=u["delta_time"], samples=self.samples,
            )
        return out, state
