"""TRAA: temporal-reprojection anti-aliasing.

TPU port of `/root/reference/src/traa/TRAAEffect.js`: jitter the camera
with the R2 sequence (handled by the composer via ``needs_jitter``), feed
the frame color through the temporal reprojector with TRAA's option
overrides (`TRAAEffect.js:21-31`: maxBlend 0.9, neighborhood clamp on,
log transform, confidencePower 4), output the accumulated texture
(`traa_compose.frag` K11 is a passthrough).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.temporal_reproject import TemporalReprojectConfig, temporal_reproject
from .base import Effect


class TRAAEffect(Effect):
    name = "traa"
    needs_jitter = True

    def __init__(self, max_blend: float = 0.9,
                 neighborhood_clamp_intensity: float = 1.0,
                 confidence_power: float = 4.0,
                 log_transform: bool = True,
                 full_accumulate: bool = True):
        self.max_blend = max_blend
        self.neighborhood_clamp_intensity = neighborhood_clamp_intensity
        self.full_accumulate = full_accumulate
        self.cfg = TemporalReprojectConfig(
            texture_count=1,
            log_transform=log_transform,
            reproject_specular=(False,),
            neighborhood_clamp=(True,),
            confidence_power=confidence_power,
            input_type="diffuse",
        )

    def static_key(self):
        return (self.cfg, self.full_accumulate)

    def uniforms(self):
        return {
            "max_blend": float(self.max_blend),
            "neighborhood_clamp_intensity": float(self.neighborhood_clamp_intensity),
        }

    def init_state(self, height, width):
        return {"history": jnp.zeros((height, width, 4), jnp.float32)}

    def apply(self, ctx, color, state):
        u = ctx.params[self.name]
        g = ctx.params["__global__"]
        inp = jnp.concatenate(
            [color, jnp.ones_like(color[..., :1])], axis=-1
        )
        # fullAccumulate engages only while the camera is still
        # (`TemporalReprojectPass.js:178-183`)
        full_acc = jnp.logical_and(
            jnp.asarray(self.full_accumulate), ~g["camera_moved"]
        )
        (out,) = temporal_reproject(
            [inp], [state["history"]],
            ctx.velocity, ctx.last_velocity,
            ctx.unjittered_cam, ctx.prev_cam,
            self.cfg,
            max_blend=u["max_blend"],
            neighborhood_clamp_intensity=u["neighborhood_clamp_intensity"],
            full_accumulate=full_acc,
            keep_data=g["keep_data"],
        )
        return out[..., :3], {"history": out}
