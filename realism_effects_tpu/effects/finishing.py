"""Finishing effects: sharpness, lens distortion, sparkle, gradual background.

TPU ports of the reference's small screen-space effects:
- `/root/reference/src/sharpness/SharpnessEffect.js` — 3x3 unsharp mask
- `/root/reference/src/lens-distortion/LensDistortionEffect.js` — radial
  distortion + RGB chromatic aberration
- `/root/reference/src/sparkle/SparkleEffect.js` — procedural glints from
  world pos/normal noise x luminance x facing
- `/root/reference/src/gradual-background/GradualBackgroundEffect.js` —
  distance-based fade to a background color

All pointwise / tiny-stencil: plain jnp, fused by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import math3d
from ..core.math3d import (
    mix, normalize, screen_to_world, smoothstep, transform_dir,
    uv_grid,
)
from ..core.sampling import sample_bilinear
from .base import Effect


class SharpnessEffect(Effect):
    """3x3 unsharp mask, clamped >= 0 (`SharpnessEffect.js:4-31`)."""

    name = "sharpness"

    def __init__(self, sharpness: float = 1.0):
        self.sharpness = sharpness

    def uniforms(self):
        return {"sharpness": float(self.sharpness)}

    #: Pallas row-block kernel on TPU; jnp shifted-slice fallback
    use_pallas = True

    def apply(self, ctx, color, state):
        s = ctx.params[self.name]["sharpness"]
        if self.use_pallas:
            from ..ops.pallas.stencil import sharpness_3x3

            return sharpness_3x3(color, s), state
        h, w = color.shape[:2]
        pad = jnp.pad(color, ((1, 1), (1, 1), (0, 0)), mode="edge")
        blurred = jnp.zeros_like(color)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                blurred = blurred + pad[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
        blurred = blurred / 9.0
        sharp = color + (color - blurred) * s
        return jnp.maximum(sharp, 0.0), state


class LensDistortionEffect(Effect):
    """Radial lens distortion + chromatic aberration
    (`LensDistortionEffect.js:14-45`)."""

    name = "lens_distortion"

    def __init__(self, alpha_x: float = -0.05, alpha_y: float = -0.05,
                 aberration: float = 1.0):
        self.alpha_x = alpha_x
        self.alpha_y = alpha_y
        self.aberration = aberration

    def uniforms(self):
        return {
            "alpha_x": float(self.alpha_x),
            "alpha_y": float(self.alpha_y),
            "aberration": float(self.aberration),
        }

    def apply(self, ctx, color, state):
        u = ctx.params[self.name]
        h, w = color.shape[:2]
        uv = uv_grid(h, w)
        x = 2.0 * uv[..., 0] - 1.0
        y = 2.0 * uv[..., 1] - 1.0
        r = x * x + y * y
        # reverse radial transform (two Newton-ish steps, `:16-26`)
        x3 = x / (1.0 - u["alpha_x"] * r)
        y3 = y / (1.0 - u["alpha_y"] * r)
        r3 = x3 * x3 + y3 * y3
        x2 = x / (1.0 - u["alpha_x"] * r3)
        y2 = y / (1.0 - u["alpha_y"] * r3)
        duv = jnp.stack([(x2 + 1.0) * 0.5, (y2 + 1.0) * 0.5], axis=-1)

        ab = u["aberration"]
        r_off = jnp.asarray([1.0 / w, 0.0])
        g_off = jnp.asarray([0.0, 1.0 / h])
        b_off = jnp.asarray([1.0 / w, 1.0 / h])
        rv = sample_bilinear(color, duv - ab * r_off)[..., 0]
        gv = sample_bilinear(color, duv - ab * g_off)[..., 1]
        bv = sample_bilinear(color, duv - ab * b_off)[..., 2]
        return jnp.stack([rv, gv, bv], axis=-1), state


def _rand2(n: jnp.ndarray) -> jnp.ndarray:
    """GLSL-style hash rand(vec2) used by the sparkle noise."""
    return jnp.mod(
        jnp.sin(n[..., 0] * 12.9898 + n[..., 1] * 78.233) * 43758.5453, 1.0
    )


class SparkleEffect(Effect):
    """Procedural sparkle glints (`SparkleEffect.js:44-92`)."""

    name = "sparkle"

    def __init__(self, spread: float = 1.0, intensity: float = 1.0):
        self.spread = spread
        self.intensity = intensity

    def uniforms(self):
        return {
            "spread": float(self.spread),
            "intensity": float(self.intensity),
        }

    def apply(self, ctx, color, state):
        u = ctx.params[self.name]
        cam = ctx.unjittered_cam
        vel = ctx.velocity
        h, w = color.shape[:2]
        uv = uv_grid(h, w)
        depth = vel.depth
        sky = (depth <= 0.0) | (depth >= 1.0)

        normal = vel.normal
        view_normal = normalize(transform_dir(cam.view_matrix, normal))
        world_pos = screen_to_world(
            uv, depth, cam.camera_matrix_world, cam.projection_matrix_inverse
        )
        low = world_pos[..., 1] < 0.01

        view_z = math3d.depth_to_view_z(depth, cam)
        view_pos = math3d.get_view_position(
            uv, view_z, cam.projection_matrix, cam.projection_matrix_inverse
        )
        view_dir = normalize(view_pos)

        dist = jnp.linalg.norm(world_pos - cam.position, axis=-1)
        dist_factor = jnp.exp(-dist * 0.005)

        facing = jnp.maximum(math3d.dot(-view_dir, view_normal), 0.0) ** 4.0

        offset = (
            normalize(world_pos)[..., [0, 2]] * 1000.0
            + normal[..., [0, 2]] * 500.0
        )
        # value-noise nn() (`:38-42`)
        b = jnp.floor(offset)
        f = smoothstep(0.0, 1.0, offset - b)
        d0 = _rand2(b)
        d1 = _rand2(b + jnp.asarray([1.0, 0.0]))
        d2 = _rand2(b + jnp.asarray([0.0, 1.0]))
        d3 = _rand2(b + jnp.asarray([1.0, 1.0]))
        noise = mix(mix(d0, d1, f[..., 0]), mix(d2, d3, f[..., 0]), f[..., 1])
        noise = jnp.maximum(noise, 0.0) ** (500.0 * u["spread"])

        # sparkle uses Rec.601 weights, unlike the other kernels
        # (`SparkleEffect.js:5`: dot(c, vec3(0.299, 0.587, 0.114)))
        lum = (color[..., 0] * 0.299 + color[..., 1] * 0.587
               + color[..., 2] * 0.114)
        lum = smoothstep(0.15, 1.0, lum)

        sparkle = noise * lum * facing * dist_factor * 5000.0 * u["intensity"]
        out = color + (jnp.maximum(color, 0.0) ** 4.0) * sparkle[..., None]
        keep = sky | low
        return jnp.where(keep[..., None], color, out), state


class GradualBackgroundEffect(Effect):
    """Distance-based fade to a background color
    (`GradualBackgroundEffect.js:31-45`)."""

    name = "gradual_background"

    def __init__(self, background_color=(0.0, 0.0, 0.0), max_distance: float = 5.0):
        self.background_color = tuple(background_color)
        self.max_distance = max_distance

    def uniforms(self):
        return {"max_distance": float(self.max_distance)}

    def static_key(self):
        return (self.background_color,)

    def apply(self, ctx, color, state):
        cam = ctx.unjittered_cam
        h, w = color.shape[:2]
        uv = uv_grid(h, w)
        depth = ctx.gbuffer.depth
        world_pos = screen_to_world(
            uv, depth, cam.camera_matrix_world, cam.projection_matrix_inverse
        )
        dist = jnp.linalg.norm(world_pos[..., [0, 2]], axis=-1) + jnp.maximum(
            0.0, -world_pos[..., 1]
        )
        fade = jnp.clip(
            jnp.maximum(dist, 1e-6) ** 0.1 * 15.0
            - ctx.params[self.name]["max_distance"],
            0.0, 1.0,
        )
        bg = jnp.broadcast_to(
            jnp.asarray(self.background_color, jnp.float32), color.shape
        )
        return mix(color, bg, fade[..., None]), state
