"""Numpy transliteration parity fixtures for the finishing effects.

Inline shaders of `SharpnessEffect.js:4-31`,
`LensDistortionEffect.js:14-45`, `GradualBackgroundEffect.js:31-45` and
`SparkleEffect.js:5-92`, hand-ported and asserted against the Effect
implementations through a minimal FrameContext.
"""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.composer import FrameContext
from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.core.framebuffers import GBuffer, VelocityBuffer
from realism_effects_tpu.effects.finishing import (
    GradualBackgroundEffect, LensDistortionEffect, SharpnessEffect,
    SparkleEffect,
)

from test_ao_parity import np_bilinear

H = W = 32


def _ctx(effect, uniforms, gb=None, vel=None, cam=None):
    cam = cam or PerspectiveCamera(50, 1, 0.1, 60)
    m = cam.matrices()
    return FrameContext(
        gbuffer=gb, velocity=vel, last_velocity=vel,
        scene_color=None, cam=m, unjittered_cam=m, prev_cam=m,
        frame_index=jnp.int32(0),
        params={effect.name: {k: jnp.float32(v) for k, v in uniforms.items()},
                "__global__": {}},
        env=None,
    )


class TestSharpnessParity:
    def test_matches_shader(self):
        rng = np.random.default_rng(0)
        color = rng.uniform(size=(H, W, 3))
        s = 1.7
        pad = np.pad(color, ((1, 1), (1, 1), (0, 0)), mode="edge")
        blurred = np.zeros_like(color)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                blurred += pad[1 + dy: 1 + dy + H, 1 + dx: 1 + dx + W]
        blurred /= 9.0
        expected = np.maximum(color + (color - blurred) * s, 0.0)

        eff = SharpnessEffect(sharpness=s)
        out, _ = eff.apply(_ctx(eff, {"sharpness": s}),
                           jnp.asarray(color, jnp.float32), {})
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)


class TestLensDistortionParity:
    def test_matches_shader(self):
        rng = np.random.default_rng(1)
        color = rng.uniform(size=(H, W, 3))
        ax, ay, ab = -0.07, -0.04, 1.5
        ys, xs = np.mgrid[0:H, 0:W]
        u = (xs + 0.5) / W
        v = (ys + 0.5) / H
        x = 2 * u - 1
        y = 2 * v - 1
        r = x * x + y * y
        x3 = x / (1 - ax * r)
        y3 = y / (1 - ay * r)
        r3 = x3 * x3 + y3 * y3
        x2 = x / (1 - ax * r3)
        y2 = y / (1 - ay * r3)
        duv = np.stack([(x2 + 1) * 0.5, (y2 + 1) * 0.5], -1)
        r_off = np.array([1 / W, 0.0])
        g_off = np.array([0.0, 1 / H])
        b_off = np.array([1 / W, 1 / H])
        expected = np.stack([
            np_bilinear(color, duv - ab * r_off)[..., 0],
            np_bilinear(color, duv - ab * g_off)[..., 1],
            np_bilinear(color, duv - ab * b_off)[..., 2],
        ], -1)

        eff = LensDistortionEffect(alpha_x=ax, alpha_y=ay, aberration=ab)
        out, _ = eff.apply(
            _ctx(eff, {"alpha_x": ax, "alpha_y": ay, "aberration": ab}),
            jnp.asarray(color, jnp.float32), {})
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)


class TestGradualBackgroundParity:
    def test_matches_shader(self):
        rng = np.random.default_rng(2)
        color = rng.uniform(size=(H, W, 3))
        depth = rng.uniform(0.3, 1.0, size=(H, W))
        cam = PerspectiveCamera(50, 1, 0.1, 60)
        cam.set_position(1, 2, 4)
        cam.look_at((0, 0, 0))
        m = cam.matrices()
        bg = (0.1, 0.2, 0.3)
        max_d = 5.0

        # shader: screen->world, distToCenter, fade
        ys, xs = np.mgrid[0:H, 0:W]
        uv = np.stack([(xs + 0.5) / W, (ys + 0.5) / H], -1)
        ndc = np.stack([uv[..., 0] * 2 - 1, uv[..., 1] * 2 - 1,
                        depth * 2 - 1, np.ones_like(depth)], -1)
        Pinv = np.asarray(m.projection_matrix_inverse, np.float64)
        Cw = np.asarray(m.camera_matrix_world, np.float64)
        clip = np.einsum("ij,...j->...i", Pinv, ndc)
        clip /= clip[..., 3:4]
        world = np.einsum("ij,...j->...i", Cw, clip)[..., :3]
        dist = np.linalg.norm(world[..., [0, 2]], axis=-1) \
            + np.maximum(0.0, -world[..., 1])
        fade = np.clip(np.maximum(dist, 1e-6) ** 0.1 * 15.0 - max_d, 0, 1)
        expected = color + (np.asarray(bg) - color) * fade[..., None]

        gb = GBuffer(
            diffuse=jnp.zeros((H, W, 4), jnp.float32),
            normal=jnp.zeros((H, W, 3), jnp.float32),
            roughness=jnp.ones((H, W), jnp.float32),
            metalness=jnp.zeros((H, W), jnp.float32),
            emissive=jnp.zeros((H, W, 3), jnp.float32),
            depth=jnp.asarray(depth, jnp.float32),
        )
        eff = GradualBackgroundEffect(background_color=bg, max_distance=max_d)
        out, _ = eff.apply(_ctx(eff, {"max_distance": max_d}, gb=gb, cam=cam),
                           jnp.asarray(color, jnp.float32), {})
        np.testing.assert_allclose(np.asarray(out), expected, atol=5e-5)


class TestSparkleParity:
    def test_matches_shader(self):
        rng = np.random.default_rng(3)
        color = rng.uniform(0.0, 1.5, size=(H, W, 3))
        nrm = rng.uniform(-1, 1, size=(H, W, 3))
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        depth = rng.uniform(0.3, 0.95, size=(H, W))
        depth[:2] = 1.0  # sky band (passthrough)
        cam = PerspectiveCamera(50, 1, 0.1, 60)
        cam.set_position(1.5, 2.5, 4)
        cam.look_at((0, 0.5, 0))
        m = cam.matrices()
        spread, intensity = 1.0, 2.0

        near, far = 0.1, 60.0
        ys, xs = np.mgrid[0:H, 0:W]
        uv = np.stack([(xs + 0.5) / W, (ys + 0.5) / H], -1)
        P = np.asarray(m.projection_matrix, np.float64)
        Pinv = np.asarray(m.projection_matrix_inverse, np.float64)
        Vm = np.asarray(m.view_matrix, np.float64)
        Cw = np.asarray(m.camera_matrix_world, np.float64)

        view_normal = np.einsum("ij,...j->...i", Vm[:3, :3], nrm)
        view_normal /= np.linalg.norm(view_normal, axis=-1, keepdims=True)
        view_z = (near * far) / ((far - near) * depth - far)
        clip_w = P[3, 2] * view_z + P[3, 3]
        clip = np.stack([uv[..., 0] * 2 - 1, uv[..., 1] * 2 - 1,
                         view_z * 2 - 1, np.ones_like(view_z)], -1) \
            * clip_w[..., None]
        vp = np.einsum("ij,...j->...i", Pinv, clip)[..., :3]
        vp[..., 2] = view_z
        view_dir = vp / np.linalg.norm(vp, axis=-1, keepdims=True)
        world = np.einsum("ij,...j->...i", Cw, np.concatenate(
            [vp, np.ones_like(vp[..., :1])], -1))[..., :3]
        cam_pos = Cw[:3, 3]
        dist = np.linalg.norm(world - cam_pos, axis=-1)
        dist_factor = np.exp(-dist * 0.005)
        facing = np.maximum(np.sum(-view_dir * view_normal, -1), 0.0) ** 4

        wn = world / np.linalg.norm(world, axis=-1, keepdims=True)
        offset = wn[..., [0, 2]] * 1000.0 + nrm[..., [0, 2]] * 500.0
        rand = lambda n: np.mod(
            np.sin(n[..., 0] * 12.9898 + n[..., 1] * 78.233) * 43758.5453, 1.0)
        b = np.floor(offset)
        fr = offset - b
        t = np.clip(fr, 0, 1)
        f = t * t * (3 - 2 * t)
        mx = lambda a, c, t_: a + (c - a) * t_
        noise = mx(mx(rand(b), rand(b + [1.0, 0.0]), f[..., 0]),
                   mx(rand(b + [0.0, 1.0]), rand(b + [1.0, 1.0]), f[..., 0]),
                   f[..., 1])
        noise = np.maximum(noise, 0.0) ** (500.0 * spread)
        lum = color[..., 0] * 0.299 + color[..., 1] * 0.587 + color[..., 2] * 0.114
        tl = np.clip((lum - 0.15) / (1.0 - 0.15), 0, 1)
        lum = tl * tl * (3 - 2 * tl)
        sparkle = noise * lum * facing * dist_factor * 5000.0 * intensity
        out_np = color + np.maximum(color, 0.0) ** 4 * sparkle[..., None]
        keep = (depth <= 0.0) | (depth >= 1.0) | (world[..., 1] < 0.01)
        expected = np.where(keep[..., None], color, out_np)

        vel = VelocityBuffer(
            velocity=jnp.zeros((H, W, 2), jnp.float32),
            normal=jnp.asarray(nrm, jnp.float32),
            depth=jnp.asarray(depth, jnp.float32),
        )
        eff = SparkleEffect(spread=spread, intensity=intensity)
        out, _ = eff.apply(
            _ctx(eff, {"spread": spread, "intensity": intensity},
                 vel=vel, cam=cam),
            jnp.asarray(color, jnp.float32), {})
        d = np.abs(np.asarray(out) - expected)
        # the 500-power noise and trig hash are extremely f32-sensitive;
        # pin the bulk and bound outliers
        assert np.quantile(d, 0.99) < 1e-3, float(np.quantile(d, 0.99))
        assert (d.max(-1) > 0.05).mean() < 0.02
