"""Pallas stencil kernels vs their jnp references (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.ops.pallas.stencil import (
    neighborhood_minmax, sharpness_3x3,
)


def _jnp_sharpness(color, s):
    h, w = color.shape[:2]
    pad = jnp.pad(color, ((1, 1), (1, 1), (0, 0)), mode="edge")
    blurred = jnp.zeros_like(color)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            blurred = blurred + pad[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
    blurred = blurred / 9.0
    return jnp.maximum(color + (color - blurred) * s, 0.0)


def _jnp_minmax(tex, radius):
    h, w = tex.shape[:2]
    big = jnp.float32(1e30)
    valid = tex[..., :1] >= 0.0
    mn_src = jnp.where(valid, tex, big)
    mx_src = jnp.where(valid, tex, -big)
    mn = jnp.broadcast_to(big, tex.shape)
    mx = jnp.broadcast_to(-big, tex.shape)
    mn_p = jnp.pad(mn_src, ((radius, radius), (radius, radius), (0, 0)),
                   constant_values=big)
    mx_p = jnp.pad(mx_src, ((radius, radius), (radius, radius), (0, 0)),
                   constant_values=-big)
    for dy in range(2 * radius + 1):
        for dx in range(2 * radius + 1):
            mn = jnp.minimum(mn, mn_p[dy: dy + h, dx: dx + w])
            mx = jnp.maximum(mx, mx_p[dy: dy + h, dx: dx + w])
    return mn, mx


class TestPallasStencils:
    def test_sharpness_matches_reference(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(size=(200, 256, 3)), jnp.float32)
        out_p = sharpness_3x3(img, 1.5)
        out_j = _jnp_sharpness(img, 1.5)
        # interior must match exactly; block-boundary rows too
        np.testing.assert_allclose(
            np.asarray(out_p)[1:-1], np.asarray(out_j)[1:-1], atol=1e-5
        )

    def test_sharpness_nonmultiple_rows(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(size=(97, 128, 3)), jnp.float32)
        out = sharpness_3x3(img, 1.0)
        assert out.shape == img.shape
        ref = _jnp_sharpness(img, 1.0)
        np.testing.assert_allclose(
            np.asarray(out)[1:-1], np.asarray(ref)[1:-1], atol=1e-5
        )

    def test_minmax_matches_reference(self):
        rng = np.random.default_rng(2)
        tex = jnp.asarray(rng.uniform(size=(160, 128, 4)), jnp.float32)
        # sprinkle invalid texels (r < 0) like unsampled SSGI pixels
        mask = rng.uniform(size=(160, 128)) < 0.1
        tex = tex.at[..., 0].set(jnp.where(jnp.asarray(mask), -1.0, tex[..., 0]))
        for radius in (1, 2):
            mn_p, mx_p = neighborhood_minmax(tex, radius)
            mn_j, mx_j = _jnp_minmax(tex, radius)
            r = radius
            np.testing.assert_allclose(
                np.asarray(mn_p)[r:-r, r:-r], np.asarray(mn_j)[r:-r, r:-r], atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(mx_p)[r:-r, r:-r], np.asarray(mx_j)[r:-r, r:-r], atol=1e-6
            )
