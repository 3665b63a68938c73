"""FXAA 3.11 (quality preset) — the reference demo's fallback AA.

The example app switches between TRAA / MSAA / FXAA / SMAA
(`/root/reference/example/main.js:116-154,543-547`) and drops to
``POSTPROCESSING.FXAAEffect`` on slow GPUs (`:549-559`). This is the
standard Lottes FXAA 3.11 quality algorithm: luma edge detection,
sub-pixel filtering, and an iterative end-of-edge search — expressed as
whole-image gathers (each search step is one bilinear fetch of the full
frame, lane-parallel on the VPU).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math3d import uv_grid
from ..core.sampling import sample_bilinear
from .base import Effect

#: FXAA 3.11 PRESET 12 search-step offsets
_STEPS = (1.0, 1.5, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 4.0, 8.0)

_EDGE_THRESHOLD = 0.0312        # contrast floor (FXAA_QUALITY level 12)
_EDGE_THRESHOLD_REL = 0.125    # relative contrast threshold
_SUBPIX = 0.75                  # sub-pixel aliasing removal strength


def _luma(rgb: jnp.ndarray) -> jnp.ndarray:
    # FXAA operates on perceptual luma; the standard green-weighted dot
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114


def fxaa(color: jnp.ndarray) -> jnp.ndarray:
    """Apply FXAA 3.11 quality to an (H, W, 3) image (LDR-ish input;
    the demo applies it on the tone-mapped frame like the reference)."""
    h, w = color.shape[:2]
    inv = jnp.asarray([1.0 / w, 1.0 / h])
    uv = uv_grid(h, w)
    luma = _luma(color)

    def lum_at(duv):
        return _luma(sample_bilinear(color, uv + duv * inv))

    # edge-clamped 3x3 neighborhood: GLSL texture fetches clamp at the
    # border; jnp.roll would wrap luma across the frame and let a bright
    # feature on one edge trigger blending on the opposite one
    pad = jnp.pad(luma, 1, mode="edge")

    def nb(dy, dx):
        return pad[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]

    l_c = luma
    l_n = nb(-1, 0)
    l_s = nb(1, 0)
    l_w = nb(0, -1)
    l_e = nb(0, 1)
    l_nw = nb(-1, -1)
    l_ne = nb(-1, 1)
    l_sw = nb(1, -1)
    l_se = nb(1, 1)

    l_min = jnp.minimum(l_c, jnp.minimum(jnp.minimum(l_n, l_s),
                                         jnp.minimum(l_w, l_e)))
    l_max = jnp.maximum(l_c, jnp.maximum(jnp.maximum(l_n, l_s),
                                         jnp.maximum(l_w, l_e)))
    contrast = l_max - l_min
    active = contrast >= jnp.maximum(_EDGE_THRESHOLD,
                                     l_max * _EDGE_THRESHOLD_REL)

    # sub-pixel blend factor (lowpass vs center contrast)
    lowpass = (2.0 * (l_n + l_s + l_w + l_e)
               + l_nw + l_ne + l_sw + l_se) / 12.0
    sub = jnp.clip(jnp.abs(lowpass - l_c) / jnp.maximum(contrast, 1e-6),
                   0.0, 1.0)
    sub = (sub * sub) * (3.0 - 2.0 * sub)
    sub = sub * sub * _SUBPIX

    # edge orientation (FXAA's vertical/horizontal edge estimator)
    edge_h = (jnp.abs(l_nw + l_ne - 2.0 * l_n)
              + 2.0 * jnp.abs(l_w + l_e - 2.0 * l_c)
              + jnp.abs(l_sw + l_se - 2.0 * l_s))
    edge_v = (jnp.abs(l_nw + l_sw - 2.0 * l_w)
              + 2.0 * jnp.abs(l_n + l_s - 2.0 * l_c)
              + jnp.abs(l_ne + l_se - 2.0 * l_e))
    horizontal = edge_h >= edge_v

    # pick the higher-contrast side perpendicular to the edge
    l_pos = jnp.where(horizontal, l_s, l_e)   # +axis neighbor
    l_neg = jnp.where(horizontal, l_n, l_w)   # -axis neighbor
    grad_pos = jnp.abs(l_pos - l_c)
    grad_neg = jnp.abs(l_neg - l_c)
    pair_dir = jnp.where(grad_pos >= grad_neg, 1.0, -1.0)
    l_edge = jnp.where(grad_pos >= grad_neg,
                       (l_pos + l_c) * 0.5, (l_neg + l_c) * 0.5)
    grad = jnp.maximum(grad_pos, grad_neg) * 0.25

    # step one half-texel perpendicular onto the edge, then search along
    perp = jnp.where(horizontal[..., None],
                     jnp.stack([jnp.zeros_like(pair_dir), pair_dir], -1),
                     jnp.stack([pair_dir, jnp.zeros_like(pair_dir)], -1))
    along = jnp.where(horizontal[..., None],
                      jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0]))
    base = perp * 0.5

    dist_p = jnp.zeros_like(l_c)
    dist_n = jnp.zeros_like(l_c)
    done_p = jnp.zeros_like(l_c, bool)
    done_n = jnp.zeros_like(l_c, bool)
    end_p = jnp.zeros_like(l_c)
    end_n = jnp.zeros_like(l_c)
    off_p = jnp.zeros_like(l_c)
    off_n = jnp.zeros_like(l_c)
    for s in _STEPS:
        off_p = jnp.where(done_p, off_p, off_p + s)
        off_n = jnp.where(done_n, off_n, off_n + s)
        lp = _luma(sample_bilinear(
            color, uv + (base + along * off_p[..., None]) * inv))
        ln = _luma(sample_bilinear(
            color, uv + (base - along * off_n[..., None]) * inv))
        new_p = jnp.abs(lp - l_edge) >= grad
        new_n = jnp.abs(ln - l_edge) >= grad
        end_p = jnp.where(done_p, end_p, lp)
        end_n = jnp.where(done_n, end_n, ln)
        dist_p = jnp.where(done_p, dist_p, off_p)
        dist_n = jnp.where(done_n, dist_n, off_n)
        done_p = done_p | new_p
        done_n = done_n | new_n

    # blend toward the nearer edge end if its luma steps the same way
    span = dist_p + dist_n
    nearer_p = dist_p < dist_n
    dist = jnp.minimum(dist_p, dist_n)
    l_end = jnp.where(nearer_p, end_p, end_n)
    good = ((l_end - l_edge) * (l_c - l_edge)) < 0.0
    edge_blend = jnp.where(good, 0.5 - dist / jnp.maximum(span, 1e-6), 0.0)

    blend = jnp.maximum(edge_blend, sub)
    out_uv = uv + perp * (blend * active)[..., None] * inv
    return jnp.where(active[..., None],
                     sample_bilinear(color, out_uv), color)


class FXAAEffect(Effect):
    """Single-pass FXAA stage (``--aa fxaa`` in the demo, mirroring the
    reference's AA switch / slow-GPU fallback)."""

    name = "fxaa"

    def apply(self, ctx, color, state):
        return fxaa(color), state
