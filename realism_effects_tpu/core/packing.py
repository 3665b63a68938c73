"""Packing codecs.

The reference bit-packs its whole G-buffer into one RGBA32F texture
(`/root/reference/src/gbuffer/shader/gbuffer_packing.glsl`). The TPU build
uses an SoA G-buffer instead (see ``core.framebuffers``) — these codecs are
kept for (a) octahedral normal encoding, which stays useful as a compact
wire format, and (b) parity/round-trip testing against the reference's
formats.
"""

from __future__ import annotations

import jax.numpy as jnp

_C_PRECISION = 256.0
_C_PRECISION_P1 = 257.0
_ONE_SAFE = 0.999999
_NON_ZERO_OFFSET = 0.0001


# --- octahedral normals (gbuffer_packing.glsl:36-63) -----------------------

def encode_oct(n: jnp.ndarray) -> jnp.ndarray:
    """Unit normal (..., 3) -> octahedral (..., 2) in [0, 1]^2."""
    n = n / (jnp.abs(n[..., 0:1]) + jnp.abs(n[..., 1:2]) + jnp.abs(n[..., 2:3]))
    xy = n[..., :2]
    wrapped = (1.0 - jnp.abs(xy[..., ::-1])) * jnp.where(xy >= 0.0, 1.0, -1.0)
    xy = jnp.where(n[..., 2:3] > 0.0, xy, wrapped)
    return xy * 0.5 + 0.5


def decode_oct(f: jnp.ndarray) -> jnp.ndarray:
    """Octahedral (..., 2) -> unit normal (..., 3)."""
    f = f * 2.0 - 1.0
    z = 1.0 - jnp.abs(f[..., 0]) - jnp.abs(f[..., 1])
    t = jnp.maximum(-z, 0.0)
    x = f[..., 0] + jnp.where(f[..., 0] >= 0.0, -t, t)
    y = f[..., 1] + jnp.where(f[..., 1] >= 0.0, -t, t)
    n = jnp.stack([x, y, z], axis=-1)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)


# --- half2x16-in-float32 (packNormal / packHalf2x16) -----------------------

def pack_half2x16(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) float -> float32 whose bits hold two f16 (GLSL packHalf2x16
    + uintBitsToFloat, `gbuffer_packing.glsl:61`)."""
    h = v.astype(jnp.float16)
    bits = h.view(jnp.uint16).astype(jnp.uint32)
    packed = bits[..., 0] | (bits[..., 1] << 16)
    return packed.view(jnp.float32)


def unpack_half2x16(f: jnp.ndarray) -> jnp.ndarray:
    bits = jnp.asarray(f, jnp.float32).view(jnp.uint32)
    lo = (bits & 0xFFFF).astype(jnp.uint16).view(jnp.float16)
    hi = ((bits >> 16) & 0xFFFF).astype(jnp.uint16).view(jnp.float16)
    return jnp.stack([lo, hi], axis=-1).astype(jnp.float32)


def pack_normal(n: jnp.ndarray) -> jnp.ndarray:
    """Normal (..., 3) -> one float32 (oct + half2x16), as the velocity
    buffer's B channel stores it (`VelocityDepthNormalMaterial.js:179`)."""
    return pack_half2x16(encode_oct(n))


def unpack_normal(f: jnp.ndarray) -> jnp.ndarray:
    return decode_oct(unpack_half2x16(f))


# --- color <-> single float codecs (parity with reference) -----------------

def color2float(color: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) in [0,1] -> one float (gbuffer_packing.glsl:17-22)."""
    c = jnp.minimum(color + _NON_ZERO_OFFSET, _ONE_SAFE)
    return (
        jnp.floor(c[..., 0] * _C_PRECISION + 0.5)
        + jnp.floor(c[..., 2] * _C_PRECISION + 0.5) * _C_PRECISION_P1
        + jnp.floor(c[..., 1] * _C_PRECISION + 0.5) * _C_PRECISION_P1 * _C_PRECISION_P1
    )


def float2color(value: jnp.ndarray) -> jnp.ndarray:
    r = jnp.mod(value, _C_PRECISION_P1) / _C_PRECISION
    b = jnp.mod(jnp.floor(value / _C_PRECISION_P1), _C_PRECISION_P1) / _C_PRECISION
    g = jnp.floor(value / (_C_PRECISION_P1 * _C_PRECISION_P1)) / _C_PRECISION
    c = jnp.stack([r, g, b], axis=-1) - _NON_ZERO_OFFSET
    return jnp.maximum(c, 0.0)


def encode_rgbe8(rgb: jnp.ndarray) -> jnp.ndarray:
    """HDR rgb -> shared-exponent RGBE8 (gbuffer_packing.glsl:127-134)."""
    max_c = jnp.maximum(jnp.max(rgb, axis=-1), 1e-32)
    f_exp = jnp.ceil(jnp.log2(max_c))
    mant = rgb / jnp.exp2(f_exp)[..., None]
    a = (f_exp + 128.0) / 255.0
    return jnp.concatenate([mant, a[..., None]], axis=-1)


def decode_rgbe8(rgbe: jnp.ndarray) -> jnp.ndarray:
    f_exp = rgbe[..., 3] * 255.0 - 128.0
    return rgbe[..., :3] * jnp.exp2(f_exp)[..., None]


def vec4_to_float(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) in [0,1] -> one float32 holding 4 bytes
    (gbuffer_packing.glsl:143-149)."""
    v = jnp.minimum(v + _NON_ZERO_OFFSET, _ONE_SAFE)
    b = (v * 255.0).astype(jnp.uint32)
    packed = (b[..., 3] << 24) | (b[..., 2] << 16) | (b[..., 1] << 8) | b[..., 0]
    return packed.view(jnp.float32)


def float_to_vec4(f: jnp.ndarray) -> jnp.ndarray:
    bits = jnp.asarray(f, jnp.float32).view(jnp.uint32)
    v = jnp.stack(
        [
            (bits & 0xFF).astype(jnp.float32),
            ((bits >> 8) & 0xFF).astype(jnp.float32),
            ((bits >> 16) & 0xFF).astype(jnp.float32),
            ((bits >> 24) & 0xFF).astype(jnp.float32),
        ],
        axis=-1,
    ) / 255.0
    return jnp.maximum(v - _NON_ZERO_OFFSET, 0.0)
