"""Disney BRDF evaluation + sampling, vectorized over pixels.

TPU re-implementation of the shading math in
`/root/reference/src/ssgi/shader/ssgi_utils.frag:94-191` (GGX-VNDF
sampling, Smith geometry, Schlick Fresnel, Disney diffuse) and the
cosine-hemisphere sampler shared with HBAO
(`/root/reference/src/hbao/shader/hbao_utils.glsl:84-92`).

All functions take ``(..., 3)`` vectors / ``(...)`` scalars and are pure.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math3d import dot, normalize

EPSILON = 1e-5
ONE_MINUS_EPSILON = 1.0 - EPSILON
PI = jnp.pi


def f_schlick(f0, theta):
    """Schlick Fresnel; f0 may be scalar (...) or color (..., 3)."""
    p = (1.0 - theta) ** 5.0
    if f0.ndim == theta.ndim + 1:
        p = p[..., None]
    return f0 + (1.0 - f0) * p


def f_schlick_scalar(f0, f90, theta):
    return f0 + (f90 - f0) * (1.0 - theta) ** 5.0


def d_gtr(roughness, noh, k=2.0):
    a2 = roughness ** 2.0
    return a2 / (PI * ((noh * noh) * (a2 * a2 - 1.0) + 1.0) ** k)


def smith_g(ndotv, alpha_g):
    a = alpha_g * alpha_g
    b = ndotv * ndotv
    return (2.0 * ndotv) / (ndotv + jnp.sqrt(a + b - a * b))


def ggx_vndf_pdf(noh, nov, roughness):
    d = d_gtr(roughness, noh, 2.0)
    g1 = smith_g(nov, roughness * roughness)
    return (d * g1) / jnp.maximum(1e-5, 4.0 * nov)


def geometry_term(nol, nov, roughness):
    a2 = roughness * roughness
    return smith_g(nov, a2) * smith_g(nol, a2)


def eval_disney_diffuse(nol, nov, loh, roughness, metalness):
    """Scalar Disney diffuse (`ssgi_utils.frag:136-142`); returns (...)."""
    fd90 = 0.5 + 2.0 * roughness * loh ** 2.0
    a = f_schlick_scalar(1.0, fd90, nol)
    b = f_schlick_scalar(1.0, fd90, nov)
    return (a * b / PI) * (1.0 - metalness)


def eval_disney_specular(roughness, noh, nov, nol):
    """Scalar Disney specular (`ssgi_utils.frag:144-151`); returns (...)."""
    d = d_gtr(roughness, noh, 2.0)
    g = geometry_term(nol, nov, (0.5 + roughness * 0.5) ** 2.0)
    return d * g / (4.0 * nol * nov)


def sample_ggx_vndf(v, ax, ay, r1, r2):
    """GGX visible-normal sampling (`ssgi_utils.frag:153-170`).

    ``v`` is the local-frame view vector (z up); returns the sampled half
    vector in the same frame.
    """
    vh = normalize(jnp.stack([ax * v[..., 0], ay * v[..., 1], v[..., 2]], axis=-1))

    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = jnp.where(lensq > 0.0, 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20)), 0.0)
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len, jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)

    r = jnp.sqrt(r1)
    phi = 2.0 * PI * r2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2

    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))[..., None] * vh
    )
    return normalize(
        jnp.stack(
            [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(0.0, nh[..., 2])], axis=-1
        )
    )


def onb(n):
    """Orthonormal basis around n (`ssgi_utils.frag:172-176`); returns (t, b)."""
    up = jnp.where(
        (jnp.abs(n[..., 2]) < 0.9999999)[..., None],
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
    )
    t = normalize(jnp.cross(up, n))
    b = jnp.cross(n, t)
    return t, b


def to_local(t, b, n, v):
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def to_world(t, b, n, v):
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def cosine_sample_hemisphere(n, u):
    """Cosine-weighted hemisphere around n (`ssgi_utils.frag:183-191`).

    ``u`` is (..., 2) uniform randoms.
    """
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * PI * u[..., 1]

    ref = jnp.broadcast_to(jnp.array([0.0, 1.0, 1.0]), n.shape)
    b = normalize(jnp.cross(n, ref))
    t = jnp.cross(b, n)

    return normalize(
        r[..., None] * jnp.sin(theta)[..., None] * b
        + jnp.sqrt(1.0 - u[..., 0])[..., None] * n
        + r[..., None] * jnp.cos(theta)[..., None] * t
    )


def mis_heuristic(a, b):
    """Power heuristic (`ssgi_utils.frag:227-231`)."""
    aa = a * a
    return aa / (aa + b * b)


def calculate_angles(l, v, n):
    """h, NoL, NoH, LoH, VoH with the reference's clamping
    (`ssgi.frag:93-100`)."""
    h = normalize(v + l)
    clamp = lambda x: jnp.clip(x, EPSILON, ONE_MINUS_EPSILON)
    nol = clamp(dot(n, l))
    noh = clamp(dot(n, h))
    loh = clamp(dot(l, h))
    voh = clamp(dot(v, h))
    return h, nol, noh, loh, voh
