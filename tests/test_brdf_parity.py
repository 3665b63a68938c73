"""Numpy transliteration parity fixture for K2 (ssgi_utils.frag library).

Covers the BRDF / sampling / environment math the SSGI tracer is built
from: D_GTR, SmithG, GGXVNDFPdf, GeometryTerm, Disney diffuse/specular,
equirect direction<->uv, equirectDirectionPdf, misHeuristic — each
hand-ported from `/root/reference/src/ssgi/shader/ssgi_utils.frag:60-231`
and asserted against ``core.brdf`` / ``core.envmap`` on random inputs.
(SampleGGXVNDF / Onb / cosineSampleHemisphere are covered by
test_kernel_parity.py and test_ao_parity.py.)
"""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.core import brdf
from realism_effects_tpu.core.envmap import (
    direction_to_equirect_uv, equirect_direction_pdf,
    equirect_uv_to_direction,
)

N = 4096


def _rng_dirs(rng, n=N):
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


# --- transliterations -------------------------------------------------------

def np_d_gtr(roughness, noh, k=2.0):
    a2 = roughness ** 2
    return a2 / (np.pi * ((noh * noh) * (a2 * a2 - 1.0) + 1.0) ** k)


def np_smith_g(nov, alpha_g):
    a = alpha_g * alpha_g
    b = nov * nov
    return (2.0 * nov) / (nov + np.sqrt(a + b - a * b))


def np_ggx_vndf_pdf(noh, nov, roughness):
    d = np_d_gtr(roughness, noh, 2.0)
    g1 = np_smith_g(nov, roughness * roughness)
    return (d * g1) / np.maximum(1e-5, 4.0 * nov)


def np_disney_diffuse(nol, nov, loh, roughness, metalness):
    fd90 = 0.5 + 2.0 * roughness * loh ** 2
    fs = lambda f0, f90, th: f0 + (f90 - f0) * (1.0 - th) ** 5
    return (fs(1.0, fd90, nol) * fs(1.0, fd90, nov) / np.pi) * (1.0 - metalness)


def np_disney_specular(roughness, noh, nov, nol):
    d = np_d_gtr(roughness, noh, 2.0)
    a2 = (0.5 + roughness * 0.5) ** 2
    g = np_smith_g(nov, a2 * a2) * np_smith_g(nol, a2 * a2)
    return d * g / (4.0 * nol * nov)


def np_equirect_dir_to_uv(d):
    u = np.arctan2(d[..., 2], d[..., 0]) / (2 * np.pi) + 0.5
    v = 1.0 - np.arccos(np.clip(d[..., 1], -1, 1)) / np.pi
    return np.stack([u, v], -1)


def np_equirect_uv_to_dir(uv):
    theta = (uv[..., 0] - 0.5) * 2 * np.pi
    phi = (1.0 - uv[..., 1]) * np.pi
    sp = np.sin(phi)
    return np.stack([sp * np.cos(theta), np.cos(phi), sp * np.sin(theta)], -1)


def np_equirect_pdf(d):
    uv = np_equirect_dir_to_uv(d)
    st = np.sin(uv[..., 1] * np.pi)
    return np.where(st == 0.0, 0.0, 1.0 / (2.0 * np.pi * np.pi * np.maximum(st, 1e-20)))


class TestBRDFParity:
    def test_scalar_terms(self):
        rng = np.random.default_rng(0)
        rough = rng.uniform(0.01, 1.0, N)
        noh = rng.uniform(0.01, 0.999, N)
        nov = rng.uniform(0.01, 0.999, N)
        nol = rng.uniform(0.01, 0.999, N)
        loh = rng.uniform(0.01, 0.999, N)
        metal = rng.uniform(size=N)

        np.testing.assert_allclose(
            np.asarray(brdf.d_gtr(jnp.asarray(rough, jnp.float32),
                                  jnp.asarray(noh, jnp.float32))),
            np_d_gtr(rough, noh), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(brdf.smith_g(jnp.asarray(nov, jnp.float32),
                                    jnp.asarray(rough, jnp.float32))),
            np_smith_g(nov, rough), rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(brdf.ggx_vndf_pdf(
                jnp.asarray(noh, jnp.float32), jnp.asarray(nov, jnp.float32),
                jnp.asarray(rough, jnp.float32))),
            np_ggx_vndf_pdf(noh, nov, rough), rtol=3e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(brdf.eval_disney_diffuse(
                jnp.asarray(nol, jnp.float32), jnp.asarray(nov, jnp.float32),
                jnp.asarray(loh, jnp.float32), jnp.asarray(rough, jnp.float32),
                jnp.asarray(metal, jnp.float32))),
            np_disney_diffuse(nol, nov, loh, rough, metal),
            rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(brdf.eval_disney_specular(
                jnp.asarray(rough, jnp.float32), jnp.asarray(noh, jnp.float32),
                jnp.asarray(nov, jnp.float32), jnp.asarray(nol, jnp.float32))),
            np_disney_specular(rough, noh, nov, nol), rtol=3e-4, atol=1e-4)

    def test_mis_heuristic(self):
        rng = np.random.default_rng(1)
        a = rng.uniform(0, 5, N)
        b = rng.uniform(0, 5, N)
        expected = a * a / (a * a + b * b)
        np.testing.assert_allclose(
            np.asarray(brdf.mis_heuristic(
                jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))),
            expected, rtol=1e-5, atol=1e-6)


class TestEquirectParity:
    def test_direction_uv_roundtrip_matches_frag(self):
        rng = np.random.default_rng(2)
        d = _rng_dirs(rng)
        uv_np = np_equirect_dir_to_uv(d)
        uv = np.asarray(direction_to_equirect_uv(jnp.asarray(d, jnp.float32)))
        # u wraps at the seam (atan2 branch); compare circularly
        du = np.abs(uv[..., 0] - uv_np[..., 0])
        du = np.minimum(du, 1.0 - du)
        assert du.max() < 1e-5
        np.testing.assert_allclose(uv[..., 1], uv_np[..., 1], atol=1e-5)

        back_np = np_equirect_uv_to_dir(uv_np)
        back = np.asarray(
            equirect_uv_to_direction(jnp.asarray(uv_np, jnp.float32)))
        np.testing.assert_allclose(back, back_np, atol=1e-5)
        np.testing.assert_allclose(back_np, d, atol=1e-6)  # true inverse

    def test_direction_pdf_matches_frag(self):
        rng = np.random.default_rng(3)
        d = _rng_dirs(rng)
        expected = np_equirect_pdf(d)
        got = np.asarray(equirect_direction_pdf(jnp.asarray(d, jnp.float32)))
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-6)

    def test_pdf_integrates_to_one(self):
        """sin-weighted pdf over the sphere integrates to ~1 (sanity on
        the 1/(2 pi^2 sinTheta) convention)."""
        nu, nv = 256, 128
        us = (np.arange(nu) + 0.5) / nu
        vs = (np.arange(nv) + 0.5) / nv
        uu, vv = np.meshgrid(us, vs)
        uv = np.stack([uu, vv], -1)
        d = np_equirect_uv_to_dir(uv)
        pdf = np_equirect_pdf(d)
        # d(solid angle) = sin(theta) dtheta dphi; theta = (1-v)*pi
        theta = (1.0 - vv) * np.pi
        integral = np.sum(pdf * np.sin(theta)) * (np.pi / nv) * (2 * np.pi / nu)
        assert abs(integral - 1.0) < 1e-3
