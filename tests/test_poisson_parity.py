"""Numpy transliteration parity fixture for K6 (Poisson denoiser).

Line-by-line port of
`/root/reference/src/denoise/shader/poisson_denoise.frag` (GBUFFER_TEXTURE
path) against ``ops.poisson_denoise.poisson_denoise_pass`` on shared
random inputs and identical blue noise. Taps are NEAREST fetches: every
texture the reference shader samples is NearestFilter-bound
(`GBufferPass.js:35-36`, `TemporalReprojectPass.js:66-67`). Covers: the luminance^0.125
edge-stopper, disocclusion-age weighting, the *1.0003 brighten hack, the
column-major uv-space tap rotation, radius scaling by normal flatness,
specular glossiness gating, and the background passthrough.
"""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.core.framebuffers import GBuffer
from realism_effects_tpu.core.rng import blue_noise_image
from realism_effects_tpu.ops.poisson_denoise import (
    POISSON8, PoissonDenoiseConfig, poisson_denoise_pass,
)

from test_temporal_parity import np_nearest
from test_temporal_parity import np_fwidth

H, W = 30, 26


def np_luminance8(rgb):
    base = rgb[..., 0] * 0.2125 + rgb[..., 1] * 0.7154 + rgb[..., 2] * 0.0721
    return np.maximum(base, 0.0) ** 0.125


def np_oct16_quantize(n):
    """Octahedral-f16 normal round trip (the packed G-buffer storage the
    reference's poisson reads via unpackNormal, `gbuffer_packing.glsl:61`,
    `poisson_denoise.frag:59,85`)."""
    an = np.abs(n)
    nn = n / (an[..., 0:1] + an[..., 1:2] + an[..., 2:3])
    xy = nn[..., :2]
    wrapped = (1.0 - np.abs(xy[..., ::-1])) * np.where(xy >= 0.0, 1.0, -1.0)
    xy = np.where(nn[..., 2:3] > 0.0, xy, wrapped)
    f = (xy * 0.5 + 0.5).astype(np.float32).astype(np.float16)
    f = f.astype(np.float64) * 2.0 - 1.0
    z = 1.0 - np.abs(f[..., 0]) - np.abs(f[..., 1])
    t = np.maximum(-z, 0.0)
    x = f[..., 0] + np.where(f[..., 0] >= 0.0, -t, t)
    y = f[..., 1] + np.where(f[..., 1] >= 0.0, -t, t)
    out = np.stack([x, y, z], -1)
    return out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-20)


def np_poisson_pass(textures, gb, noise, cfg):
    """poisson_denoise.frag main (GBUFFER_TEXTURE), one pass."""
    h, w = gb["depth"].shape
    ys, xs = np.mgrid[0:h, 0:w]
    uv = np.stack([(xs + 0.5) / w, (ys + 0.5) / h], -1)
    depth = gb["depth"]
    normal = np_oct16_quantize(gb["normal"])
    roughness = gb["roughness"]
    # rgba16f denoise targets: half-quantized texels
    textures = [t.astype(np.float16).astype(np.float64) for t in textures]
    tr = lambda c: np.log(c + 1.0)
    untr = lambda c: np.exp(c) - 1.0

    glossiness = np.maximum(0.0, 4.0 * (1.0 - roughness / 0.25))
    specular_factor = np.exp(-glossiness * cfg.specular_phi)
    flatness = 1.0 - np.minimum(
        np.linalg.norm(np_fwidth(normal), axis=-1), 1.0)
    flatness = flatness ** 2 * 0.75 + 0.25

    angle = noise[..., 0] * 2.0 * np.pi
    s, c = np.sin(angle), np.cos(angle)
    rscale = cfg.radius * flatness

    inputs = []
    for i, tex in enumerate(textures):
        rgb = tr(tex[..., :3] * 1.0003)
        a = tex[..., 3]
        age = 1.0 / (a + 1.0) ** (1.2 * cfg.phi)
        inputs.append({
            "rgb": rgb.copy(), "a": a, "lum": np_luminance8(rgb),
            "w": age, "total": np.ones((h, w)),
        })

    for k in range(8):
        off = POISSON8[k]
        # rm = r*flatness*mat2(c,-s,s,c); column-major -> (c*x+s*y, -s*x+c*y)
        ox = (c * (off[0] / w) + s * (off[1] / h)) * rscale
        oy = (-s * (off[0] / w) + c * (off[1] / h)) * rscale
        n_uv = uv + np.stack([ox, oy], -1)

        n_normal = np_nearest(normal, n_uv)
        n_depth = np_nearest(depth, n_uv)
        n_rough = np_nearest(roughness, n_uv)
        normal_diff = 1.0 - np.maximum(np.sum(normal * n_normal, -1), 0.0)
        depth_diff = 10000.0 * np.abs(depth - n_depth)
        rough_diff = np.abs(roughness - n_rough)
        w_basic = np.exp(-normal_diff * cfg.normal_phi
                         - depth_diff * cfg.depth_phi
                         - rough_diff * cfg.roughness_phi)
        w_basic = np.where(n_depth >= 1.0, 0.0, w_basic)

        for i, tex in enumerate(textures):
            wgt = w_basic * (specular_factor if cfg.is_specular[i] else 1.0)
            t_rgb = tr(np.maximum(np_nearest(tex, n_uv)[..., :3], 0.0))
            disoccl_w = np.maximum(wgt, 1e-20) ** 0.1
            luma_diff = np.minimum(
                np.abs(inputs[i]["lum"] - np_luminance8(t_rgb)), 0.5)
            luma_factor = np.exp(-luma_diff * cfg.luma_phi)
            age = inputs[i]["w"]
            wgt = (wgt * luma_factor + (disoccl_w - wgt * luma_factor) * age) * age
            wgt = wgt * (wgt >= 0.0001)
            inputs[i]["rgb"] += wgt[..., None] * t_rgb
            inputs[i]["total"] += wgt

    outs = []
    for i, tex in enumerate(textures):
        rgb = untr(inputs[i]["rgb"] / inputs[i]["total"][..., None])
        out = np.concatenate([rgb, inputs[i]["a"][..., None]], -1)
        outs.append(np.where((depth >= 1.0)[..., None], tex, out))
    return outs


def _gb(rng):
    nrm = rng.uniform(-1, 1, size=(H, W, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    depth = rng.uniform(0.4, 0.98, size=(H, W))
    depth[:3] = 1.0  # background band
    return {
        "normal": nrm,
        "depth": depth,
        "roughness": rng.uniform(size=(H, W)),
    }


def _to_gbuffer(gb):
    return GBuffer(
        diffuse=jnp.zeros((H, W, 4), jnp.float32),
        normal=jnp.asarray(gb["normal"], jnp.float32),
        roughness=jnp.asarray(gb["roughness"], jnp.float32),
        metalness=jnp.zeros((H, W), jnp.float32),
        emissive=jnp.zeros((H, W, 3), jnp.float32),
        depth=jnp.asarray(gb["depth"], jnp.float32),
    )


class TestPoissonParity:
    def _run(self, cfg, n_tex, seed):
        rng = np.random.default_rng(seed)
        gb = _gb(rng)
        texs = [
            rng.uniform(size=(H, W, 4)) * [1, 1, 1, 40] for _ in range(n_tex)
        ]
        idx = 5
        noise = np.asarray(blue_noise_image(H, W, jnp.int32(idx)), np.float64)
        expected = np_poisson_pass(texs, gb, noise, cfg)
        out = poisson_denoise_pass(
            [jnp.asarray(t, jnp.float32) for t in texs],
            _to_gbuffer(gb), jnp.int32(idx), cfg)
        for o, e in zip(out, expected):
            d = np.abs(np.asarray(o) - e)
            assert np.quantile(d, 0.995) < 1e-3, float(np.quantile(d, 0.995))
            assert d.max() < 0.02, float(d.max())

    def test_single_texture(self):
        self._run(PoissonDenoiseConfig(radius=3.0, is_specular=(False,)), 1, 0)

    def test_diffuse_specular(self):
        cfg = PoissonDenoiseConfig(
            radius=4.0, phi=0.5, luma_phi=5.0, depth_phi=2.0,
            normal_phi=3.25, roughness_phi=50.0, specular_phi=50.0,
            is_specular=(False, True))
        self._run(cfg, 2, 1)
