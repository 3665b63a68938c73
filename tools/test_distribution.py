"""Offline sampler-distribution check (testDistribution.js analog).

The reference ships a dev script that scatter-plots its Vogel/Poisson
sample sets and regenerates `vogel.glsl`
(`/root/reference/src/ssgi/utils/testDistribution.js:91-97`). This tool
does the same for the TPU build's samplers — Vogel disk, R2 sequence,
blue-noise tile, GGX-VNDF lobes, cosine hemisphere, env-CDF importance
samples — writing scatter/σ-statistics PNGs plus a text report.

Usage: python tools/test_distribution.py [--out /tmp/re_dist]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scatter_png(path, pts, size=256, extent=1.1):
    """Minimal scatter plot rendered into a uint8 image (no matplotlib)."""
    from realism_effects_tpu.utils.image_io import write_png

    img = np.full((size, size, 3), 255, np.uint8)
    xy = np.clip(
        ((pts / extent) * 0.5 + 0.5) * (size - 1), 0, size - 1
    ).astype(int)
    img[xy[:, 1], xy[:, 0]] = (30, 60, 180)
    write_png(path, img, flip_v=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/re_dist")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from realism_effects_tpu.core import brdf
    from realism_effects_tpu.core.envmap import (
        build_equirect_env, procedural_sky, sample_equirect_probability,
    )
    from realism_effects_tpu.core.rng import (
        blue_noise_tile, r2_sequence, vogel_disk,
    )
    from realism_effects_tpu.utils.image_io import write_png

    os.makedirs(args.out, exist_ok=True)
    report = []

    # Vogel disk (`Utils.js:104-120` analog)
    v = vogel_disk(64)
    scatter_png(os.path.join(args.out, "vogel64.png"), v)
    report.append(f"vogel64: mean radius {np.linalg.norm(v, axis=1).mean():.3f} "
                  f"(ideal 2/3 = 0.667), max {np.linalg.norm(v, axis=1).max():.3f}")

    # R2 sequence discrepancy vs uniform random
    r2 = r2_sequence(1024)
    scatter_png(os.path.join(args.out, "r2_1024.png"), r2 * 2 - 1)
    rng = np.random.default_rng(0)
    rnd = rng.uniform(size=(1024, 2))

    def star_discrepancy_proxy(p):
        # centered L2-ish proxy: max deviation of box counts on a grid
        errs = []
        for gx in (2, 4, 8):
            h, _, _ = np.histogram2d(p[:, 0], p[:, 1], bins=gx,
                                     range=[[0, 1], [0, 1]])
            errs.append(np.abs(h / len(p) - 1 / gx**2).max())
        return max(errs)

    report.append(f"R2 discrepancy proxy {star_discrepancy_proxy(r2):.4f} vs "
                  f"random {star_discrepancy_proxy(rnd):.4f} (lower=better)")

    # blue-noise tile spectrum
    tile = blue_noise_tile()[..., 0]
    spec = np.abs(np.fft.fftshift(np.fft.fft2(tile - tile.mean()))) ** 2
    spec = spec / spec.max()
    write_png(os.path.join(args.out, "blue_noise_spectrum.png"),
              np.clip(spec * 40, 0, 1))
    freq = np.sqrt(
        np.fft.fftfreq(128)[:, None] ** 2 + np.fft.fftfreq(128)[None, :] ** 2
    )
    spec_u = np.abs(np.fft.fft2(tile - tile.mean())) ** 2
    low = spec_u[(freq < 0.05) & (freq > 0)].mean()
    high = spec_u[freq > 0.3].mean()
    report.append(f"blue-noise low/high spectral ratio {low / high:.4f} "
                  "(<0.2 = properly blue)")

    # cosine hemisphere moments
    n = jnp.asarray(np.tile([0.0, 0.0, 1.0], (20000, 1)), jnp.float32)
    u = jnp.asarray(rng.uniform(size=(20000, 2)), jnp.float32)
    d = np.asarray(brdf.cosine_sample_hemisphere(n, u))
    report.append(f"cosine hemisphere <n.l> {d[:, 2].mean():.4f} (ideal 0.6667)")

    # GGX-VNDF lobe widths vs roughness
    vvec = jnp.asarray(np.tile([0.0, 0.0, 1.0], (8192, 1)), jnp.float32)
    u1 = jnp.asarray(rng.uniform(size=8192), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=8192), jnp.float32)
    for rough in (0.05, 0.3, 0.8):
        hv = np.asarray(brdf.sample_ggx_vndf(vvec, rough, rough, u1, u2))
        report.append(f"VNDF roughness {rough}: <h.z> {hv[:, 2].mean():.4f}")

    # env CDF importance sampling concentration
    env = build_equirect_env(procedural_sky(64, 128, sun_intensity=100.0))
    noise = jnp.asarray(rng.uniform(size=(4096, 2)), jnp.float32)
    pdf, dirs = sample_equirect_probability(env, noise)
    sun = np.array([0.5, 0.6, 0.3])
    sun /= np.linalg.norm(sun)
    frac = float((np.asarray(dirs) @ sun > 0.965).mean())
    report.append(f"env CDF: {100 * frac:.1f}% of samples within 15 deg of "
                  "the sun (random would be ~0.8%)")

    text = "\n".join(report)
    with open(os.path.join(args.out, "report.txt"), "w") as f:
        f.write(text + "\n")
    print(text)
    print(f"-> plots in {args.out}/")


if __name__ == "__main__":
    main()
