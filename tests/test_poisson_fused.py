"""Fused Poisson-denoise pass kernel (ops/pallas/poisson.py) vs the jnp
formulation of `ops/poisson_denoise.py` (itself pinned to the GLSL by
tests/test_poisson_parity.py). Same storage quantization and weight
math; differences are transcendental ULPs only."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from realism_effects_tpu.core.framebuffers import GBuffer
from realism_effects_tpu.ops import poisson_denoise as pd
from realism_effects_tpu.ops.pallas import poisson as fused


@pytest.fixture(autouse=True)
def _force_fused_on_cpu(monkeypatch):
    """The fused kernel is TPU-gated by default (XLA:CPU compile cost);
    these parity tests force the interpret-mode evaluation."""
    monkeypatch.setattr(fused, "FORCE_INTERPRET", True)


def _inputs(h, w, n_tex, seed=0):
    rng = np.random.default_rng(seed)
    depth = np.clip(0.8 + 0.1 * rng.random((h, w)), 0, 1)
    depth[: h // 8] = 1.0  # background band
    nrm = rng.uniform(-1, 1, (h, w, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm[: h // 8] = 0.0
    gb = GBuffer(
        diffuse=jnp.zeros((h, w, 4), jnp.float32),
        normal=jnp.asarray(nrm, jnp.float32),
        roughness=jnp.asarray(rng.random((h, w)), jnp.float32),
        metalness=jnp.zeros((h, w), jnp.float32),
        emissive=jnp.zeros((h, w, 3), jnp.float32),
        depth=jnp.asarray(depth, jnp.float32),
    )
    texs = [
        jnp.asarray(
            np.concatenate(
                [rng.random((h, w, 3)) * 2.0,
                 rng.integers(0, 40, (h, w, 1)).astype(np.float32)],
                axis=-1,
            ),
            jnp.float32,
        )
        for _ in range(n_tex)
    ]
    return texs, gb


def _run_both(texs, gb, cfg, frame=5):
    old = fused.USE_FUSED_PASS
    try:
        fused.USE_FUSED_PASS = False
        want = pd.poisson_denoise_pass(texs, gb, jnp.int32(frame), cfg)
        fused.USE_FUSED_PASS = True
        assert fused.fused_pass_supported(
            cfg, len(texs), gb.depth.shape[0], gb.depth.shape[1]
        )
        got = pd.poisson_denoise_pass(texs, gb, jnp.int32(frame), cfg)
    finally:
        fused.USE_FUSED_PASS = old
    return got, want


def test_fused_pass_two_textures():
    texs, gb = _inputs(96, 160, 2)
    cfg = pd.PoissonDenoiseConfig(is_specular=(False, True))
    got, want = _run_both(texs, gb, cfg)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), atol=5e-4, rtol=5e-4,
        )


def test_fused_pass_ao_path():
    """AO-shaped input (scalar replicated to rgb, zero alpha) through the
    single-packed-channel scalar-slot path (poisson_denoise_ao wiring)."""
    texs, gb = _inputs(64, 128, 1, seed=3)
    ao = jnp.clip(texs[0][..., 0], 0.0, 1.0)
    cfg = pd.PoissonDenoiseConfig(is_specular=(False,))

    old = fused.USE_FUSED_PASS
    try:
        fused.USE_FUSED_PASS = False
        want = pd.poisson_denoise_ao(ao, gb.normal, gb, 5, cfg)
        fused.USE_FUSED_PASS = True
        got = pd.poisson_denoise_ao(ao, gb.normal, gb, 5, cfg)
    finally:
        fused.USE_FUSED_PASS = old
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3,
    )


def test_fused_full_denoise_iterations():
    """2 ping-pong passes through poisson_denoise (loop carry)."""
    texs, gb = _inputs(64, 128, 2, seed=9)
    cfg = pd.PoissonDenoiseConfig(is_specular=(False, True), iterations=1)
    old = fused.USE_FUSED_PASS
    try:
        fused.USE_FUSED_PASS = False
        want = pd.poisson_denoise(texs, gb, 2, cfg)
        fused.USE_FUSED_PASS = True
        got = pd.poisson_denoise(texs, gb, 2, cfg)
    finally:
        fused.USE_FUSED_PASS = old
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), atol=2e-3, rtol=2e-3,
        )


def test_fused_sharded_matches_single():
    """The self-sharding path (mesh context, halo exchange) matches the
    unsharded fused pass."""
    import jax

    from realism_effects_tpu.parallel import context as par_ctx
    from realism_effects_tpu.parallel.sharding import make_mesh

    texs, gb = _inputs(128, 128, 2, seed=13)
    cfg = pd.PoissonDenoiseConfig(is_specular=(False, True))

    def run(t0, t1, d, n, r):
        gb2 = dataclasses.replace(gb, depth=d, normal=n, roughness=r)
        return tuple(
            pd.poisson_denoise_pass([t0, t1], gb2, jnp.int32(4), cfg)
        )

    single = jax.jit(run)(texs[0], texs[1], gb.depth, gb.normal,
                          gb.roughness)

    n_dev = min(4, len(jax.devices()))
    mesh = make_mesh(jax.devices()[:n_dev])
    with par_ctx.mesh_context(mesh):
        sharded = jax.jit(run)(texs[0], texs[1], gb.depth, gb.normal,
                               gb.roughness)
    for g, w_ in zip(sharded, single):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), atol=2e-6, rtol=2e-6,
        )
