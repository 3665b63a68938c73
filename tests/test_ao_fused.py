"""Fused HBAO Pallas kernel (ops/pallas/hbao.py) vs the jnp window path.

The fused kernel reproduces `ops/ao.py::hbao` with USE_WINDOW_WARP
(window-clamped sampling radius, `hbao.frag:80-115` semantics); values
may differ by transcendental ULPs (rsqrt vs x/|x| normalize, pow vs
exp*log), so the bound here is a tight float tolerance rather than
bit-equality. The gather-exact path stays pinned by test_ao_parity.py.
"""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.ops import ao as ao_mod
from realism_effects_tpu.ops.ao import AOConfig
from realism_effects_tpu.ops.pallas.hbao import hbao_fused, \
    rolled_noise_tiles


def _scene(h, w, seed=11):
    rng = np.random.default_rng(seed)
    cam = PerspectiveCamera(50, w / h, 0.1, 80)
    cam.set_position(0.3, 1.5, 5.0)
    cam.look_at((0, 0.5, 0))
    m = cam.matrices()
    # piecewise-smooth depth with an edge, plus background (depth=1)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    depth = 0.85 + 0.1 * (xx > w // 2) + 0.002 * np.sin(yy * 0.2)
    depth[: h // 8] = 1.0
    depth = jnp.asarray(depth, jnp.float32)
    nrm = np.array([0.1, 0.2, 0.97]) + rng.uniform(-0.1, 0.1, (h, w, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm[: h // 8] = 0.0  # background normals are zero in the G-buffer
    return depth, jnp.asarray(nrm, jnp.float32), m


def test_fused_matches_window_path():
    h, w = 96, 160
    depth, normal, cam = _scene(h, w)
    cfg = AOConfig(spp=8, distance=0.3, window_ky=32)

    old = ao_mod.USE_FUSED_KERNEL
    try:
        ao_mod.USE_FUSED_KERNEL = False
        _, want = ao_mod.hbao(depth, normal, cam, 3, cfg)
    finally:
        ao_mod.USE_FUSED_KERNEL = old
    got = hbao_fused(depth, normal, cam, 3, cfg)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4,
    )


def test_fused_noise_tiles_match_blue_noise_image():
    """rolled_noise_tiles channel triples reproduce blue_noise_image."""
    from realism_effects_tpu.core.rng import blue_noise_image

    spp, frame = 4, 7
    tiles = np.asarray(rolled_noise_tiles(spp, frame, True))
    for s in range(spp):
        want = np.asarray(
            blue_noise_image(128, 128, frame * spp + s)[..., :3]
        )
        got = np.moveaxis(tiles[3 * s: 3 * s + 3], 0, -1)
        np.testing.assert_array_equal(got, want)


def test_fused_animated_off_uses_frame_zero_seeds():
    h, w = 64, 128
    depth, normal, cam = _scene(h, w, seed=3)
    cfg = AOConfig(spp=4, distance=0.2, window_ky=16, animated_noise=False)
    a = np.asarray(hbao_fused(depth, normal, cam, 5, cfg))
    b = np.asarray(hbao_fused(depth, normal, cam, 9, cfg))
    np.testing.assert_array_equal(a, b)


def test_fused_sharded_equality():
    """Row-sharded fused HBAO equals the single-chip kernel exactly
    (same kernel on halo-extended blocks; noise re-based per shard)."""
    import jax
    from realism_effects_tpu.parallel import context as par_ctx
    from realism_effects_tpu.parallel.sharding import make_mesh

    h, w = 128, 128
    depth, normal, cam = _scene(h, w, seed=5)
    cfg = AOConfig(spp=4, distance=0.3, window_ky=8)

    single = np.asarray(
        jax.jit(lambda d, nn: hbao_fused(d, nn, cam, 2, cfg))(depth, normal)
    )

    n = min(4, len(jax.devices()))
    mesh = make_mesh(jax.devices()[:n])
    with par_ctx.mesh_context(mesh):
        sharded = np.asarray(
            jax.jit(lambda d, nn: hbao_fused(d, nn, cam, 2, cfg))(
                depth, normal
            )
        )
    # interpret-mode fallback can still fuse jit programs differently
    # across mesh shapes on CPU; on TPU the Mosaic kernel is the same
    # per-block program. Allow ULP-level slack.
    np.testing.assert_allclose(sharded, single, atol=2e-6, rtol=2e-6)
