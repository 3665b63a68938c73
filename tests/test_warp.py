"""Parity tests for the Pallas bounded-window warp kernel.

The kernel (ops/pallas/warp.py) must match its jnp oracle bit-for-bit:
on TPU it was measured exact (maxerr 0.0 across modes at 1080p); these
run the interpret path on CPU over adversarial target patterns
(window edges, frame corners, out-of-window, fractional footprints).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from realism_effects_tpu.ops.pallas import warp


def _mk_case(rng, h, w, c, spread_y, spread_x, wild_frac=0.02):
    tex = jnp.asarray(rng.standard_normal((h, w, c)), jnp.float32)
    ys = np.arange(h)[:, None] + rng.integers(-spread_y, spread_y + 1, (h, w))
    xs = np.arange(w)[None, :] + rng.integers(-spread_x, spread_x + 1, (h, w))
    wild = rng.random((h, w)) < wild_frac
    ys = np.where(wild, rng.integers(-9, h + 9, (h, w)), ys)
    xs = np.where(wild, rng.integers(-9, w + 9, (h, w)), xs)
    ty = jnp.asarray(ys, jnp.int32)
    tx = jnp.asarray(xs, jnp.int32)
    fy = jnp.asarray(rng.random((h, w)), jnp.float32)
    fx = jnp.asarray(rng.random((h, w)), jnp.float32)
    return tex, ty, tx, fy, fx


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "catrom", "catrom5"])
@pytest.mark.parametrize("ky", [2, 8])
def test_window_warp_matches_oracle(mode, ky):
    rng = np.random.default_rng(hash((mode, ky)) % 2**31)
    # non-multiple-of-block shapes exercise the padding path
    tex, ty, tx, fy, fx = _mk_case(rng, 150, 290, 3, ky + 4, 140)
    kw = {} if mode == "nearest" else dict(fy=fy, fx=fx)
    val, ok = warp.window_warp(tex, ty, tx, ky=ky, mode=mode, **kw)
    rval, rok = warp.window_warp_ref(tex, ty, tx, ky=ky, mode=mode, **kw)
    np.testing.assert_allclose(np.asarray(val), np.asarray(rval), atol=1e-6)
    assert bool(jnp.all(ok == rok))


def test_window_warp_single_channel_and_identity():
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.standard_normal((96, 160)), jnp.float32)
    ys = jnp.asarray(np.arange(96)[:, None] + np.zeros((96, 160), np.int64),
                     jnp.int32)
    xs = jnp.asarray(np.arange(160)[None, :] + np.zeros((96, 160), np.int64),
                     jnp.int32)
    val, ok = warp.window_warp(tex, ys, xs, mode="nearest")
    assert val.shape == (96, 160)
    np.testing.assert_array_equal(np.asarray(val), np.asarray(tex))
    assert bool(jnp.all(ok))


def test_bilinear_window_matches_sample_bilinear_in_window():
    """uv-level wrapper vs core.sampling.sample_bilinear on in-window uvs."""
    from realism_effects_tpu.core.sampling import sample_bilinear

    rng = np.random.default_rng(5)
    h, w = 120, 256
    tex = jnp.asarray(rng.standard_normal((h, w, 2)), jnp.float32)
    base = np.stack(
        np.meshgrid((np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h),
        axis=-1,
    )
    off = rng.uniform(-3.0, 3.0, (h, w, 2)) / np.asarray([w, h])
    uv = jnp.asarray(np.clip(base + off, 0.0, 1.0), jnp.float32)
    got, ok = warp.bilinear_window(tex, uv, ky=8)
    want = sample_bilinear(tex, uv)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_catmull_rom5_window_matches_reference_5tap():
    """catrom5 == core.sampling.sample_catmull_rom_5tap(half=True) for
    in-window uvs, INCLUDING frame-border footprints (the expansion's
    per-tap clamp must reproduce the 5 clamped bilinear taps)."""
    from realism_effects_tpu.core.sampling import sample_catmull_rom_5tap

    rng = np.random.default_rng(11)
    h, w = 120, 256
    tex = jnp.asarray(rng.standard_normal((h, w, 4)).astype(np.float32))
    base = np.stack(
        np.meshgrid((np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h),
        axis=-1,
    )
    off = rng.uniform(-6.0, 6.0, (h, w, 2)) / np.asarray([w, h])
    # unclamped: borders reproject slightly out of frame like real TAA
    uv = jnp.asarray(base + off, jnp.float32)
    got, ok = warp.catmull_rom5_window(tex, uv, ky=8)
    want = sample_catmull_rom_5tap(tex, uv, half=True)
    assert bool(jnp.all(ok))
    # f32 reassociation: the expansion sums 12 weighted texels in a
    # different order than the 5 bilinear taps
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("c", [1, 4])
def test_window_warp_multi_matches_single_oracle(c):
    rng = np.random.default_rng(23 + c)
    h, w, n, ky = 100, 200, 5, 4
    shape = (h, w) if c == 1 else (h, w, c)
    tex = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ys = np.arange(h)[None, :, None] + rng.integers(-7, 8, (n, h, w))
    xs = np.arange(w)[None, None, :] + rng.integers(-140, 141, (n, h, w))
    ty = jnp.asarray(ys, jnp.int32)
    tx = jnp.asarray(xs, jnp.int32)
    vals, flags = warp.window_warp_multi(tex, ty, tx, ky=ky)
    for t in range(n):
        rv, rf = warp.window_warp_ref(tex, ty[t], tx[t], ky=ky,
                                      mode="nearest")
        np.testing.assert_array_equal(np.asarray(vals[t]), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(flags[t]), np.asarray(rf))


def test_temporal_reproject_window_path_equality():
    """The production window-warp path of ops.temporal_reproject equals
    the gather path exactly when every reprojection displacement is
    inside the window (the common case: TRAA camera motion of a few
    pixels per frame)."""
    from realism_effects_tpu.core.camera import PerspectiveCamera
    from realism_effects_tpu.core.framebuffers import VelocityBuffer
    from realism_effects_tpu.ops import temporal_reproject as tr

    h, w = 48, 64
    rng = np.random.default_rng(17)
    cam = PerspectiveCamera(50, w / h, 0.1, 80)
    cam.set_position(0.5, 1.6, 4.2)
    cam.look_at((0, 0.5, 0))
    prev = PerspectiveCamera(50, w / h, 0.1, 80)
    prev.set_position(0.52, 1.61, 4.21)
    prev.look_at((0, 0.5, 0))
    cfg = tr.TemporalReprojectConfig(
        texture_count=1, log_transform=True, reproject_specular=(False,),
        neighborhood_clamp=(True,), confidence_power=4.0,
    )
    nrm = np.array([0.15, 0.2, 0.95]) + rng.uniform(-0.02, 0.02, (h, w, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    vel = VelocityBuffer(
        velocity=jnp.asarray(
            rng.uniform(-2.5, 2.5, (h, w, 2)) / np.asarray([w, h]),
            jnp.float32),
        normal=jnp.asarray(nrm, jnp.float32),
        depth=jnp.asarray(rng.uniform(0.5, 0.98, (h, w)), jnp.float32),
    )
    inputs = [jnp.asarray(rng.random((h, w, 4)), jnp.float32)]
    history = [jnp.asarray(rng.random((h, w, 4)) * 2.0, jnp.float32)]
    kw = dict(max_blend=0.9, neighborhood_clamp_intensity=1.0,
              full_accumulate=False, keep_data=1.0)

    args = (inputs, history, vel, vel, cam.matrices(), prev.matrices(), cfg)
    old = tr.USE_WINDOW_WARP
    try:
        tr.USE_WINDOW_WARP = True
        got = tr.temporal_reproject(*args, **kw)
        tr.USE_WINDOW_WARP = False
        want = tr.temporal_reproject(*args, **kw)
    finally:
        tr.USE_WINDOW_WARP = old
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), atol=2e-4)


def test_hbao_window_path_equality():
    """HBAO's window-warp depth taps equal the gather path when every
    tap displacement stays inside the window: small AO distance on a
    mid-distance surface keeps projected offsets to a few pixels."""
    from realism_effects_tpu.core.camera import PerspectiveCamera
    from realism_effects_tpu.ops import ao

    h, w = 64, 96
    rng = np.random.default_rng(31)
    cam = PerspectiveCamera(50, w / h, 0.1, 80)
    cam.set_position(0, 1.5, 5.0)
    cam.look_at((0, 0.5, 0))
    m = cam.matrices()
    depth = jnp.asarray(0.9 + 0.02 * rng.random((h, w)), jnp.float32)
    nrm = np.array([0.1, 0.2, 0.97]) + rng.uniform(-0.05, 0.05, (h, w, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    normal = jnp.asarray(nrm, jnp.float32)
    cfg = ao.AOConfig(spp=8, distance=0.05, window_ky=32)

    old = ao.USE_WINDOW_WARP
    old_fused = ao.USE_FUSED_KERNEL
    try:
        # the fully-fused kernel is pinned separately (test_ao_fused.py,
        # ULP-tolerance); this fixture asserts the jnp window path exact
        ao.USE_FUSED_KERNEL = False
        ao.USE_WINDOW_WARP = True
        _, got = ao.hbao(depth, normal, m, 3, cfg)
        ao.USE_WINDOW_WARP = False
        _, want = ao.hbao(depth, normal, m, 3, cfg)
    finally:
        ao.USE_WINDOW_WARP = old
        ao.USE_FUSED_KERNEL = old_fused
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_catmull_rom_window_matches_true_4x4():
    """uv wrapper equals a dense 4x4 Catmull-Rom evaluation (in-window,
    interior so no clamping enters)."""
    rng = np.random.default_rng(7)
    h, w = 96, 160
    tex = jnp.asarray(rng.standard_normal((h, w, 4)), jnp.float32)
    base = np.stack(
        np.meshgrid((np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h),
        axis=-1,
    )
    off = rng.uniform(-2.0, 2.0, (h, w, 2)) / np.asarray([w, h])
    uv = np.clip(base + off, 8.0 / np.asarray([w, h]), 1.0 - 8.0 / np.asarray([w, h]))
    uv = jnp.asarray(uv, jnp.float32)
    got, ok = warp.catmull_rom_window(tex, uv, ky=8)
    assert bool(jnp.all(ok))

    # dense reference
    x = np.asarray(uv[..., 0]) * w - 0.5
    y = np.asarray(uv[..., 1]) * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0).astype(np.float32)
    fy = (y - y0).astype(np.float32)

    def crw(f):
        f2, f3 = f * f, f * f * f
        w0 = f2 - 0.5 * (f3 + f)
        w1 = 1.5 * f3 - 2.5 * f2 + 1.0
        w3 = 0.5 * (f3 - f2)
        return [w0, w1, 1.0 - w0 - w1 - w3, w3]

    wx = crw(fx)
    wy = crw(fy)
    texn = np.asarray(tex)
    want = np.zeros((h, w, 4), np.float32)
    for b, bo in enumerate((-1, 0, 1, 2)):
        row = np.zeros((h, w, 4), np.float32)
        for k, ko in enumerate((-1, 0, 1, 2)):
            row += texn[np.clip(y0 + bo, 0, h - 1),
                        np.clip(x0 + ko, 0, w - 1)] * wx[k][..., None]
        want += row * wy[b][..., None]
    want = np.maximum(want, 0.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
