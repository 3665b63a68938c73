"""Per-kernel numeric parity fixtures for the AO kernels (K8/K9).

Hand transliterations of `/root/reference/src/hbao/shader/hbao.frag:21-96`
(+ `hbao_utils.glsl`) and `/root/reference/src/gtao/shader/gtao.frag:77-125`
into plain numpy, evaluated on a real 32x32 rasterized depth buffer and
compared against ``ops.ao.hbao`` / ``ops.ao.gtao`` with identical
blue-noise inputs. Differences from undefined GLSL behavior are pinned to
the implementation's documented choices: clamp-to-edge for out-of-range
fetches, NEAREST depth filtering (three.js DepthTexture default on the
composer depth target, `AOEffect.js:44`), ao=1 where the shader discards
(background).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.core.rng import blue_noise_image
from realism_effects_tpu.ops import ao as ao_mod
from realism_effects_tpu.ops.ao import VOGEL16, AOConfig, gtao, hbao


@pytest.fixture(autouse=True)
def _pin_gather_path(monkeypatch):
    """This fixture transliterates the GLSL's unbounded depth taps, so it
    pins the gather fetch path; the production window-warp path (which
    clamps tap displacement to the window, a screen-space radius clamp)
    is pinned equal to it for bounded taps by
    tests/test_warp.py::test_hbao_window_path_equality."""
    monkeypatch.setattr(ao_mod, "USE_WINDOW_WARP", False)
from realism_effects_tpu.scene.geometry import (
    Material, make_box, make_plane, translation,
)
from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer
from realism_effects_tpu.scene.scene import Scene

H = W = 32


# --- numpy transliteration of the GLSL ---------------------------------

def np_get_world_pos(depth, coord, proj_inv, cam_world):
    """hbao_utils.glsl:19-29 (getWorldPos)."""
    z = depth * 2.0 - 1.0
    clip = np.stack(
        [coord[..., 0] * 2.0 - 1.0, coord[..., 1] * 2.0 - 1.0, z,
         np.ones_like(z)], -1)
    view = clip @ proj_inv.T
    world = view @ cam_world.T
    return world[..., :3] / world[..., 3:4]


def np_cosine_sample_hemisphere(n, u):
    """hbao_utils.glsl:84-93 (cosineSampleHemisphere)."""
    r = np.sqrt(u[..., 0])
    theta = 2.0 * np.pi * u[..., 1]
    ref = np.array([0.0, 1.0, 1.0])
    b = np.cross(n, ref)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    t = np.cross(b, n)
    d = (r * np.sin(theta))[..., None] * b \
        + np.sqrt(1.0 - u[..., 0])[..., None] * n \
        + (r * np.cos(theta))[..., None] * t
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def np_bilinear(tex, uv):
    """textureLod on a linear-filtered clamp-to-edge texture."""
    h, w = tex.shape[:2]
    # background pixels project to non-finite uv; clamp like the GL
    # sampler would (they are masked out of the final image anyway)
    uv = np.nan_to_num(uv, nan=0.0, posinf=1.0, neginf=0.0)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx, fy = x - x0, y - y0
    cl = lambda yy, xx: tex[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)]
    c00, c01 = cl(y0, x0), cl(y0, x0 + 1)
    c10, c11 = cl(y0 + 1, x0), cl(y0 + 1, x0 + 1)
    if tex.ndim == 3:
        fx, fy = fx[..., None], fy[..., None]
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def np_nearest(tex, uv):
    """textureLod on a NEAREST-filtered clamp-to-edge texture (the
    composer depth texture bound at `AOEffect.js:44` is a three.js
    DepthTexture, nearest by default)."""
    h, w = tex.shape[:2]
    uv = np.nan_to_num(uv, nan=0.0, posinf=1.0, neginf=0.0)
    ix = np.clip(np.floor(uv[..., 0] * w).astype(int), 0, w - 1)
    iy = np.clip(np.floor(uv[..., 1] * h).astype(int), 0, h - 1)
    return tex[iy, ix]


def np_texel_fetch(tex, ix, iy):
    h, w = tex.shape[:2]
    return tex[np.clip(iy, 0, h - 1), np.clip(ix, 0, w - 1)]


def np_compute_world_normal(depth, uv, proj_inv, cam_world):
    """gtao.frag:34-55 (computeWorldNormal), clamp-to-edge.

    ``texelFetch`` at an out-of-range ``ivec2(uv * size)`` is undefined
    GLSL behavior; the pinned choice (matching ops.ao) is to clamp the
    snapped texel into range FIRST, then apply clamped stencil offsets —
    which also agrees with the reference's trunc-toward-zero ``ivec2``
    cast for slightly-negative uv."""
    h, w = depth.shape
    uv = np.nan_to_num(uv, nan=0.0, posinf=1.0, neginf=0.0)
    px = np.clip(np.floor(uv[..., 0] * w).astype(int), 0, w - 1)
    py = np.clip(np.floor(uv[..., 1] * h).astype(int), 0, h - 1)
    f = lambda dx, dy: np_texel_fetch(depth, px + dx, py + dy)
    c0 = f(0, 0)
    l1, l2, r1, r2 = f(-1, 0), f(-2, 0), f(1, 0), f(2, 0)
    b1, b2, t1, t2 = f(0, -1), f(0, -2), f(0, 1), f(0, 2)
    dl = np.abs(2.0 * l1 - l2 - c0)
    dr = np.abs(2.0 * r1 - r2 - c0)
    db = np.abs(2.0 * b1 - b2 - c0)
    dt = np.abs(2.0 * t1 - t2 - c0)
    gwp = lambda d, c: np_get_world_pos(d, c, proj_inv, cam_world)
    pxv = np.zeros(uv.shape); pxv[..., 0] = 1.0 / w
    pyv = np.zeros(uv.shape); pyv[..., 1] = 1.0 / h
    ce = gwp(c0, uv)
    dpdx = np.where((dl < dr)[..., None],
                    ce - gwp(l1, uv - pxv), gwp(r1, uv + pxv) - ce)
    dpdy = np.where((db < dt)[..., None],
                    ce - gwp(b1, uv - pyv), gwp(t1, uv + pyv) - ce)
    n = np.cross(dpdx, dpdy)
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)


def np_hbao(depth, world_normal, cam, noises, cfg):
    """hbao.frag:21-96 (getOcclusion + main), vectorized over pixels."""
    h, w = depth.shape
    ys, xs = np.mgrid[0:h, 0:w]
    uv = np.stack([(xs + 0.5) / w, (ys + 0.5) / h], -1)
    proj_inv = np.asarray(cam.projection_matrix_inverse, np.float64)
    cam_world = np.asarray(cam.camera_matrix_world, np.float64)
    pv = np.asarray(cam.projection_matrix, np.float64) @ np.asarray(
        cam.view_matrix, np.float64)
    cam_pos = cam_world[:3, 3]

    world_pos = np_get_world_pos(depth, uv, proj_inv, cam_world)
    ao = np.zeros((h, w))
    total_weight = np.zeros((h, w))
    for noise in noises:
        sample_dir = np_cosine_sample_hemisphere(world_normal, noise[..., :2])
        sample_pos = world_pos + (
            cfg.distance * noise[..., 2] ** (cfg.distance_power + 1.0)
        )[..., None] * sample_dir

        homo = np.concatenate([sample_pos, np.ones_like(sample_pos[..., :1])], -1)
        clip = homo @ pv.T
        sample_uv = clip[..., :2] / clip[..., 3:4] * 0.5 + 0.5
        sample_depth = np_nearest(depth, sample_uv)

        delta = depth - sample_depth
        d = np.linalg.norm(sample_pos - cam_pos, axis=-1)
        delta = delta * 0.001 * d * d
        th = cfg.thickness * 0.01
        theta = np.sum(world_normal * sample_dir, -1)
        total_weight += theta

        horizon = sample_depth + delta * cfg.bias * 1000.0
        occ = np.maximum(0.0, horizon - depth) * theta
        m = np.maximum(0.0, 1.0 - delta / th)
        occ = np.sqrt(np.maximum(10.0 * occ * m / d, 0.0))
        ao += np.where(delta < th, occ, 0.0)

    ao = np.where(total_weight > 0.0, ao / np.where(
        total_weight > 0, total_weight, 1.0), ao)
    ao = np.clip(1.0 - ao, 0.0, 1.0)
    return np.where(depth >= 1.0, 1.0, ao)


def np_gtao(depth, cam, noises, n_samples=16, radius=0.25):
    """gtao.frag:77-125 (getOcclusion), vectorized over pixels."""
    h, w = depth.shape
    ys, xs = np.mgrid[0:h, 0:w]
    uv = np.stack([(xs + 0.5) / w, (ys + 0.5) / h], -1)
    proj_inv = np.asarray(cam.projection_matrix_inverse, np.float64)
    cam_world = np.asarray(cam.camera_matrix_world, np.float64)
    pv = np.asarray(cam.projection_matrix, np.float64) @ np.asarray(
        cam.view_matrix, np.float64)
    near, far = float(cam.near), float(cam.far)

    view_z = lambda d: np.abs((near * far) / ((far - near) * d - far))

    normal = np_compute_world_normal(depth, uv, proj_inv, cam_world)
    world_pos = np_get_world_pos(depth, uv, proj_inv, cam_world)
    vz = view_z(depth)

    ao = np.zeros((h, w))
    for i in range(n_samples):
        noise = noises[i]
        a = np.asarray(VOGEL16[i], np.float64) * 0.5 + 0.5
        sample_dir = np_cosine_sample_hemisphere(
            normal, np.broadcast_to(a, uv.shape))
        sample_pos = world_pos + (
            4.0 * noise[..., 0:1] * radius) * sample_dir

        homo = np.concatenate([sample_pos, np.ones_like(sample_pos[..., :1])], -1)
        clip = homo @ pv.T
        sample_uv = clip[..., :2] / clip[..., 3:4] * 0.5 + 0.5

        sample_depth = np_nearest(depth, sample_uv)
        sample_normal = np_compute_world_normal(
            depth, sample_uv, proj_inv, cam_world)
        svz = view_z(sample_depth)
        dd = np.maximum(0.0, vz - svz) ** 4.0
        t = np.clip(1.0 - dd, 0.0, 1.0)
        ao += (t * t * (3.0 - 2.0 * t)) * np.sum(normal * sample_normal, -1)

    ao = ao / float(n_samples)
    return np.where(depth >= 1.0, 1.0, np.clip(ao, 0.0, 1.0))


# --- fixture scene -------------------------------------------------------

def _depth_fixture():
    scene = Scene()
    scene.add(make_plane(10, Material()))
    box = scene.add(make_box((1.2, 1.0, 1.0), Material()))
    box.set_matrix(translation(0.2, 0.5, 0.3))
    cam = PerspectiveCamera(50, 1, 0.1, 60)
    cam.set_position(1.5, 2.0, 3.0)
    cam.look_at((0, 0.4, 0))
    m = cam.matrices()
    gb = rasterize_gbuffer(
        scene.pack(), scene.model_matrices(), m.projection_view_matrix, H, W)
    return np.asarray(gb.depth, np.float64), np.asarray(gb.normal, np.float64), m


def _noises(seeds):
    return [np.asarray(blue_noise_image(H, W, jnp.int32(s)), np.float64)
            for s in seeds]


class TestHBAOParity:
    def test_matches_frag_transliteration_gbuffer_normals(self):
        depth, normal, cam = _depth_fixture()
        cfg = AOConfig(spp=8, animated_noise=True)
        frame = 3
        seeds = [i + frame * cfg.spp for i in range(cfg.spp)]
        expected = np_hbao(depth, normal, cam, _noises(seeds), cfg)

        _, ao = hbao(jnp.asarray(depth, jnp.float32),
                     jnp.asarray(normal, jnp.float32), cam,
                     jnp.int32(frame), cfg)
        np.testing.assert_allclose(np.asarray(ao), expected, atol=5e-4)

    def test_matches_frag_transliteration_depth_normals(self):
        depth, _, cam = _depth_fixture()
        cfg = AOConfig(spp=4, animated_noise=False)
        seeds = list(range(cfg.spp))
        ys, xs = np.mgrid[0:H, 0:W]
        uv = np.stack([(xs + 0.5) / W, (ys + 0.5) / H], -1)
        proj_inv = np.asarray(cam.projection_matrix_inverse, np.float64)
        cam_world = np.asarray(cam.camera_matrix_world, np.float64)
        normal = np_compute_world_normal(depth, uv, proj_inv, cam_world)
        expected = np_hbao(depth, normal, cam, _noises(seeds), cfg)

        _, ao = hbao(jnp.asarray(depth, jnp.float32), None, cam,
                     jnp.int32(0), cfg)
        # depth-derived normals amplify f32 vs f64 rounding (second
        # differences of depth feeding a normalized cross product)
        np.testing.assert_allclose(np.asarray(ao), expected, atol=2e-3)


class TestGTAOParity:
    def test_matches_frag_transliteration(self):
        depth, _, cam = _depth_fixture()
        frame = 2
        n = 16
        seeds = [frame * n + i for i in range(n)]
        expected = np_gtao(depth, cam, _noises(seeds))

        cfg = AOConfig(spp=16, distance=2.0, animated_noise=True)
        ao = gtao(jnp.asarray(depth, jnp.float32), cam, jnp.int32(frame), cfg)
        np.testing.assert_allclose(np.asarray(ao), expected, atol=5e-4)
