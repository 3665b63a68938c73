"""Numpy transliteration parity fixture for K4/K5 (temporal reprojection).

Line-by-line port of
`/root/reference/src/temporal-reproject/shader/temporal_reproject.frag`
(accumulate/reproject/main) and `shader/reproject.frag` (disocclusion
checks, hit-point reprojection, Catmull-Rom 5-tap, log transform, AABB
clamp), evaluated against ``ops.temporal_reproject.temporal_reproject``
on shared random inputs with a genuinely moved camera.

Documented stand-ins (same on both sides): fwidth = forward differences
with edge replication (no GPU quad derivatives); clamp-to-edge sampling.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.core.framebuffers import VelocityBuffer
from realism_effects_tpu.ops import temporal_reproject as tr_mod
from realism_effects_tpu.ops.temporal_reproject import (
    TemporalReprojectConfig, temporal_reproject,
)


@pytest.fixture(autouse=True)
def _pin_gather_path(monkeypatch):
    """This fixture transliterates the GLSL's unbounded gathers, so it
    pins the gather fetch path; the production window-warp path (which
    treats beyond-window displacements as disocclusions — here the
    random-ray hit-point reprojection scatters arbitrarily far) is
    pinned equal to it for bounded motion by
    tests/test_warp.py::test_temporal_reproject_window_path_equality."""
    monkeypatch.setattr(tr_mod, "USE_WINDOW_WARP", False)

H, W = 32, 28

PLANE_DISTANCE, WORLD_DISTANCE, NORMAL_DISTANCE = 20.0, 10.0, 1.0


# --- reproject.frag helpers ------------------------------------------------

def np_screen_to_world(uv, depth, cam_world, proj_inv):
    """reproject.frag:21-28."""
    ndc = np.stack([
        (uv[..., 0] - 0.5) * 2.0, (uv[..., 1] - 0.5) * 2.0,
        (depth - 0.5) * 2.0, np.ones_like(depth)], -1)
    clip = np.einsum("ij,...j->...i", proj_inv, ndc)
    clip = clip / clip[..., 3:4]
    view = np.einsum("ij,...j->...i", cam_world, clip)
    return view[..., :3]


def np_fwidth(v):
    dx = np.abs(np.diff(v, axis=1, append=v[:, -1:]))
    dy = np.abs(np.diff(v, axis=0, append=v[-1:]))
    return dx + dy


def np_nearest(tex, uv):
    h, w = tex.shape[:2]
    ix = np.clip(np.floor(uv[..., 0] * w).astype(int), 0, w - 1)
    iy = np.clip(np.floor(uv[..., 1] * h).astype(int), 0, h - 1)
    return tex[iy, ix]


def np_catmull_rom_5tap(tex, P):
    """reproject.frag:212-255 (BiCubicCatmullRom5Tap)."""
    h, w = tex.shape[:2]
    inv = np.array([1.0 / w, 1.0 / h])
    UV = P / inv
    tc = np.floor(UV - 0.5) + 0.5
    f = UV - tc
    f2, f3 = f * f, f * f * f
    w0 = f2 - 0.5 * (f3 + f)
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w3 = 0.5 * (f3 - f2)
    w2 = 1.0 - w0 - w1 - w3
    Weight = [w0, w1 + w2, w3]
    Sample = [(tc - 1.0) * inv,
              (tc + w2 / Weight[1]) * inv,
              (tc + 2.0) * inv]
    sw = [Weight[1][..., 0] * Weight[0][..., 1],
          Weight[0][..., 0] * Weight[1][..., 1],
          Weight[1][..., 0] * Weight[1][..., 1],
          Weight[2][..., 0] * Weight[1][..., 1],
          Weight[1][..., 0] * Weight[2][..., 1]]

    def bil(uv):
        x = uv[..., 0] * w - 0.5
        y = uv[..., 1] * h - 0.5
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        fx, fy = (x - x0)[..., None], (y - y0)[..., None]
        cl = lambda yy, xx: tex[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)]
        c00, c01 = cl(y0, x0), cl(y0, x0 + 1)
        c10, c11 = cl(y0 + 1, x0), cl(y0 + 1, x0 + 1)
        top = c00 + (c01 - c00) * fx
        bot = c10 + (c11 - c10) * fx
        return top + (bot - top) * fy

    taps = [
        bil(np.stack([Sample[1][..., 0], Sample[0][..., 1]], -1)) * sw[0][..., None],
        bil(np.stack([Sample[0][..., 0], Sample[1][..., 1]], -1)) * sw[1][..., None],
        bil(np.stack([Sample[1][..., 0], Sample[1][..., 1]], -1)) * sw[2][..., None],
        bil(np.stack([Sample[2][..., 0], Sample[1][..., 1]], -1)) * sw[3][..., None],
        bil(np.stack([Sample[1][..., 0], Sample[2][..., 1]], -1)) * sw[4][..., None],
    ]
    total = sum(taps)
    wsum = sum(sw)
    return np.maximum(total / wsum[..., None], 0.0)


def np_neighborhood_clamp(inputs_rgb_a, color, input_color_raw, radius, log):
    """reproject.frag:53-95 (getNeighborhoodAABB + clampNeighborhood).

    ``inputs_rgb_a``: raw (H, W, 4) input texture (r < 0 = unsampled);
    ``color``: transformed accumulated color; ``input_color_raw``: the
    *raw* (untransformed) input color seeding the AABB.
    """
    h, w = inputs_rgb_a.shape[:2]
    mn = input_color_raw.copy()
    mx = input_color_raw.copy()
    pad_rgb = np.pad(inputs_rgb_a[..., :3],
                     ((radius, radius), (radius, radius), (0, 0)), mode="edge")
    pad_r = np.pad(inputs_rgb_a[..., 0],
                   ((radius, radius), (radius, radius)), mode="edge")
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            t = pad_rgb[radius + dy: radius + dy + h,
                        radius + dx: radius + dx + w]
            valid = (pad_r[radius + dy: radius + dy + h,
                           radius + dx: radius + dx + w] >= 0.0)[..., None]
            mn = np.where(valid, np.minimum(t, mn), mn)
            mx = np.where(valid, np.maximum(t, mx), mx)
    tr = (lambda c: np.log(c + 1.0)) if log else (lambda c: c)
    return np.clip(color, tr(mn), tr(mx))


def np_temporal_reproject(inputs, history, vel_buf, last_vel_buf, cam,
                          prev_cam, cfg, max_blend, clamp_intensity_u,
                          full_accumulate, keep_data, roughness_tex=None):
    """temporal_reproject.frag main + reproject.frag, vectorized."""
    h, w = vel_buf["depth"].shape
    ys, xs = np.mgrid[0:h, 0:w]
    uv = np.stack([(xs + 0.5) / w, (ys + 0.5) / h], -1)
    log = cfg.log_transform
    tr = (lambda c: np.log(c + 1.0)) if log else (lambda c: c)
    untr = (lambda c: np.exp(c) - 1.0) if log else (lambda c: c)

    near, far = float(cam.near), float(cam.far)
    vel = vel_buf["velocity"]
    world_normal = vel_buf["normal"]
    depth = vel_buf["depth"]
    curvature = np.linalg.norm(np_fwidth(world_normal), axis=-1)
    world_pos = np_screen_to_world(
        uv, depth, np.asarray(cam.camera_matrix_world, np.float64),
        np.asarray(cam.projection_matrix_inverse, np.float64))

    if cfg.input_type == "diffuse_specular":
        ray_length = inputs[1][..., 3]
        roughness = np.clip(inputs[0][..., 3], 0.0, 1.0)
    elif cfg.input_type == "specular":
        ray_length = inputs[0][..., 3]
        roughness = np.clip(roughness_tex, 0.0, 1.0)
    else:
        ray_length = np.zeros_like(depth)
        roughness = np.ones_like(depth)

    move_factor = np.minimum(np.sum(vel * vel, -1) * 10000.0, 1.0)

    def validate(reproj_uv):
        """reproject.frag:130-167 (validateReprojectedUV)."""
        in_bounds = ((reproj_uv[..., 0] >= 0) & (reproj_uv[..., 0] <= 1)
                     & (reproj_uv[..., 1] >= 0) & (reproj_uv[..., 1] <= 1))
        last_normal = np_nearest(last_vel_buf["normal"], reproj_uv)
        last_depth = np_nearest(last_vel_buf["depth"], reproj_uv)
        last_world_pos = np_screen_to_world(
            reproj_uv, last_depth,
            np.asarray(prev_cam.camera_matrix_world, np.float64),
            np.asarray(prev_cam.projection_matrix_inverse, np.float64))
        view_z = np.abs((near * far) / ((far - near) * depth - far))
        dist_factor = 1.0 + 1.0 / (view_z + 1.0)
        to_cur = world_pos - last_world_pos
        disoccl = np.linalg.norm(to_cur, axis=-1) / WORLD_DISTANCE * dist_factor
        disoccl = disoccl + np.abs(
            np.sum(to_cur * world_normal, -1)) / PLANE_DISTANCE * dist_factor
        disoccl = disoccl + np.minimum(
            1.0 - np.sum(world_normal * last_normal, -1), 1.0
        ) / NORMAL_DISTANCE * dist_factor
        conf = np.maximum(1.0 - np.minimum(disoccl, 1.0), 0.0)
        conf = conf ** cfg.confidence_power
        return np.where(in_bounds, conf, 0.0)

    diffuse_uv = uv - vel
    diffuse_conf = validate(diffuse_uv)

    # reprojectHitPoint (reproject.frag:169-193)
    cam_pos = np.asarray(cam.position, np.float64)
    cam_ray = world_pos - cam_pos
    cam_ray /= np.linalg.norm(cam_ray, axis=-1, keepdims=True)
    hit_point = cam_pos + cam_ray * ray_length[..., None]
    PV = (np.asarray(prev_cam.projection_matrix, np.float64)
          @ np.asarray(prev_cam.view_matrix, np.float64))
    homo = np.concatenate([hit_point, np.ones_like(hit_point[..., :1])], -1)
    clip = np.einsum("ij,...j->...i", PV, homo)
    hit_uv = clip[..., :2] / clip[..., 3:4] * 0.5 + 0.5
    hit_valid = (curvature <= 0.05) & (ray_length >= 0.01)
    spec_conf_raw = validate(hit_uv)
    specular_uv = np.where(hit_valid[..., None], hit_uv, diffuse_uv)
    specular_conf = np.where(hit_valid, spec_conf_raw, diffuse_conf)

    outputs = []
    for i in range(cfg.texture_count):
        is_spec = cfg.reproject_specular[i]
        reproj_uv = specular_uv if is_spec else diffuse_uv
        confidence = specular_conf if is_spec else diffuse_conf

        inp = inputs[i]
        sampled = inp[..., 0] >= 0.0
        inp_rgb = tr(np.maximum(inp[..., :3], 0.0))

        # history is rgba16f storage (`TemporalReprojectPass.js:141-144`)
        acc = np_catmull_rom_5tap(
            history[i].astype(np.float16).astype(np.float64), reproj_uv)
        acc_rgb = tr(acc[..., :3])
        acc_rgb_pre = acc_rgb.copy()
        acc_a = acc[..., 3] + 1.0

        if is_spec:
            c1 = np_neighborhood_clamp(inp, acc_rgb, untr(inp_rgb), 1, log)
            c2 = np_neighborhood_clamp(inp, acc_rgb, untr(inp_rgb), 2, log)
            clamped = np.where((roughness < 0.25)[..., None], c1, c2)
        else:
            clamped = np_neighborhood_clamp(inp, acc_rgb, untr(inp_rgb), 2, log)

        r = roughness if is_spec else np.ones_like(roughness)
        clamp_aggr = np.minimum(1.0, confidence * r)
        ci = np.minimum(1.0, move_factor * 50.0 + clamp_intensity_u) * clamp_aggr
        new_rgb = acc_rgb + (clamped - acc_rgb) * ci[..., None]
        color_diff = np.minimum(np.linalg.norm(new_rgb - acc_rgb, axis=-1), 1.0)
        acc_a = acc_a * (1.0 - color_diff)
        acc_rgb = new_rgb

        inp_rgb = np.where(sampled[..., None], inp_rgb, acc_rgb_pre)
        acc_rgb = np.where(sampled[..., None], acc_rgb, acc_rgb_pre)
        acc_a = np.where(sampled, acc_a, acc[..., 3])

        conf2 = confidence ** cfg.confidence_power
        accum_blend = (1.0 - 1.0 / (acc_a + 1.0)) * conf2
        max_value = (1.0 if full_accumulate else max_blend) * keep_data
        if cfg.input_type != "diffuse" and is_spec:
            low = (roughness >= 0.0) & (roughness < 0.1)
            max_r = max_value * (roughness / 0.1)
            gated = max_value + (max_r - max_value) * np.minimum(
                100.0 * move_factor, 1.0)
            max_value = np.where(low, gated, np.full_like(roughness, max_value))
        else:
            max_value = np.full_like(roughness, max_value)
        t = np.minimum(accum_blend, max_value)
        out_a = np.minimum(1.0 / (1.0 - t) - 1.0, 65536.0)
        out_rgb = untr(inp_rgb + (acc_rgb - inp_rgb) * t[..., None])
        outputs.append(np.concatenate([out_rgb, out_a[..., None]], -1))
    return outputs


# --- the test ---------------------------------------------------------------

def _cams():
    cam = PerspectiveCamera(50, W / H, 0.1, 80)
    cam.set_position(0.5, 1.6, 4.2)
    cam.look_at((0, 0.5, 0))
    prev = PerspectiveCamera(50, W / H, 0.1, 80)
    prev.set_position(0.62, 1.55, 4.28)   # genuinely moved camera
    prev.look_at((0.02, 0.5, 0))
    return cam.matrices(), prev.matrices()


def _vel_buf(rng, smooth_normals=True):
    if smooth_normals:
        base = np.array([0.15, 0.2, 0.95])
        nrm = base + rng.uniform(-0.02, 0.02, size=(H, W, 3))
    else:
        nrm = rng.uniform(-1, 1, size=(H, W, 3))
    nrm = nrm / np.linalg.norm(nrm, axis=-1, keepdims=True)
    return {
        "velocity": rng.uniform(-0.02, 0.02, size=(H, W, 2)),
        "normal": nrm,
        "depth": rng.uniform(0.5, 0.98, size=(H, W)),
    }


def _to_jax_vel(d):
    return VelocityBuffer(
        velocity=jnp.asarray(d["velocity"], jnp.float32),
        normal=jnp.asarray(d["normal"], jnp.float32),
        depth=jnp.asarray(d["depth"], jnp.float32),
    )


def _compare(cfg, inputs, history, vel, last_vel, cam, prev_cam, kw,
             roughness_tex=None):
    expected = np_temporal_reproject(
        inputs, history, vel, last_vel, cam, prev_cam, cfg,
        max_blend=kw["max_blend"],
        clamp_intensity_u=kw["neighborhood_clamp_intensity"],
        full_accumulate=kw["full_accumulate"], keep_data=kw["keep_data"],
        roughness_tex=roughness_tex,
    )
    out = temporal_reproject(
        [jnp.asarray(x, jnp.float32) for x in inputs],
        [jnp.asarray(x, jnp.float32) for x in history],
        _to_jax_vel(vel), _to_jax_vel(last_vel), cam, prev_cam, cfg,
        roughness_tex=(None if roughness_tex is None
                       else jnp.asarray(roughness_tex, jnp.float32)),
        **kw,
    )
    for o, e in zip(out, expected):
        d = np.abs(np.asarray(o) - e)
        # f32 vs f64 through catmull/log/pow chains; disocclusion edges
        # are sensitive, so pin quantiles + a loose max
        assert np.quantile(d, 0.995) < 2e-3, float(np.quantile(d, 0.995))
        assert d.max() < 0.15, float(d.max())
        assert d.mean() < 2e-4, float(d.mean())


class TestTemporalReprojectParity:
    def test_traa_config(self):
        """TRAA: 1 diffuse texture, log transform, confidencePower 4."""
        rng = np.random.default_rng(10)
        cfg = TemporalReprojectConfig(
            texture_count=1, log_transform=True,
            reproject_specular=(False,), neighborhood_clamp=(True,),
            confidence_power=4.0, input_type="diffuse")
        inputs = [rng.uniform(size=(H, W, 4))]
        history = [rng.uniform(size=(H, W, 4)) * [1, 1, 1, 30]]
        cam, prev_cam = _cams()
        vel = _vel_buf(rng)
        last_vel = _vel_buf(rng)
        _compare(cfg, inputs, history, vel, last_vel, cam, prev_cam,
                 dict(max_blend=0.9, neighborhood_clamp_intensity=1.0,
                      full_accumulate=False, keep_data=1.0))

    def test_ssgi_diffuse_specular_config(self):
        """SSGI denoiser: 2 MRT textures, specular hit-point reprojection,
        unsampled pixels (r < 0), roughness/rayLength alphas."""
        rng = np.random.default_rng(11)
        cfg = TemporalReprojectConfig(
            texture_count=2, log_transform=True,
            reproject_specular=(False, True),
            neighborhood_clamp=(True, True),
            confidence_power=0.75, input_type="diffuse_specular")
        diffuse = rng.uniform(size=(H, W, 4))
        diffuse[..., 3] = rng.uniform(size=(H, W))        # roughness
        diffuse[5:9, :, 0] = -1.0                          # unsampled rows
        specular = rng.uniform(size=(H, W, 4))
        specular[..., 3] = rng.uniform(0.0, 3.0, size=(H, W))  # rayLength
        history = [rng.uniform(size=(H, W, 4)) * [1, 1, 1, 12],
                   rng.uniform(size=(H, W, 4)) * [1, 1, 1, 12]]
        cam, prev_cam = _cams()
        vel = _vel_buf(rng)
        last_vel = _vel_buf(rng)
        _compare(cfg, [diffuse, specular], history, vel, last_vel,
                 cam, prev_cam,
                 dict(max_blend=1.0, neighborhood_clamp_intensity=0.5,
                      full_accumulate=False, keep_data=1.0))

    def test_reset_and_full_accumulate(self):
        """keepData=0 discards history; fullAccumulate lifts the cap."""
        rng = np.random.default_rng(12)
        cfg = TemporalReprojectConfig(
            texture_count=1, log_transform=False,
            reproject_specular=(False,), neighborhood_clamp=(True,),
            confidence_power=1.0, input_type="diffuse")
        inputs = [rng.uniform(size=(H, W, 4))]
        history = [rng.uniform(size=(H, W, 4)) * [1, 1, 1, 50]]
        cam, prev_cam = _cams()
        vel = _vel_buf(rng)
        vel["velocity"][:] = 0.0
        last_vel = vel
        for kw in (
            dict(max_blend=0.9, neighborhood_clamp_intensity=1.0,
                 full_accumulate=False, keep_data=0.0),
            dict(max_blend=0.9, neighborhood_clamp_intensity=1.0,
                 full_accumulate=True, keep_data=1.0),
        ):
            _compare(cfg, inputs, history, vel, last_vel, cam, prev_cam, kw)
