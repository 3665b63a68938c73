"""Numpy transliteration parity fixture for K1 (ssgi.frag).

Line-by-line port of `/root/reference/src/ssgi/shader/ssgi.frag` main +
doSample + RayMarch + BinarySearch + getEnvColor (with the K2 helpers
from ssgi_utils.frag), asserted against ``ops.ssgi.ssgi`` on a real
rasterized G-buffer with a real environment CDF and identical blue noise.

Shared-content inputs (tested elsewhere): the env mip chain pixels and
CDF tables come from ``build_equirect_env`` (their construction is
covered by test_ssgi.py's importance-sampling statistics); the fixture
re-implements all *sampling* of them. Boolean march hits can flip at
f32/f64 thresholds on a few pixels, so assertions are quantile-based.
"""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.core.envmap import build_equirect_env, procedural_sky
from realism_effects_tpu.core.framebuffers import VelocityBuffer
from realism_effects_tpu.core.rng import blue_noise_image
from realism_effects_tpu.ops.ssgi import SSGIConfig, ssgi
from realism_effects_tpu.scene.geometry import (
    Material, make_box, make_plane, translation,
)
from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer
from realism_effects_tpu.scene.scene import Scene

from test_ao_parity import np_bilinear
from test_temporal_parity import np_nearest
from test_kernel_parity import np_onb, np_sample_ggx_vndf
from test_brdf_parity import (
    np_d_gtr, np_disney_diffuse, np_disney_specular, np_equirect_dir_to_uv,
    np_equirect_uv_to_dir, np_ggx_vndf_pdf,
)

H = W = 32
EPS = 1e-5


# --- K2 helpers not yet transliterated elsewhere ---------------------------

def np_get_view_pos(uv, depth, P, Pinv, near, far):
    """getViewZ + getViewPosition (`ssgi_utils.frag:7-24`)."""
    view_z = (near * far) / ((far - near) * depth - far)  # negative
    clip_w = P[3, 2] * view_z + P[3, 3]
    clip = np.stack([
        uv[..., 0] * 2 - 1, uv[..., 1] * 2 - 1, view_z * 2 - 1,
        np.ones_like(view_z)], -1) * clip_w[..., None]
    p = np.einsum("ij,...j->...i", Pinv, clip)[..., :3]
    p[..., 2] = view_z
    return p


def np_view_to_screen(pos, P):
    """viewSpaceToScreenSpace (`ssgi_utils.frag:26-36`)."""
    clip = np.einsum("ij,...j->...i", P, np.concatenate(
        [pos, np.ones_like(pos[..., :1])], -1))
    w = clip[..., 3:4]
    w = np.where(np.abs(w) > 1e-8, w, 1e-8)
    return clip[..., :2] / w * 0.5 + 0.5


def np_cosine_hemisphere(n, u):
    r = np.sqrt(u[..., 0])
    theta = 2 * np.pi * u[..., 1]
    b = np.cross(n, np.broadcast_to([0.0, 1.0, 1.0], n.shape))
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    t = np.cross(b, n)
    d = (r * np.sin(theta))[..., None] * b \
        + np.sqrt(1 - u[..., 0])[..., None] * n \
        + (r * np.cos(theta))[..., None] * t
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def np_lum(c):
    return c[..., 0] * 0.2125 + c[..., 1] * 0.7154 + c[..., 2] * 0.0721


def np_smoothstep(e0, e1, x):
    t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def np_trilinear_mips(mips, uv, lod):
    """textureLod over an explicit mip chain (clamp-to-edge, like the
    flat-atlas sampler)."""
    lod = np.clip(lod, 0.0, len(mips) - 1)
    l0 = np.floor(lod).astype(int)
    frac = (lod - l0)[..., None]
    out = np.zeros(uv.shape[:-1] + (mips[0].shape[-1],))
    for k in range(len(mips)):
        sel0 = (l0 == k)[..., None]
        sel1 = (np.minimum(l0 + 1, len(mips) - 1) == k)[..., None]
        if not (sel0.any() or sel1.any()):
            continue
        tap = np_bilinear(mips[k], uv)
        out = np.where(sel0, out + tap * (1 - frac), out)
        out = np.where(sel1, out + tap * frac, out)
    return out


# --- the transliteration -----------------------------------------------------

def np_ssgi(gb, vel, accumulated, direct, envd, cam, noise, cfg,
            ray_distance, thickness, env_blur):
    h, w = gb["depth"].shape
    ys, xs = np.mgrid[0:h, 0:w]
    uv = np.stack([(xs + 0.5) / w, (ys + 0.5) / h], -1)
    near, far = float(cam.near), float(cam.far)
    P = np.asarray(cam.projection_matrix, np.float64)
    Pinv = np.asarray(cam.projection_matrix_inverse, np.float64)
    Vm = np.asarray(cam.view_matrix, np.float64)
    Cw = np.asarray(cam.camera_matrix_world, np.float64)

    depth = gb["depth"]
    is_bg = depth >= 1.0
    roughness = gb["roughness"]
    metalness = gb["metalness"]
    diffuse = gb["diffuse"]
    rough_sq = np.clip(roughness * roughness, 1e-6, 1.0)

    view_pos = np_get_view_pos(uv, depth, P, Pinv, near, far)
    view_dir = view_pos / np.linalg.norm(view_pos, axis=-1, keepdims=True)
    world_normal = gb["normal"]
    view_normal = np.einsum("ji,...j->...i", Cw[:3, :3], world_normal)
    view_normal /= np.linalg.norm(view_normal, axis=-1, keepdims=True)
    world_pos = np.einsum("ij,...j->...i", Cw, np.concatenate(
        [view_pos, np.ones_like(view_pos[..., :1])], -1))[..., :3]

    n, v = view_normal, -view_dir
    nov = np.maximum(EPS, np.sum(n * v, -1))
    v_world = np.einsum("ji,...j->...i", Vm[:3, :3], v)
    T, B = np_onb(world_normal)
    to_local = lambda X: np.stack([np.sum(X * T, -1), np.sum(X * B, -1),
                                   np.sum(X * world_normal, -1)], -1)
    to_world = lambda X: (X[..., 0:1] * T + X[..., 1:2] * B
                          + X[..., 2:3] * world_normal)
    v_local = to_local(v_world)

    f0 = 0.04 + (diffuse - 0.04) * metalness[..., None]
    r1, r2, r3, r4 = (noise[..., i] for i in range(4))

    Hl = np_sample_ggx_vndf(v_local, rough_sq, rough_sq, r1, r2)
    Hl = np.where((Hl[..., 2] < 0)[..., None], -Hl, Hl)
    # reflect(-V, H) = -V - 2*dot(H, -V)*H
    refl = -v_local + 2 * np.sum(Hl * v_local, -1, keepdims=True) * Hl
    refl /= np.linalg.norm(refl, axis=-1, keepdims=True)
    l_view = np.einsum("ji,...j->...i", Cw[:3, :3], to_world(refl))
    l_view /= np.linalg.norm(l_view, axis=-1, keepdims=True)

    def angles(l):
        hvec = v + l
        hvec = hvec / np.linalg.norm(hvec, axis=-1, keepdims=True)
        cl = lambda x: np.clip(x, EPS, 1 - EPS)
        return (cl(np.sum(n * l, -1)), cl(np.sum(n * hvec, -1)),
                cl(np.sum(l * hvec, -1)), cl(np.sum(v * hvec, -1)))

    _, _, _, voh = angles(l_view)

    if cfg.mode == "ssgi":
        F = f0 + (1 - f0) * (1 - voh[..., None]) ** 5
        diff_w = np.maximum((1 - metalness) * np_lum(diffuse), EPS)
        spec_w = np.maximum(np_lum(F), EPS)
        is_diffuse = r3 < diff_w / (diff_w + spec_w)
    else:
        is_diffuse = np.zeros((h, w), bool)

    ems_pdf = np.ones((h, w))
    is_env = np.zeros((h, w), bool)
    env_mis_dir = np.zeros((h, w, 3))
    if cfg.importance_sampling and envd is not None:
        # sampleEquirectProbability (`ssgi_utils.frag:210-225`)
        marg = envd["marginal"][:, None]  # (H, 1) column texture
        vq = np_bilinear(marg, np.stack([np.zeros_like(r1), r1], -1))[..., 0] \
            if marg.ndim == 3 else np_bilinear(marg, np.stack(
                [np.zeros_like(r1), r1], -1))
        uq = np_bilinear(envd["conditional"], np.stack([r2, vq], -1))
        env_uv = np.stack([uq, vq], -1)
        env_dir_ws = np_equirect_uv_to_dir(env_uv)
        color = np_bilinear(envd["mips"][0], env_uv)
        env_pdf = (np_lum(color) / envd["total_sum"]) \
            * envd["mips"][0].shape[0] * envd["mips"][0].shape[1]
        env_mis_dir = np.einsum("ji,...j->...i", Cw[:3, :3], env_dir_ws)
        env_mis_dir /= np.linalg.norm(env_mis_dir, axis=-1, keepdims=True)
        prob = np.minimum(1 - EPS,
                          np.sum(env_mis_dir * view_normal, -1) * roughness)
        is_env = r4 < prob
        ems_pdf = np.where(is_env, env_pdf / np.maximum(1 - prob, EPS),
                           1 - prob)
        ems_pdf = np.maximum(ems_pdf, EPS)

    cos_hemi = np_cosine_hemisphere(view_normal, np.stack([r1, r2], -1))
    diffuse_ray = np.where(is_env[..., None], env_mis_dir, cos_hemi)
    specular_ray = np.where(is_env[..., None], env_mis_dir, l_view)

    def ray_march(l):
        """RayMarch + BinarySearch (`ssgi.frag:440-503`), lane-masked."""
        step_dir = l * (ray_distance / float(cfg.steps))
        hit = np.zeros((h, w), bool)
        hit_pos = view_pos.copy()
        cur_uv = np_view_to_screen(view_pos, P)
        for i in range(1, cfg.steps):
            cs = 1.0 - np.exp(-0.25 * (i + r3 - 0.5) ** 2)
            advanced = hit_pos + step_dir * cs[..., None]
            pos = np.where(hit[..., None], hit_pos, advanced)
            uv_i = np_view_to_screen(pos, P)
            d = np_nearest(depth, uv_i)
            z = (near * far) / ((far - near) * d - far)
            diff = z - pos[..., 2]
            newly = (~hit) & (diff >= 0.0) & (diff < thickness)
            cur_uv = np.where(hit[..., None], cur_uv, uv_i)
            hit_pos = pos
            hit = hit | newly
        if cfg.refine_steps > 0:
            bdir = np.broadcast_to(step_dir * 0.5, hit_pos.shape).copy()
            bpos = hit_pos - bdir
            for _ in range(cfg.refine_steps):
                uv_i = np_view_to_screen(bpos, P)
                d = np_nearest(depth, uv_i)
                z = (near * far) / ((far - near) * d - far)
                diff = z - bpos[..., 2]
                bdir = bdir * 0.5
                bpos = bpos + np.where((diff >= 0)[..., None], -bdir, bdir)
            ruv = np_view_to_screen(bpos, P)
            cur_uv = np.where(hit[..., None], ruv, cur_uv)
            hit_pos = np.where(hit[..., None], bpos, hit_pos)
        hit_pos = np.where(hit[..., None], hit_pos, 1.0e9)
        return cur_uv, hit_pos, ~hit

    def env_color_for(l, is_diffuse_mask):
        """getEnvColor (`ssgi.frag:310-345`)."""
        if envd is None:
            return np.zeros((h, w, 3))
        refl_ws = np.einsum("ji,...j->...i", Vm[:3, :3], l)
        refl_ws /= np.linalg.norm(refl_ws, axis=-1, keepdims=True)
        mip = env_blur * (len(envd["mips"]) - 1)
        mip = np.where((~is_diffuse_mask) & (roughness < 0.15),
                       mip * roughness / 0.15, mip)
        s = np_trilinear_mips(envd["mips"], np_equirect_dir_to_uv(refl_ws), mip)
        max_lum = np.where(is_env, 100.0, 25.0)
        lum = np_lum(s)
        s = np.where((lum > max_lum)[..., None],
                     s * (max_lum / np.maximum(lum, EPS))[..., None], s)
        return s

    def do_sample(l, is_diffuse_mask):
        nol, noh, loh, _ = angles(l)
        cos_theta = np.maximum(0.0, np.sum(view_normal * l, -1))
        dbrdf = np_disney_diffuse(nol, nov, loh, rough_sq, metalness)
        sbrdf = np_disney_specular(rough_sq, noh, nov, nol)
        brdf_v = np.where(is_diffuse_mask, dbrdf, sbrdf) * cos_theta
        pdf = np.maximum(np.where(is_diffuse_mask, nol / np.pi,
                                  np_ggx_vndf_pdf(noh, nov, rough_sq)), EPS)

        coords, hit_pos, missed = ray_march(l)
        env_c = env_color_for(l, is_diffuse_mask)

        vel_at = np_nearest(vel, coords)
        ruv = coords - vel_at
        in_b = ((ruv[..., 0] >= 0) & (ruv[..., 0] <= 1)
                & (ruv[..., 1] >= 0) & (ruv[..., 1] <= 1))
        rgi = np_bilinear(accumulated, ruv)
        mx = diffuse.max(-1)
        mn = diffuse.min(-1)
        sat = np.where(mx == mn, 0.0, (mx - mn) / np.maximum(mx, EPS))
        desat = (1 - roughness) * sat * 0.4
        rgi = rgi + (np_lum(rgi)[..., None] - rgi) * desat[..., None]
        border = 0.15
        bf = (np_smoothstep(0, border, coords[..., 0])
              * np_smoothstep(1, 1 - border, coords[..., 0])
              * np_smoothstep(0, border, coords[..., 1])
              * np_smoothstep(1, 1 - border, coords[..., 1]))
        bf = np.sqrt(np.maximum(bf, 0.0))
        ssgi_r = env_c + (rgi - env_c) * bf[..., None]
        ssgi_r = np.where(in_b[..., None], ssgi_r, env_c)
        gi = np.where(missed[..., None], env_c, ssgi_r)
        return gi, hit_pos, brdf_v, pdf

    def finalize(gi, brdf_v, pdf):
        gi = gi * brdf_v[..., None]
        mis = ems_pdf ** 2 / (ems_pdf ** 2 + pdf ** 2)
        wgt = np.where(is_env, mis, 1.0 / pdf)
        return gi * (wgt / ems_pdf)[..., None]

    sgi_raw, spec_hit, sbrdf_v, spdf_v = do_sample(specular_ray, is_diffuse)
    specular_gi = finalize(sgi_raw, sbrdf_v, spdf_v)
    if cfg.mode == "ssgi":
        dgi_raw, _, dbrdf_v, dpdf_v = do_sample(diffuse_ray, is_diffuse)
        diffuse_gi = np.where(is_diffuse[..., None],
                              finalize(dgi_raw, dbrdf_v, dpdf_v), -1.0)
    else:
        diffuse_gi = np.full((h, w, 3), -1.0)

    is_missed = spec_hit[..., 0] > 1.0e8
    hit_ws = np.einsum("ij,...j->...i", Cw, np.concatenate(
        [np.where(is_missed[..., None], 0.0, spec_hit),
         np.ones((h, w, 1))], -1))[..., :3]
    cam_pos = Cw[:3, 3]
    ray_len = np.where(is_missed, 0.0,
                       np.linalg.norm(hit_ws - cam_pos, axis=-1))

    g_diff = np.concatenate([diffuse_gi, roughness[..., None]], -1)
    g_spec = np.concatenate([specular_gi, ray_len[..., None]], -1)
    bg = np.concatenate([direct, np.zeros((h, w, 1))], -1)
    g_diff = np.where(is_bg[..., None], bg, g_diff)
    g_spec = np.where(is_bg[..., None], bg, g_spec)
    return g_diff, g_spec


# --- the tests ---------------------------------------------------------------

def _fixture(seed=0):
    rng = np.random.default_rng(seed)
    scene = Scene()
    scene.add(make_plane(10, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
    box = scene.add(make_box((1.2, 1.0, 1.0), Material(
        diffuse=(0.9, 0.3, 0.2, 1.0), roughness=0.35, metalness=0.2)))
    box.set_matrix(translation(0.2, 0.5, 0.3))
    cam = PerspectiveCamera(50, 1, 0.1, 60)
    cam.set_position(1.5, 2.0, 3.0)
    cam.look_at((0, 0.4, 0))
    m = cam.matrices()
    gbj = rasterize_gbuffer(
        scene.pack(), scene.model_matrices(), m.projection_view_matrix, H, W)
    gb = {
        "depth": np.asarray(gbj.depth, np.float64),
        "normal": np.asarray(gbj.normal, np.float64),
        "roughness": np.asarray(gbj.roughness, np.float64),
        "metalness": np.asarray(gbj.metalness, np.float64),
        "diffuse": np.asarray(gbj.diffuse, np.float64)[..., :3],
    }
    velocity = rng.uniform(-0.01, 0.01, size=(H, W, 2))
    accumulated = rng.uniform(size=(H, W, 3))
    direct = rng.uniform(size=(H, W, 3))
    env = build_equirect_env(procedural_sky(16, 32))
    envd = {
        "mips": [np.asarray(mm, np.float64) for mm in env.mips],
        "marginal": np.asarray(env.marginal, np.float64),
        "conditional": np.asarray(env.conditional, np.float64),
        "total_sum": float(env.total_sum),
    }
    return gb, gbj, velocity, accumulated, direct, env, envd, m


def _compare(cfg, seed=0, frame=3, tol_q=2e-3, frac_tol=0.03):
    # this fixture transliterates the reference's gather march WITHOUT
    # the useDirectLight render-pass add (`ssgi.frag:267-272` — covered
    # by test_features::test_use_direct_light); pin both regardless of
    # the shipped defaults (trace="sweep", use_direct_light=True)
    import dataclasses as _dc
    cfg = _dc.replace(cfg, trace="march", use_direct_light=False)
    gb, gbj, velocity, accumulated, direct, env, envd, cam = _fixture(seed)
    noise = np.asarray(blue_noise_image(H, W, jnp.int32(frame)), np.float64)
    kw = dict(ray_distance=8.0, thickness=2.0, env_blur=0.4)

    expected = np_ssgi(gb, velocity, accumulated, direct, envd, cam,
                       noise, cfg, **kw)

    vel_buf = VelocityBuffer(
        velocity=jnp.asarray(velocity, jnp.float32),
        normal=jnp.asarray(gb["normal"], jnp.float32),
        depth=jnp.asarray(gb["depth"], jnp.float32),
    )
    got = ssgi(
        gbj, vel_buf, jnp.asarray(accumulated, jnp.float32),
        jnp.asarray(direct, jnp.float32), env, cam, jnp.int32(frame), cfg,
        **kw)
    for g, e in zip(got, expected):
        d = np.abs(np.asarray(g, np.float64) - e)
        rel = d / (np.abs(e) + 1.0)
        # march hits can flip at f32 thresholds on isolated pixels;
        # pin the bulk tightly and bound the flipped fraction
        assert np.quantile(rel, 0.97) < tol_q, float(np.quantile(rel, 0.97))
        flipped = rel.max(-1) > 0.05
        assert flipped.mean() < frac_tol, float(flipped.mean())
        # ...and localize them: an f32 flip can only happen where the
        # march outcome is threshold-ambiguous, i.e. within 1 px of a
        # march-hit crossing (a spatial discontinuity in the expected
        # output: hit/miss or hit-depth changing between neighbors).
        # A localized regression away from such an edge fails here even
        # if it stays under the global fraction budget.
        rel_y = np.abs(np.diff(e, axis=0)) / (np.abs(e[1:]) + 1.0)
        rel_x = np.abs(np.diff(e, axis=1)) / (np.abs(e[:, 1:]) + 1.0)
        disc = np.zeros(e.shape[:2], bool)
        disc[1:] |= rel_y.max(-1) > 0.05
        disc[:-1] |= rel_y.max(-1) > 0.05
        disc[:, 1:] |= rel_x.max(-1) > 0.05
        disc[:, :-1] |= rel_x.max(-1) > 0.05
        allowed = np.zeros_like(disc)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                allowed |= np.roll(np.roll(disc, dy, 0), dx, 1)
        stray = flipped & ~allowed
        assert stray.sum() == 0, \
            f"{int(stray.sum())} flipped pixels away from any march-hit " \
            f"crossing at {np.argwhere(stray)[:5].tolist()}"


class TestSSGIParity:
    def test_ssgi_importance_sampling(self):
        _compare(SSGIConfig(mode="ssgi", steps=8, refine_steps=3,
                            importance_sampling=True))

    def test_ssgi_no_importance(self):
        _compare(SSGIConfig(mode="ssgi", steps=8, refine_steps=3,
                            importance_sampling=False), seed=1, frame=5)

    def test_ssr_mode(self):
        _compare(SSGIConfig(mode="ssr", steps=8, refine_steps=2,
                            importance_sampling=False), seed=2, frame=7)

    def test_no_refine(self):
        _compare(SSGIConfig(mode="ssgi", steps=10, refine_steps=0,
                            importance_sampling=False), seed=3, frame=9)
