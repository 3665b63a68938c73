"""Numpy transliteration parity fixtures for pointwise/gather kernels.

Same method as test_ao_parity.py, extended to:

- K12 motion blur  (`motion_blur.frag:11-44`)
- K7  denoiser compose (`denoiser_compose_functions.glsl:53-108` +
  `DenoiserComposePass.js:58-84` main)
- K13 ssgi compose (`ssgi_compose.frag:20-44`)
- K14 ao compose   (`ao_compose.frag:6-17`)

Each fixture is written from the GLSL line by line (float64 numpy) and
compared against the JAX kernels on shared random inputs and identical
blue-noise arrays.
"""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.core.framebuffers import GBuffer
from realism_effects_tpu.core.rng import blue_noise_image
from realism_effects_tpu.ops.compose import ao_compose, ssgi_compose
from realism_effects_tpu.ops.denoiser_compose import denoiser_compose
from realism_effects_tpu.ops.motion_blur import motion_blur

from test_ao_parity import np_bilinear

H = W = 24


def _cam():
    cam = PerspectiveCamera(50, 1, 0.1, 60)
    cam.set_position(1.0, 2.0, 3.5)
    cam.look_at((0, 0.4, 0))
    return cam.matrices()


def _uv(h=H, w=W):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack([(xs + 0.5) / w, (ys + 0.5) / h], -1)


class TestMotionBlurParity:
    def test_matches_frag(self):
        rng = np.random.default_rng(0)
        color = rng.uniform(size=(H, W, 3))
        velocity = rng.uniform(-0.05, 0.05, size=(H, W, 2))
        velocity[:4] = 0.0  # exercise the static early-out
        frame, intensity, jitter, dt, samples = 7, 1.3, 0.8, 1 / 90, 8
        noise = np.asarray(blue_noise_image(H, W, jnp.int32(frame)), np.float64)

        # --- motion_blur.frag:11-44, line by line ----------------------
        uv = _uv()
        vel = velocity * intensity
        did_move = np.sum(velocity * velocity, -1) > 1e-9
        jitter_offset = jitter * vel * noise[..., :2]
        frame_speed = (1.0 / 100.0) / dt
        start_uv = np.maximum(uv + (jitter_offset - vel * 0.5) * frame_speed, 0.0)
        end_uv = np.minimum(uv + (jitter_offset + vel * 0.5) * frame_speed, 1.0)
        acc = color.copy()
        for i in range(samples + 1):
            t = i / float(samples)
            # inputTexture is a HalfFloat framebuffer: taps read f16 texels
            acc = acc + np_bilinear(
                color.astype(np.float16).astype(np.float64),
                start_uv + (end_uv - start_uv) * t)
        expected = np.where(
            did_move[..., None], acc / (samples + 2.0), color)

        out = motion_blur(
            jnp.asarray(color, jnp.float32), jnp.asarray(velocity, jnp.float32),
            jnp.int32(frame), intensity=intensity, jitter=jitter,
            delta_time=dt, samples=samples)
        # atol = one f16 ulp: the input is rgba16f storage, and f32-vs-f64
        # tap positions at texel boundaries can flip a corner whose
        # quantized value differs by up to 2^-11 relative
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)


# --- K7 transliteration helpers ------------------------------------------

def np_sample_ggx_vndf(V, ax, ay, r1, r2):
    """denoiser_compose_functions.glsl:24-41."""
    Vh = np.stack([ax * V[..., 0], ay * V[..., 1], V[..., 2]], -1)
    Vh = Vh / np.linalg.norm(Vh, axis=-1, keepdims=True)
    lensq = Vh[..., 0] ** 2 + Vh[..., 1] ** 2
    inv = 1.0 / np.sqrt(np.maximum(lensq, 1e-30))
    T1 = np.where(
        (lensq > 0.0)[..., None],
        np.stack([-Vh[..., 1] * inv, Vh[..., 0] * inv, np.zeros_like(inv)], -1),
        np.broadcast_to([1.0, 0.0, 0.0], Vh.shape),
    )
    T2 = np.cross(Vh, T1)
    r = np.sqrt(r1)
    phi = 2.0 * np.pi * r2
    t1 = np.broadcast_to(r * np.cos(phi), Vh.shape[:-1])
    t2_init = np.broadcast_to(r * np.sin(phi), Vh.shape[:-1])
    s = 0.5 * (1.0 + Vh[..., 2])
    t2 = (1.0 - s) * np.sqrt(1.0 - t1 * t1) + s * t2_init
    Nh = (
        t1[..., None] * T1
        + t2[..., None] * T2
        + np.sqrt(np.maximum(0.0, 1.0 - t1 * t1 - t2 * t2))[..., None] * Vh
    )
    out = np.stack([
        ax * Nh[..., 0], ay * Nh[..., 1], np.maximum(0.0, Nh[..., 2])], -1)
    return out / np.linalg.norm(out, axis=-1, keepdims=True)


def np_onb(N):
    """denoiser_compose_functions.glsl:43-47."""
    up = np.where(
        (np.abs(N[..., 2]) < 0.9999999)[..., None],
        np.broadcast_to([0.0, 0.0, 1.0], N.shape),
        np.broadcast_to([1.0, 0.0, 0.0], N.shape),
    )
    T = np.cross(up, N)
    T = T / np.linalg.norm(T, axis=-1, keepdims=True)
    B = np.cross(N, T)
    return T, B


def np_denoiser_compose(diffuse_gi, specular_gi, gb, cam,
                        scene_color=None, input_type="diffuse_specular"):
    """DenoiserComposePass.js:58-84 + compose functions :53-108."""
    h, w = gb["depth"].shape
    uv = _uv(h, w)
    depth = gb["depth"]
    near, far = float(cam.near), float(cam.far)
    P = np.asarray(cam.projection_matrix, np.float64)
    Pinv = np.asarray(cam.projection_matrix_inverse, np.float64)
    V_mat = np.asarray(cam.view_matrix, np.float64)
    Cw = np.asarray(cam.camera_matrix_world, np.float64)

    view_z = (near * far) / ((far - near) * depth - far)  # getViewZ (< 0)

    # getViewPosition with *negative* viewZ, the ssgi_utils.frag:17-24
    # variant. NOTE upstream quirk: DenoiserComposePass.js:73-76 feeds
    # POSITIVE viewZ into the same formula, making clipW negative and
    # mirroring viewDir.xy; this framework deliberately uses the
    # consistent unmirrored convention (PARITY.md deviations).
    clip_w = P[3, 2] * view_z + P[3, 3]
    clip = np.stack([
        uv[..., 0] * 2.0 - 1.0, uv[..., 1] * 2.0 - 1.0,
        view_z * 2.0 - 1.0, np.ones_like(view_z)], -1)
    clip = clip * clip_w[..., None]
    p = np.einsum("ij,hwj->hwi", Pinv, clip)[..., :3]
    p[..., 2] = view_z
    view_pos = p
    view_dir = view_pos / np.linalg.norm(view_pos, axis=-1, keepdims=True)

    roughness = gb["roughness"] ** 2
    metalness = gb["metalness"]
    diffuse = gb["diffuse"]
    emissive = gb["emissive"]
    N = gb["normal"]  # world

    v_view = -view_dir
    # (vec4(v,0) * viewMatrix).xyz == viewMatrix^T @ v == world vector
    v_world = np.einsum("ji,hwj->hwi", V_mat[:3, :3], v_view)
    T, B = np_onb(N)
    to_local = lambda X: np.stack(
        [np.sum(X * T, -1), np.sum(X * B, -1), np.sum(X * N, -1)], -1)
    to_world = lambda X: (X[..., 0:1] * T + X[..., 1:2] * B + X[..., 2:3] * N)

    Vl = to_local(v_world)
    Hl = np_sample_ggx_vndf(Vl, roughness, roughness, 0.25, 0.25)
    Hl = np.where((Hl[..., 2] < 0.0)[..., None], -Hl, Hl)
    # reflect(-V, H) = -V - 2*dot(H, -V)*H
    mV = -Vl
    refl = mV - 2.0 * np.sum(Hl * mV, -1, keepdims=True) * Hl
    refl = refl / np.linalg.norm(refl, axis=-1, keepdims=True)
    l_world = to_world(refl)
    # (vec4(l,1) * cameraMatrixWorld).xyz == Cw^T rotation
    l_view = np.einsum("ji,hwj->hwi", Cw[:3, :3], l_world)
    l_view = l_view / np.linalg.norm(l_view, axis=-1, keepdims=True)
    view_normal = np.einsum("ji,hwj->hwi", Cw[:3, :3], N)
    l_view = np.where(
        (np.sum(view_normal * l_view, -1) < 0.0)[..., None], -l_view, l_view)

    h_vec = v_view + l_view
    h_vec = h_vec / np.linalg.norm(h_vec, axis=-1, keepdims=True)
    voh = np.maximum(1e-5, np.sum(v_view * h_vec, -1))
    f0 = 0.04 + (diffuse - 0.04) * metalness[..., None]
    F = f0 + (1.0 - f0) * (1.0 - voh[..., None]) ** 5

    if input_type == "specular" and scene_color is not None:
        diffuse_component = scene_color
    else:
        diffuse_component = diffuse * (1 - metalness[..., None]) * (1 - F) * diffuse_gi
    gi = diffuse_component + specular_gi * F + emissive
    return np.where(depth[..., None] >= 1.0, diffuse_gi, gi)


class TestDenoiserComposeParity:
    def _gb(self, rng):
        nrm = rng.uniform(-1, 1, size=(H, W, 3))
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        return {
            "depth": rng.uniform(0.3, 0.95, size=(H, W)),
            "normal": nrm,
            "roughness": rng.uniform(0.05, 1.0, size=(H, W)),
            "metalness": rng.uniform(size=(H, W)),
            "diffuse": rng.uniform(size=(H, W, 3)),
            "emissive": rng.uniform(0, 0.2, size=(H, W, 3)),
        }

    def test_matches_frag(self):
        rng = np.random.default_rng(1)
        gb = self._gb(rng)
        d_gi = rng.uniform(size=(H, W, 3))
        s_gi = rng.uniform(size=(H, W, 3))
        cam = _cam()
        expected = np_denoiser_compose(d_gi, s_gi, gb, cam)

        gbuffer = GBuffer(
            diffuse=jnp.asarray(
                np.concatenate([gb["diffuse"], np.ones((H, W, 1))], -1),
                jnp.float32),
            normal=jnp.asarray(gb["normal"], jnp.float32),
            roughness=jnp.asarray(gb["roughness"], jnp.float32),
            metalness=jnp.asarray(gb["metalness"], jnp.float32),
            emissive=jnp.asarray(gb["emissive"], jnp.float32),
            depth=jnp.asarray(gb["depth"], jnp.float32),
        )
        out = denoiser_compose(
            jnp.asarray(d_gi, jnp.float32), jnp.asarray(s_gi, jnp.float32),
            gbuffer, cam)
        # near-zero roughness makes the VNDF frame f32-sensitive (tiny
        # ax*Vx components), so assert on quantiles rather than max
        d = np.abs(np.asarray(out) - expected)
        assert np.quantile(d, 0.99) < 5e-4
        assert d.max() < 0.03
        assert d.mean() < 1e-4

    def test_specular_mode_uses_scene_color(self):
        rng = np.random.default_rng(2)
        gb = self._gb(rng)
        s_gi = rng.uniform(size=(H, W, 3))
        scene = rng.uniform(size=(H, W, 3))
        cam = _cam()
        expected = np_denoiser_compose(
            s_gi, s_gi, gb, cam, scene_color=scene, input_type="specular")
        gbuffer = GBuffer(
            diffuse=jnp.asarray(
                np.concatenate([gb["diffuse"], np.ones((H, W, 1))], -1),
                jnp.float32),
            normal=jnp.asarray(gb["normal"], jnp.float32),
            roughness=jnp.asarray(gb["roughness"], jnp.float32),
            metalness=jnp.asarray(gb["metalness"], jnp.float32),
            emissive=jnp.asarray(gb["emissive"], jnp.float32),
            depth=jnp.asarray(gb["depth"], jnp.float32),
        )
        out = denoiser_compose(
            jnp.asarray(s_gi, jnp.float32), jnp.asarray(s_gi, jnp.float32),
            gbuffer, cam, scene_color=jnp.asarray(scene, jnp.float32),
            input_type="specular")
        d = np.abs(np.asarray(out) - expected)
        assert np.quantile(d, 0.99) < 5e-4
        assert d.max() < 0.03
        assert d.mean() < 1e-4


class TestComposeParity:
    def test_ao_compose_matches_frag(self):
        rng = np.random.default_rng(3)
        color = rng.uniform(size=(H, W, 3))
        ao = rng.uniform(size=(H, W))
        depth = rng.uniform(0.5, 1.0, size=(H, W))
        depth[:3] = 1.0
        power, col = 2.7, (0.1, 0.0, 0.2)

        # ao_compose.frag:6-17
        a = np.where(depth > 0.9999, 1.0, ao) ** power
        tint = np.asarray(col) + (1.0 - np.asarray(col)) * a[..., None]
        expected = tint * color

        out = ao_compose(
            jnp.asarray(color, jnp.float32), jnp.asarray(ao, jnp.float32),
            jnp.asarray(depth, jnp.float32), power=power, ao_color=col)
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)

    def test_ssgi_compose_matches_frag_with_fog(self):
        rng = np.random.default_rng(4)
        gi = rng.uniform(size=(H, W, 3))
        scene = rng.uniform(size=(H, W, 3))
        depth = rng.uniform(0.3, 1.0, size=(H, W))
        depth[:3] = 1.0
        cam = _cam()
        fog_color, fog_density = (0.4, 0.5, 0.6), 0.08
        near, far = float(cam.near), float(cam.far)

        # ssgi_compose.frag:20-44 (FogExp2 branch incl. the 0.4 factor)
        out_np = np.where(depth[..., None] == 1.0, scene, gi)
        view_z = ((near * far) / ((far - near) * depth - far)) * 0.4
        fog_depth = -view_z
        fog_factor = 1.0 - np.exp(
            -fog_density * fog_density * fog_depth * fog_depth)
        fog_factor = np.where(depth >= 1.0, 0.0, fog_factor)
        expected = out_np + (np.asarray(fog_color) - out_np) * fog_factor[..., None]

        out = ssgi_compose(
            jnp.asarray(gi, jnp.float32), jnp.asarray(scene, jnp.float32),
            jnp.asarray(depth, jnp.float32), cam,
            fog_color=fog_color, fog_density=fog_density)
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)
