"""Built-in direct-lighting shader producing the "scene color" input.

The reference consumes the user's already-lit three.js render as its input
buffer (`SSGIEffect.js:379-394` renders the scene into
``sceneRenderTarget``). The TPU framework is self-contained, so demos and
benches shade the G-buffer here: Lambert sun + optional GGX specular sun
highlight (``scene.sun_specular``) + three.js-style point lights
(``scene.add_point_light``) + hemispheric ambient + emissive, env map as
background. Pure pointwise jnp — XLA fuses it.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.brdf import calculate_angles, eval_disney_specular, f_schlick
from ..core.envmap import EquirectEnv, sample_equirect_color
from ..core.framebuffers import GBuffer
from ..core.math3d import normalize, screen_to_world, uv_grid


#: evaluate the env background on a half-resolution direction grid and
#: bilinearly upsample (gather-free interleave): the view-direction
#: field is smooth, so this halves the background's priced gather-index
#: count 4x (~15 ms at 1080p, CLAUDE.md rule 2b) for at most one
#: env-texel of softening. False = exact per-pixel fetch (the
#: formulation golden/parity fixtures can pin).
FAST_BACKGROUND = True


def _upsample2(c: jnp.ndarray, n: int, axis: int) -> jnp.ndarray:
    """2x bilinear upsample along ``axis`` aligned to pixel centers:
    out[2i] = c[i], out[2i+1] = (c[i] + c[i+1]) / 2; crops to ``n``."""
    c = jnp.moveaxis(c, axis, 0)
    a = c[:-1]
    mid = 0.5 * (a + c[1:])
    out = jnp.stack([a, mid], axis=1).reshape((-1,) + c.shape[1:])
    return jnp.moveaxis(out[:n], 0, axis)


def _f0(gbuffer: GBuffer) -> jnp.ndarray:
    """Specular reflectance at normal incidence: 0.04 dielectric base
    lerped to albedo by metalness (three.js MeshPhysicalMaterial)."""
    albedo = gbuffer.diffuse[..., :3]
    m = gbuffer.metalness[..., None]
    return 0.04 * (1.0 - m) + albedo * m


def _specular(l, v, n, gbuffer) -> jnp.ndarray:
    """Cook-Torrance GGX specular response for light direction ``l``
    (the reference's own Disney specular, `ssgi_utils.frag:144-151`,
    with Schlick Fresnel), modulated by NoL. Returns (H, W, 3)."""
    _, nol, noh, _, voh = calculate_angles(l, v, n)
    nov = jnp.clip(jnp.sum(n * v, axis=-1), 1e-4, 1.0)
    spec = eval_disney_specular(gbuffer.roughness, noh, nov, nol)
    fresnel = f_schlick(_f0(gbuffer), voh)
    return fresnel * (spec * nol)[..., None]


def shade_direct(gbuffer: GBuffer, camera, lighting: dict,
                 env: EquirectEnv | None = None) -> jnp.ndarray:
    """(H, W, 3) linear HDR scene color."""
    h, w = gbuffer.height, gbuffer.width
    n = gbuffer.normal
    sun_dir = lighting["sun_direction"]
    ndotl = jnp.maximum(jnp.sum(n * sun_dir, axis=-1), 0.0)

    albedo = gbuffer.diffuse[..., :3]
    up = jnp.clip(n[..., 1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    ambient = lighting["ambient"] * (0.5 + 0.5 * up)
    if gbuffer.ao is not None:
        # baked aoMap modulates indirect light only (three.js
        # aomap_fragment applies it to irradiance, not direct)
        ambient = ambient * gbuffer.ao[..., None]

    # metals have no diffuse lobe; their response comes from specular GI
    kd = (1.0 - gbuffer.metalness)[..., None]
    color = albedo * kd * (ndotl[..., None] * lighting["sun_color"] + ambient)

    # world position / view dir: needed by specular, point lights, and
    # the env background (key presence is static → program structure)
    wants_surface = ("sun_specular" in lighting
                     or "point_positions" in lighting)
    uv = view_dir = None
    if wants_surface or env is not None:
        uv = uv_grid(h, w)
    if wants_surface:
        world_pos = screen_to_world(
            uv, gbuffer.depth,
            camera.camera_matrix_world, camera.projection_matrix_inverse,
        )
        view_dir = normalize(camera.position - world_pos)

    if "sun_specular" in lighting:
        color = color + lighting["sun_specular"] * lighting["sun_color"] \
            * _specular(sun_dir, view_dir, n, gbuffer)

    if "point_positions" in lighting:
        # three.js PointLight: inverse-square falloff, windowed cutoff
        # when distance > 0 (lights_fragment getDistanceAttenuation)
        for i in range(lighting["point_positions"].shape[0]):
            to_l = lighting["point_positions"][i] - world_pos
            d = jnp.linalg.norm(to_l, axis=-1)
            l = to_l / jnp.maximum(d, 1e-6)[..., None]
            atten = 1.0 / jnp.maximum(
                d ** lighting["point_decay"][i], 1e-4)
            cutoff = lighting["point_distance"][i]
            window = jnp.where(
                cutoff > 0.0,
                jnp.clip(1.0 - (d / jnp.maximum(cutoff, 1e-6)) ** 4.0,
                         0.0, 1.0) ** 2.0,
                1.0,
            )
            radiance = lighting["point_colors"][i] * (atten * window)[..., None]
            nol = jnp.maximum(jnp.sum(n * l, axis=-1), 0.0)
            contrib = albedo * kd * nol[..., None]
            if "sun_specular" in lighting:
                contrib = contrib + lighting["sun_specular"] \
                    * _specular(l, view_dir, n, gbuffer)
            color = color + contrib * radiance

    color = color + gbuffer.emissive

    # background: env map along the camera ray, else flat background color
    is_bg = gbuffer.depth >= 1.0
    if env is not None and FAST_BACKGROUND and min(h, w) >= 64:
        # half-res direction grid at pixel centers (2i + 0.5), bilinear
        # 2x upsample (see FAST_BACKGROUND); ceil so odd frame dims still
        # yield >= h/w upsampled rows/cols before the [:n] crop
        hc, wc = -(-h // 2) + 1, -(-w // 2) + 1
        uv_c = jnp.stack(
            jnp.meshgrid(
                (jnp.arange(wc, dtype=jnp.float32) * 2.0 + 0.5) / w,
                (jnp.arange(hc, dtype=jnp.float32) * 2.0 + 0.5) / h,
            ),
            axis=-1,
        )
        far_c = screen_to_world(
            uv_c, jnp.ones((hc, wc), jnp.float32),
            camera.camera_matrix_world, camera.projection_matrix_inverse,
        )
        bg_c = sample_equirect_color(
            env, normalize(far_c - camera.position), 0.0)
        bg = _upsample2(_upsample2(bg_c, h, 0), w, 1)
    elif env is not None:
        far_pos = screen_to_world(
            uv, jnp.ones((h, w), jnp.float32),
            camera.camera_matrix_world, camera.projection_matrix_inverse,
        )
        cam_view = normalize(far_pos - camera.position)
        bg = sample_equirect_color(env, cam_view, 0.0)
    else:
        bg = jnp.broadcast_to(lighting["background_color"], color.shape)
    return jnp.where(is_bg[..., None], bg, color)
