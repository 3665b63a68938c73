"""Final GI composition (kernel K7).

TPU port of `/root/reference/src/denoise/shader/denoiser_compose_functions.glsl`
+ `/root/reference/src/denoise/pass/DenoiserComposePass.js`: recombine the
denoised diffuse/specular GI with albedo, metalness and an accumulated-
Fresnel approximation (one GGX-VNDF sample at fixed randoms 0.25).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import brdf, math3d
from ..core.framebuffers import GBuffer
from ..core.math3d import dot, mix, normalize, transform_dir_transpose, uv_grid


def denoiser_compose(
    diffuse_gi: jnp.ndarray,   # (H, W, >=3)
    specular_gi: jnp.ndarray,  # (H, W, >=3)
    gbuffer: GBuffer,
    cam,
    scene_color: jnp.ndarray | None = None,
    input_type: str = "diffuse_specular",
) -> jnp.ndarray:
    """Returns composed (H, W, 3) radiance; background pixels keep their
    input (the pass discards there, `DenoiserComposePass.js:56-60`)."""
    h, w = gbuffer.depth.shape
    uv = uv_grid(h, w)
    depth = gbuffer.depth

    roughness = gbuffer.roughness * gbuffer.roughness  # `:56` squared
    metalness = gbuffer.metalness
    diffuse = gbuffer.diffuse[..., :3]
    emissive = gbuffer.emissive

    view_z = math3d.depth_to_view_z(depth, cam)
    view_pos = math3d.get_view_position(
        uv, view_z, cam.projection_matrix, cam.projection_matrix_inverse
    )
    view_dir = normalize(view_pos)

    # world-space frame (`denoiser_compose_functions.glsl:58-70`)
    n_world = gbuffer.normal
    v_view = -view_dir
    v_world = transform_dir_transpose(cam.view_matrix, v_view)
    t_w, b_w = brdf.onb(n_world)
    v_local = brdf.to_local(t_w, b_w, n_world, v_world)

    h_local = brdf.sample_ggx_vndf(v_local, roughness, roughness, 0.25, 0.25)
    h_local = jnp.where(h_local[..., 2:3] < 0.0, -h_local, h_local)
    l_local = normalize(math3d.reflect(-v_local, h_local))
    l_world = brdf.to_world(t_w, b_w, n_world, l_local)
    l_view = normalize(
        transform_dir_transpose(cam.camera_matrix_world, l_world)
    )
    view_normal = normalize(
        transform_dir_transpose(cam.camera_matrix_world, n_world)
    )
    l_view = jnp.where(
        (dot(view_normal, l_view) < 0.0)[..., None], -l_view, l_view
    )

    h_vec = normalize(v_view + l_view)
    voh = jnp.maximum(1e-5, dot(v_view, h_vec))
    f0 = mix(jnp.full_like(diffuse, 0.04), diffuse, metalness[..., None])
    fresnel = brdf.f_schlick(f0, voh)

    if input_type == "specular" and scene_color is not None:
        diffuse_component = scene_color
    else:
        diffuse_component = (
            diffuse * (1.0 - metalness[..., None]) * (1.0 - fresnel)
            * diffuse_gi[..., :3]
        )
    specular_component = specular_gi[..., :3] * fresnel

    gi = diffuse_component + specular_component + emissive
    # background discard: keep diffuse input (already direct light there)
    return jnp.where(depth[..., None] >= 1.0, diffuse_gi[..., :3], gi)
