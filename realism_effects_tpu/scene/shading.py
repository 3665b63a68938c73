"""Built-in direct-lighting shader producing the "scene color" input.

The reference consumes the user's already-lit three.js render as its input
buffer (`SSGIEffect.js:379-394` renders the scene into
``sceneRenderTarget``). The TPU framework is self-contained, so demos and
benches shade the G-buffer here: Lambert sun + hemispheric ambient +
emissive, env map as background. Pure pointwise jnp — XLA fuses it.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.envmap import EquirectEnv, sample_equirect_color
from ..core.framebuffers import GBuffer
from ..core.math3d import normalize, screen_to_world, uv_grid


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
    color = color + gbuffer.emissive

    # background: env map along the camera ray, else flat background color
    is_bg = gbuffer.depth >= 1.0
    if env is not None:
        uv = uv_grid(h, w)
        far_pos = screen_to_world(
            uv, jnp.ones((h, w), jnp.float32),
            camera.camera_matrix_world, camera.projection_matrix_inverse,
        )
        view_dir = normalize(far_pos - camera.position)
        bg = sample_equirect_color(env, view_dir, 0.0)
    else:
        bg = jnp.broadcast_to(lighting["background_color"], color.shape)
    return jnp.where(is_bg[..., None], bg, color)
