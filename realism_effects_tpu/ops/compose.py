"""Pointwise composition kernels (K13/K14) — pure fused jnp.

- :func:`ao_compose`  — `/root/reference/src/ao/shader/ao_compose.frag`
- :func:`ssgi_compose` — `/root/reference/src/ssgi/shader/ssgi_compose.frag`
  (background passthrough + optional three.js-style exp2 fog)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math3d import depth_to_view_z, mix


def ao_compose(color: jnp.ndarray, ao: jnp.ndarray, depth: jnp.ndarray,
               power=2.0, ao_color=(0.0, 0.0, 0.0)) -> jnp.ndarray:
    """color * mix(aoColor, 1, ao^power); background (depth>0.9999) is
    left un-occluded (`ao_compose.frag:6-17`)."""
    a = jnp.where(depth > 0.9999, 1.0, ao) ** power
    ao_color = jnp.asarray(ao_color, jnp.float32)
    tint = mix(
        jnp.broadcast_to(ao_color, color.shape),
        jnp.ones_like(color),
        a[..., None],
    )
    return color * tint


def ssgi_compose(gi_color: jnp.ndarray, scene_color: jnp.ndarray,
                 depth: jnp.ndarray, cam=None,
                 fog_color=None, fog_density: float = 0.0) -> jnp.ndarray:
    """Composite GI over the scene: background pixels show the scene
    texture; foreground shows GI, optionally faded into exp2 fog
    (`ssgi_compose.frag:20-44`; the 0.4 viewZ factor reproduced)."""
    out = jnp.where(depth[..., None] >= 1.0, scene_color, gi_color)
    if fog_color is not None and fog_density > 0.0 and cam is not None:
        view_z = depth_to_view_z(depth, cam) * 0.4
        fog_depth = -view_z
        fog_factor = 1.0 - jnp.exp(
            -fog_density * fog_density * fog_depth * fog_depth
        )
        fog_factor = jnp.where(depth >= 1.0, 0.0, fog_factor)
        fog = jnp.broadcast_to(jnp.asarray(fog_color, jnp.float32), out.shape)
        out = mix(out, fog, fog_factor[..., None])
    return out
