"""Buffer inspector: visualize any intermediate tensor by name.

Replicates the reference's observability mechanism — the ``outputTexture``
option that routes any intermediate render target to the screen
(`/root/reference/src/ssgi/SSGIEffect.js:228-251`,
`/root/reference/src/gbuffer/debug/GBufferDebugPass.js:41-53`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.framebuffers import GBuffer, VelocityBuffer


def visualize_gbuffer(gbuffer: GBuffer, mode: str) -> jnp.ndarray:
    """(H, W, 3) visualization of one G-buffer channel.

    Modes mirror `GBufferDebugPass.js:41-53`: diffuse, alpha, normal,
    roughness, metalness, emissive, depth.
    """
    if mode == "diffuse":
        return gbuffer.diffuse[..., :3]
    if mode == "alpha":
        return gbuffer.diffuse[..., 3:4].repeat(3, axis=-1)
    if mode == "normal":
        return gbuffer.normal * 0.5 + 0.5
    if mode == "roughness":
        return gbuffer.roughness[..., None].repeat(3, axis=-1)
    if mode == "metalness":
        return gbuffer.metalness[..., None].repeat(3, axis=-1)
    if mode == "emissive":
        return gbuffer.emissive
    if mode == "depth":
        return gbuffer.depth[..., None].repeat(3, axis=-1)
    if mode == "mesh_id":
        # per-mesh selection plane (Selection-layers analog); hashed to
        # distinct hues, background black
        mid = gbuffer.mesh_id
        if mid is None:
            raise ValueError("this GBuffer carries no mesh_id plane")
        t = mid.astype(jnp.float32)
        rgb = jnp.stack([
            jnp.mod(t * 0.6180339887, 1.0),
            jnp.mod(t * 0.7548776662 + 0.33, 1.0),
            jnp.mod(t * 0.5698402910 + 0.66, 1.0),
        ], axis=-1)
        return jnp.where((mid >= 0)[..., None], rgb * 0.8 + 0.2, 0.0)
    raise ValueError(f"unknown gbuffer debug mode: {mode}")


def visualize_velocity(buf: VelocityBuffer, scale: float = 10.0) -> jnp.ndarray:
    """Velocity as RG displacement (scaled, centered at 0.5) + depth in B."""
    vel = jnp.clip(buf.velocity * scale + 0.5, 0.0, 1.0)
    return jnp.concatenate([vel, buf.depth[..., None]], axis=-1)
