"""Framebuffer pytrees: the SoA G-buffer and velocity buffer.

TPU-native redesign of the reference's packed render targets:

- The reference packs diffuse/normal/roughness-metalness/emissive into one
  RGBA32F texture with bit codecs
  (`/root/reference/src/gbuffer/shader/gbuffer_packing.glsl:166-198`) purely
  because WebGL2 limits MRT outputs. On TPU we keep a struct-of-arrays
  pytree — no codecs on the hot path, HBM layout stays dense per plane.
- The velocity buffer mirrors ``VelocityDepthNormalPass``'s single RGBA32F
  target ``(vel.xy, packedNormal, depth)``
  (`/root/reference/src/temporal-reproject/material/VelocityDepthNormalMaterial.js:179-189`)
  as separate ``velocity``/``normal``/``depth`` planes.
"""

from __future__ import annotations

import chex
import jax.numpy as jnp


@chex.dataclass(frozen=True)
class GBuffer:
    """Struct-of-arrays G-buffer (all float32).

    Matches the material struct decoded by ``getMaterial``
    (`gbuffer_packing.glsl:181-196`).
    """

    diffuse: jnp.ndarray     # (H, W, 4) rgba albedo
    normal: jnp.ndarray      # (H, W, 3) world-space unit normal
    roughness: jnp.ndarray   # (H, W)
    metalness: jnp.ndarray   # (H, W)
    emissive: jnp.ndarray    # (H, W, 3)
    depth: jnp.ndarray       # (H, W) depth-buffer value in [0, 1]
    #: winning mesh index per pixel (-1 = background); feeds per-mesh
    #: effect masks (the Selection-layers analog, `SSGIPass.js:71-79`).
    #: Optional: externally ingested G-buffers may leave it None.
    mesh_id: jnp.ndarray | None = None  # (H, W) int32
    #: baked ambient-occlusion term from the material's aoMap
    #: (three.js `aomap_fragment`: 1 + strength*(texel.r - 1)); modulates
    #: indirect light in the scene shade. Optional (None = no AO maps).
    ao: jnp.ndarray | None = None       # (H, W)

    @property
    def height(self) -> int:
        return self.depth.shape[0]

    @property
    def width(self) -> int:
        return self.depth.shape[1]

    @classmethod
    def background(cls, height: int, width: int) -> "GBuffer":
        """Empty G-buffer: depth 1 everywhere (background)."""
        z3 = jnp.zeros((height, width, 3), jnp.float32)
        return cls(
            diffuse=jnp.zeros((height, width, 4), jnp.float32),
            normal=z3,
            roughness=jnp.ones((height, width), jnp.float32),
            metalness=jnp.zeros((height, width), jnp.float32),
            emissive=z3,
            depth=jnp.ones((height, width), jnp.float32),
        )


@chex.dataclass(frozen=True)
class VelocityBuffer:
    """Output of the velocity/depth/normal pass.

    ``velocity`` is screen-space uv displacement current - previous frame
    (so ``uv - velocity`` reprojects into the previous frame, like
    `reproject.frag:204`).
    """

    velocity: jnp.ndarray  # (H, W, 2) uv velocity
    normal: jnp.ndarray    # (H, W, 3) world-space normal
    depth: jnp.ndarray     # (H, W) depth in [0, 1]

    @property
    def height(self) -> int:
        return self.depth.shape[0]

    @property
    def width(self) -> int:
        return self.depth.shape[1]

    @classmethod
    def zeros(cls, height: int, width: int) -> "VelocityBuffer":
        return cls(
            velocity=jnp.zeros((height, width, 2), jnp.float32),
            normal=jnp.zeros((height, width, 3), jnp.float32),
            depth=jnp.ones((height, width), jnp.float32),
        )
