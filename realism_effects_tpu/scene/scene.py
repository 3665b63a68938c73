"""Scene container + packing into device arrays.

Boundary of the framework (SURVEY.md §7): the reference re-renders the
user's three.js scene to produce its G-buffer and velocity buffers
(`/root/reference/src/gbuffer/GBufferPass.js:100-119`,
`/root/reference/src/temporal-reproject/pass/VelocityDepthNormalPass.js:165-193`);
here a :class:`Scene` of meshes is packed once into flat arrays (static
topology) while per-mesh model matrices stay per-frame traced inputs.
"""

from __future__ import annotations

import chex
import jax.numpy as jnp
import numpy as np

from .geometry import MATERIAL_ROW_SIZE, Material, Mesh


@chex.dataclass(frozen=True)
class PackedScene:
    """Static scene arrays (a pytree); upload once, reuse per frame."""

    positions: jnp.ndarray   # (V, 3)
    normals: jnp.ndarray     # (V, 3)
    faces: jnp.ndarray       # (F, 3) int32
    vert_mesh_id: jnp.ndarray  # (V,) int32
    materials: jnp.ndarray   # (M, MATERIAL_ROW_SIZE)

    @property
    def num_faces(self) -> int:
        return int(self.faces.shape[0])


class Scene:
    def __init__(self, background_color=(0.0, 0.0, 0.0)):
        self.meshes: list[Mesh] = []
        self.background_color = np.asarray(background_color, np.float32)
        self.environment = None  # EquirectEnv, optional
        # directional "sun" for the built-in direct-light shader
        self.sun_direction = np.array([0.5, 0.8, 0.3], np.float32)
        self.sun_color = np.array([1.0, 0.96, 0.9], np.float32)
        self.sun_intensity = 2.5
        self.ambient = np.array([0.25, 0.28, 0.33], np.float32)

    def add(self, mesh: Mesh) -> Mesh:
        self.meshes.append(mesh)
        return mesh

    def visible_meshes(self) -> list:
        """``getVisibleChildren`` analog (`SceneUtils.js:17-30`)."""
        return [m for m in self.meshes if m.visible]

    def pack(self) -> PackedScene:
        positions, normals, faces, vert_ids, mats = [], [], [], [], []
        offset = 0
        for i, mesh in enumerate(self.meshes):
            if not mesh.visible:
                # keep the mesh slot (matrices stay index-aligned) but
                # contribute no geometry
                mats.append(mesh.material.as_row())
                continue
            positions.append(mesh.positions)
            normals.append(mesh.normals)
            faces.append(mesh.faces + offset)
            vert_ids.append(np.full(len(mesh.positions), i, np.int32))
            mats.append(mesh.material.as_row())
            offset += len(mesh.positions)
        return PackedScene(
            positions=jnp.asarray(np.concatenate(positions), jnp.float32),
            normals=jnp.asarray(np.concatenate(normals), jnp.float32),
            faces=jnp.asarray(np.concatenate(faces), jnp.int32),
            vert_mesh_id=jnp.asarray(np.concatenate(vert_ids), jnp.int32),
            materials=jnp.asarray(np.stack(mats), jnp.float32),
        )

    def model_matrices(self) -> jnp.ndarray:
        return jnp.asarray(
            np.stack([m.matrix_world for m in self.meshes]).astype(np.float32)
        )

    def prev_model_matrices(self) -> jnp.ndarray:
        return jnp.asarray(
            np.stack(
                [
                    m.prev_matrix_world if m.prev_matrix_world is not None else m.matrix_world
                    for m in self.meshes
                ]
            ).astype(np.float32)
        )

    def commit_frame(self):
        for m in self.meshes:
            m.commit_frame()

    def lighting_params(self) -> dict:
        sun = self.sun_direction / np.linalg.norm(self.sun_direction)
        return {
            "sun_direction": jnp.asarray(sun, jnp.float32),
            "sun_color": jnp.asarray(self.sun_color * self.sun_intensity, jnp.float32),
            "ambient": jnp.asarray(self.ambient, jnp.float32),
            "background_color": jnp.asarray(self.background_color, jnp.float32),
        }
