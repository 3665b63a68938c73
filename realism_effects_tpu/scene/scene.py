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

from .geometry import Mesh


@chex.dataclass(frozen=True)
class PackedScene:
    """Static scene arrays (a pytree); upload once, reuse per frame."""

    positions: jnp.ndarray   # (V, 3)
    normals: jnp.ndarray     # (V, 3)
    faces: jnp.ndarray       # (F, 3) int32
    vert_mesh_id: jnp.ndarray  # (V,) int32
    materials: jnp.ndarray   # (M, MATERIAL_ROW_SIZE)
    skin_indices: jnp.ndarray  # (V, 4) int32 into the global bone table
    skin_weights: jnp.ndarray  # (V, 4) float32
    uvs: jnp.ndarray           # (V, 2) float32 texture coordinates
    map_atlas: jnp.ndarray     # (N, S, S, 4) material textures (N may be 0)
    map_index: jnp.ndarray     # (M,) int32 page into map_atlas, -1 = none
    emissive_map_index: jnp.ndarray  # (M,) int32, -1 = none
    alpha_map_index: jnp.ndarray     # (M,) int32, -1 = none
    normal_map_index: jnp.ndarray    # (M,) int32, -1 = none
    mr_map_index: jnp.ndarray        # (M,) int32, -1 = none
    ao_map_index: jnp.ndarray        # (M,) int32, -1 = none
    morph_pos_deltas: jnp.ndarray    # (V, T, 3) position deltas (T may be 0)
    morph_nrm_deltas: jnp.ndarray    # (V, T, 3) normal deltas

    @property
    def num_morph_targets(self) -> int:
        return int(self.morph_pos_deltas.shape[1])

    @property
    def has_skinning(self) -> bool:
        # weight layout (1,0,0,0) on bone 0 (identity) means unskinned
        return bool(self.skin_indices.shape[0] > 0)

    @property
    def num_faces(self) -> int:
        return int(self.faces.shape[0])


def _resize_texture(tex: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbor resize to (size, size, 4) float32 (alpha=1 pad)."""
    tex = np.asarray(tex, np.float32)
    if tex.ndim == 2:
        tex = tex[..., None].repeat(3, -1)
    if tex.shape[2] == 3:
        tex = np.concatenate([tex, np.ones_like(tex[..., :1])], -1)
    h, w = tex.shape[:2]
    ys = np.minimum((np.arange(size) * h) // size, h - 1)
    xs = np.minimum((np.arange(size) * w) // size, w - 1)
    return tex[ys][:, xs]


#: all material maps resample to this square atlas page size
TEXTURE_ATLAS_SIZE = 256


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
        #: GGX specular sun response strength (0 disables — the default
        #: keeps the Lambert-only look the golden fixtures pin; set 1.0
        #: for the three.js MeshPhysicalMaterial-style highlight)
        self.sun_specular = 0.0
        #: three.js PointLight analogs for the built-in shader
        #: (`add_point_light`); list of dicts, packed by lighting_params
        self.point_lights: list[dict] = []

    def add_point_light(self, position, color=(1.0, 1.0, 1.0),
                        intensity=1.0, distance=0.0, decay=2.0):
        """three.js ``PointLight(color, intensity, distance, decay)``
        analog for the built-in direct-light shader: physical inverse-
        square falloff with the same windowed cutoff three.js applies
        when ``distance > 0`` (``getDistanceAttenuation``:
        ``pow(clamp(1 - (d/distance)^4, 0, 1), 2) / d^decay``)."""
        self.point_lights.append({
            "position": np.asarray(position, np.float32),
            "color": np.asarray(color, np.float32),
            "intensity": float(intensity),
            "distance": float(distance),
            "decay": float(decay),
        })
        return self.point_lights[-1]

    def add(self, mesh: Mesh) -> Mesh:
        self.meshes.append(mesh)
        return mesh

    def visible_meshes(self) -> list:
        """``getVisibleChildren`` analog (`SceneUtils.js:17-30`)."""
        return [m for m in self.meshes if m.visible]

    def max_morph_targets(self) -> int:
        """Max morph-target count over all meshes (packed T dimension)."""
        return max(
            (m.morph_positions.shape[0] for m in self.meshes
             if m.morph_positions is not None),
            default=0,
        )

    def pack(self) -> PackedScene:
        positions, normals, faces, vert_ids, mats = [], [], [], [], []
        skin_idx, skin_wgt, uvs = [], [], []
        atlas_pages, map_idx, emis_idx, alpha_idx = [], [], [], []
        normal_idx, mr_idx, ao_idx = [], [], []
        morph_pos, morph_nrm = [], []
        t_max = self.max_morph_targets()
        offset = 0
        bone_offset = 1  # global bone 0 is the identity for unskinned verts

        def page_for(tex):
            if tex is None:
                return -1
            atlas_pages.append(_resize_texture(tex, TEXTURE_ATLAS_SIZE))
            return len(atlas_pages) - 1

        def morph_rows(mesh, nv):
            """(V, T_max, 3) zero-padded per-vertex morph deltas."""
            pos = np.zeros((nv, t_max, 3), np.float32)
            nrm = np.zeros((nv, t_max, 3), np.float32)
            if mesh.morph_positions is not None:
                t = mesh.morph_positions.shape[0]
                pos[:, :t] = np.transpose(
                    np.asarray(mesh.morph_positions, np.float32), (1, 0, 2))
                if mesh.morph_normals is not None:
                    nrm[:, :t] = np.transpose(
                        np.asarray(mesh.morph_normals, np.float32), (1, 0, 2))
            return pos, nrm

        for i, mesh in enumerate(self.meshes):
            map_idx.append(page_for(mesh.material.map))
            emis_idx.append(page_for(mesh.material.emissive_map))
            alpha_idx.append(page_for(mesh.material.alpha_map))
            normal_idx.append(page_for(mesh.material.normal_map))
            mr_idx.append(page_for(mesh.material.mr_map))
            ao_idx.append(page_for(mesh.material.ao_map))
            if not mesh.visible:
                # keep the mesh slot (matrices stay index-aligned) but
                # contribute no geometry
                mats.append(mesh.material.as_row())
                if mesh.bone_matrices is not None:
                    bone_offset += len(mesh.bone_matrices)
                continue
            nv = len(mesh.positions)
            positions.append(mesh.positions)
            normals.append(mesh.normals)
            faces.append(mesh.faces + offset)
            vert_ids.append(np.full(nv, i, np.int32))
            mats.append(mesh.material.as_row())
            uvs.append(
                mesh.uvs.astype(np.float32) if mesh.uvs is not None
                else np.zeros((nv, 2), np.float32)
            )
            if mesh.skin_indices is not None:
                skin_idx.append(mesh.skin_indices.astype(np.int32) + bone_offset)
                skin_wgt.append(mesh.skin_weights.astype(np.float32))
            else:
                skin_idx.append(np.zeros((nv, 4), np.int32))
                w = np.zeros((nv, 4), np.float32)
                w[:, 0] = 1.0
                skin_wgt.append(w)
            if t_max > 0:
                mp, mn = morph_rows(mesh, nv)
                morph_pos.append(mp)
                morph_nrm.append(mn)
            if mesh.bone_matrices is not None:
                bone_offset += len(mesh.bone_matrices)
            offset += nv
        if not positions:  # empty / fully-hidden scene: one degenerate tri
            positions = [np.zeros((1, 3), np.float32)]
            normals = [np.array([[0, 1, 0]], np.float32)]
            faces = [np.zeros((1, 3), np.int32)]  # zero-area: never covers
            vert_ids = [np.zeros(1, np.int32)]
            uvs = [np.zeros((1, 2), np.float32)]
            skin_idx = [np.zeros((1, 4), np.int32)]
            w0 = np.zeros((1, 4), np.float32); w0[:, 0] = 1.0
            skin_wgt = [w0]
            if t_max > 0:
                morph_pos = [np.zeros((1, t_max, 3), np.float32)]
                morph_nrm = [np.zeros((1, t_max, 3), np.float32)]
            if not mats:
                from .geometry import Material
                mats = [Material().as_row()]
        n_verts = sum(len(p) for p in positions)
        return PackedScene(
            positions=jnp.asarray(np.concatenate(positions), jnp.float32),
            normals=jnp.asarray(np.concatenate(normals), jnp.float32),
            faces=jnp.asarray(np.concatenate(faces), jnp.int32),
            vert_mesh_id=jnp.asarray(np.concatenate(vert_ids), jnp.int32),
            materials=jnp.asarray(np.stack(mats), jnp.float32),
            skin_indices=jnp.asarray(np.concatenate(skin_idx), jnp.int32),
            skin_weights=jnp.asarray(np.concatenate(skin_wgt), jnp.float32),
            uvs=jnp.asarray(np.concatenate(uvs), jnp.float32),
            map_atlas=jnp.asarray(
                np.stack(atlas_pages) if atlas_pages
                else np.zeros((0, TEXTURE_ATLAS_SIZE, TEXTURE_ATLAS_SIZE, 4),
                              np.float32)
            ),
            map_index=jnp.asarray(np.asarray(map_idx, np.int32)),
            emissive_map_index=jnp.asarray(np.asarray(emis_idx, np.int32)),
            alpha_map_index=jnp.asarray(np.asarray(alpha_idx, np.int32)),
            normal_map_index=jnp.asarray(np.asarray(normal_idx, np.int32)),
            mr_map_index=jnp.asarray(np.asarray(mr_idx, np.int32)),
            ao_map_index=jnp.asarray(np.asarray(ao_idx, np.int32)),
            morph_pos_deltas=jnp.asarray(
                np.concatenate(morph_pos) if morph_pos
                else np.zeros((n_verts, 0, 3), np.float32)
            ),
            morph_nrm_deltas=jnp.asarray(
                np.concatenate(morph_nrm) if morph_nrm
                else np.zeros((n_verts, 0, 3), np.float32)
            ),
        )

    # --- bone palettes (identity bone 0 + per-mesh palettes) ------------
    def num_bones(self) -> int:
        return 1 + sum(
            len(m.bone_matrices) for m in self.meshes if m.bone_matrices is not None
        )

    def bone_matrices(self, prev: bool = False) -> np.ndarray:
        mats = [np.eye(4)]
        for m in self.meshes:
            if m.bone_matrices is None:
                continue
            src = m.prev_bone_matrices if prev else m.bone_matrices
            if src is None:
                src = m.bone_matrices
            mats.extend(np.asarray(src))
        return np.stack(mats).astype(np.float32)

    # --- morph-target weights (per-mesh rows, zero-padded to T_max) ------
    def morph_weight_matrix(self, prev: bool = False) -> np.ndarray:
        t_max = self.max_morph_targets()
        out = np.zeros((max(len(self.meshes), 1), t_max), np.float32)
        for i, m in enumerate(self.meshes):
            w = m.prev_morph_weights if prev else m.morph_weights
            if w is None:
                w = m.morph_weights
            if w is not None:
                w = np.asarray(w, np.float32)
                out[i, : w.shape[0]] = w
        return out

    def gi_mask(self) -> np.ndarray:
        """Per-mesh SSGI participation (1 = traced, 0 = excluded); the
        Selection-layers analog (`SSGIPass.js:71-79`)."""
        return np.asarray(
            [0.0 if m.gi_exclude else 1.0 for m in self.meshes] or [1.0],
            np.float32,
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
        params = {
            "sun_direction": jnp.asarray(sun, jnp.float32),
            "sun_color": jnp.asarray(self.sun_color * self.sun_intensity, jnp.float32),
            "ambient": jnp.asarray(self.ambient, jnp.float32),
            "background_color": jnp.asarray(self.background_color, jnp.float32),
        }
        if self.sun_specular > 0.0:
            params["sun_specular"] = jnp.float32(self.sun_specular)
        if self.point_lights:
            params["point_positions"] = jnp.asarray(
                np.stack([pl["position"] for pl in self.point_lights]),
                jnp.float32)
            params["point_colors"] = jnp.asarray(
                np.stack([pl["color"] * pl["intensity"]
                          for pl in self.point_lights]), jnp.float32)
            params["point_distance"] = jnp.asarray(
                np.array([pl["distance"] for pl in self.point_lights]),
                jnp.float32)
            params["point_decay"] = jnp.asarray(
                np.array([pl["decay"] for pl in self.point_lights]),
                jnp.float32)
        return params
