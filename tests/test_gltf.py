"""glTF loader / GLB writer tests.

The reference loads glTF demo scenes through three.js
(`example/main.js:760-809`); here ``load_gltf`` brings glTF 2.0 assets
into the Scene API, including the reference's own Draco-compressed
demo scenes (decoded by `scene/draco.py` / `native/draco.cpp`; see
test_draco.py for the decoder's own coverage).
"""

import os

import numpy as np
import pytest

from realism_effects_tpu.composer import EffectComposer
from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.effects.ao import HBAOEffect
from realism_effects_tpu.scene.geometry import (
    Material, make_box, make_plane, make_sphere, translation,
)
from realism_effects_tpu.scene.gltf import load_gltf, write_glb
from realism_effects_tpu.scene.scene import Scene


def _demo_meshes():
    checker = np.ones((16, 16, 4), np.float32)
    yy, xx = np.mgrid[0:16, 0:16]
    checker[..., :3] = np.where(
        (((xx // 4) + (yy // 4)) % 2 == 0)[..., None], 0.9, 0.25)
    plane = make_plane(8, Material(diffuse=(1, 1, 1, 1), map=checker))
    box = make_box((1, 1, 1), Material(
        diffuse=(0.9, 0.3, 0.2, 1.0), roughness=0.4, metalness=0.1,
        emissive=(0.2, 0.0, 0.0)))
    box.set_matrix(translation(0, 0.5, 0))
    sphere = make_sphere(0.6, material=Material(
        diffuse=(0.2, 0.5, 0.9, 1.0), roughness=0.15, metalness=0.9))
    sphere.set_matrix(translation(1.4, 0.6, 0.4))
    return [plane, box, sphere]


class TestRoundTrip:
    def test_geometry_and_materials_survive(self, tmp_path):
        meshes = _demo_meshes()
        path = str(tmp_path / "scene.glb")
        write_glb(meshes, path)
        loaded = load_gltf(path)
        assert len(loaded) == len(meshes)
        for src, dst in zip(meshes, loaded):
            np.testing.assert_allclose(dst.positions, src.positions, atol=1e-6)
            np.testing.assert_allclose(dst.normals, src.normals, atol=1e-6)
            np.testing.assert_array_equal(dst.faces, src.faces)
            np.testing.assert_allclose(
                dst.matrix_world, src.matrix_world, atol=1e-9)
            np.testing.assert_allclose(
                dst.material.diffuse, src.material.diffuse, atol=1e-6)
            assert abs(dst.material.roughness - src.material.roughness) < 1e-6
            assert abs(dst.material.metalness - src.material.metalness) < 1e-6
            if src.uvs is not None:
                np.testing.assert_allclose(dst.uvs, src.uvs, atol=1e-6)

    def test_texture_roundtrip(self, tmp_path):
        meshes = _demo_meshes()
        path = str(tmp_path / "tex.glb")
        write_glb(meshes, path)
        loaded = load_gltf(path)
        tex = loaded[0].material.map
        assert tex is not None and tex.shape == (16, 16, 4)
        # checker survives srgb round-trip + 8-bit quantization
        src = meshes[0].material.map
        np.testing.assert_allclose(tex[..., :3], src[..., :3], atol=0.02)

    def test_alpha_map_roundtrip(self, tmp_path):
        tex = np.ones((8, 8, 4), np.float32)
        amap = np.zeros((8, 8, 4), np.float32)
        amap[..., 1] = np.linspace(0, 1, 8)[None, :].repeat(8, 0)
        plane = make_plane(2, Material(map=tex, alpha_map=amap))
        path = str(tmp_path / "alpha.glb")
        write_glb([plane], path)
        (loaded,) = load_gltf(path)
        assert loaded.material.alpha_map is not None
        np.testing.assert_allclose(
            loaded.material.alpha_map[..., 1], amap[..., 1], atol=0.01)


class TestRendering:
    def test_loaded_scene_renders(self, tmp_path):
        path = str(tmp_path / "scene.glb")
        write_glb(_demo_meshes(), path)
        scene = Scene()
        for m in load_gltf(path):
            scene.add(m)
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(3, 2.5, 4)
        cam.look_at((0, 0.5, 0))
        composer = EffectComposer(scene, cam, 64, 64)
        composer.add_effect(HBAOEffect(spp=4))
        img = np.asarray(composer.render(dt=1 / 60))
        assert np.isfinite(img).all()
        assert img.max() > 0.01  # something rendered


class TestReferenceAssets:
    REF = "/root/reference/example/public/gltf/flashbang_grenade.optimized.glb"

    @pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
    def test_draco_assets_load(self):
        """The reference's Draco-compressed demo assets load end-to-end
        through scene/draco (was a hard error before the decoder)."""
        meshes = load_gltf(self.REF)
        assert len(meshes) == 8
        assert sum(len(m.positions) for m in meshes) == 6277
        assert all(m.material.map is not None for m in meshes)  # webp


class TestGltfJsonVariant:
    def test_gltf_json_with_data_uri_buffer(self, tmp_path):
        """.gltf (JSON) files with base64 data-URI buffers load too."""
        import base64
        import json
        import struct

        positions = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        normals = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
        indices = np.array([0, 1, 2], np.uint16)
        blob = positions.tobytes() + normals.tobytes() + indices.tobytes()
        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0, "translation": [1, 2, 3]}],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1}, "indices": 2,
            }]}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3,
                 "type": "VEC3"},
                {"bufferView": 1, "componentType": 5126, "count": 3,
                 "type": "VEC3"},
                {"bufferView": 2, "componentType": 5123, "count": 3,
                 "type": "SCALAR"},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 36},
                {"buffer": 0, "byteOffset": 36, "byteLength": 36},
                {"buffer": 0, "byteOffset": 72, "byteLength": 6},
            ],
            "buffers": [{
                "byteLength": len(blob),
                "uri": "data:application/octet-stream;base64,"
                       + base64.b64encode(blob).decode(),
            }],
        }
        path = str(tmp_path / "tri.gltf")
        with open(path, "w") as f:
            json.dump(gltf, f)
        (mesh,) = load_gltf(path)
        np.testing.assert_allclose(mesh.positions, positions)
        np.testing.assert_array_equal(mesh.faces, [[0, 1, 2]])
        np.testing.assert_allclose(mesh.matrix_world[:3, 3], [1, 2, 3])

    def test_external_buffer_file(self, tmp_path):
        import json

        positions = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32)
        (tmp_path / "tri.bin").write_bytes(positions.tobytes())
        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
            "accessors": [{"bufferView": 0, "componentType": 5126,
                           "count": 3, "type": "VEC3"}],
            "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": 36}],
            "buffers": [{"byteLength": 36, "uri": "tri.bin"}],
        }
        path = str(tmp_path / "tri.gltf")
        with open(path, "w") as f:
            json.dump(gltf, f)
        (mesh,) = load_gltf(path)
        np.testing.assert_allclose(mesh.positions, positions)
        # no NORMAL attribute: face normals computed (+z for this winding)
        np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 3, atol=1e-6)


class TestGltfSkins:
    REF = "/root/reference/example/public/gltf/swordsman.optimized.glb"

    @pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
    def test_skins_wire_into_native_skinning(self):
        """glTF JOINTS_0/WEIGHTS_0 + inverseBindMatrices populate the
        Mesh skinning fields (bone j = globalJoint_j @ IBM_j)."""
        meshes = load_gltf(self.REF)
        skinned = [m for m in meshes if m.skin_indices is not None]
        assert len(skinned) == 5
        for m in skinned:
            assert m.skin_indices.shape == (len(m.positions), 4)
            assert m.skin_weights.shape == (len(m.positions), 4)
            np.testing.assert_allclose(m.skin_weights.sum(-1), 1.0, atol=1e-3)
            assert m.skin_indices.max() < len(m.bone_matrices)
            # bind pose must land near the static base mesh, not at the
            # raw (unskinned) object-space coords
            bm = m.bone_matrices[m.skin_indices]
            w = m.skin_weights[:, :, None, None]
            skin = (bm * w).sum(1)
            pos = (np.einsum("vij,vj->vi", skin[:, :3, :3], m.positions)
                   + skin[:, :3, 3])
            assert np.abs(pos).max() < 10.0
            assert np.isfinite(pos).all()

    @pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
    def test_skinned_scene_renders(self):
        scene = Scene()
        for m in load_gltf(self.REF):
            scene.add(m)
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(3, 2.5, 4)
        cam.look_at((0, 1.2, 0))
        composer = EffectComposer(scene, cam, 64, 64)
        composer.add_effect(HBAOEffect(spp=2))
        img = np.asarray(composer.render(dt=1 / 60))
        assert np.isfinite(img).all()
        assert img.std() > 1e-4


class TestMalformedInput:
    """glTF files are untrusted input: every parse failure must surface
    as GltfError (a clean ValueError), never an implementation exception
    or a crash, and resource uris must not escape the asset directory."""

    REF = ("/root/reference/example/public/gltf/"
           "flashbang_grenade.optimized.glb")

    def _try(self, data, tmp_path, name="m.glb"):
        from realism_effects_tpu.scene.gltf import GltfError, load_gltf_asset

        p = tmp_path / name
        p.write_bytes(data)
        try:
            load_gltf_asset(str(p))
            return "ok"
        except GltfError:
            return "clean"

    @pytest.mark.skipif(not os.path.exists(REF), reason="no reference")
    def test_truncations_fail_cleanly(self, tmp_path):
        data = open(self.REF, "rb").read()
        for frac in (0.01, 0.1, 0.3, 0.6, 0.9, 0.999):
            r = self._try(data[: int(len(data) * frac)], tmp_path)
            assert r in ("ok", "clean"), frac

    @pytest.mark.skipif(not os.path.exists(REF), reason="no reference")
    def test_byte_flips_fail_cleanly(self, tmp_path):
        data = bytearray(open(self.REF, "rb").read())
        rng = np.random.default_rng(0)
        for trial in range(12):
            mutated = bytearray(data)
            for _ in range(8):
                i = int(rng.integers(0, len(mutated)))
                mutated[i] ^= int(rng.integers(1, 256))
            r = self._try(bytes(mutated), tmp_path, f"m{trial}.glb")
            assert r in ("ok", "clean"), trial

    def test_structural_garbage(self, tmp_path):
        cases = [
            b"",
            b"glTF",                        # truncated header
            b"glTF" + b"\x02\x00\x00\x00" + b"\x00" * 8,   # no chunks
            b"not json at all {{{",
            # wrong type for a node-referenced mesh
            b'{"scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}], '
            b'"meshes": 7}',
            # accessor index out of range on a referenced mesh
            b'{"scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}], '
            b'"meshes": [{"primitives": [{"attributes": '
            b'{"POSITION": 99}, "indices": 0}]}], "accessors": []}',
            b"[1, 2, 3]",                   # non-object root
        ]
        for i, data in enumerate(cases):
            name = f"g{i}.gltf" if not data.startswith(b"glTF") \
                else f"g{i}.glb"
            assert self._try(data, tmp_path, name) == "clean", i

    def test_uri_escape_refused(self, tmp_path):
        from realism_effects_tpu.scene.gltf import GltfError, load_gltf_asset

        (tmp_path / "a").mkdir()
        secret = tmp_path / "secret.bin"
        secret.write_bytes(b"\x00" * 64)
        doc = {
            "asset": {"version": "2.0"},
            "buffers": [{"uri": "../secret.bin", "byteLength": 64}],
            "scenes": [{"nodes": []}],
        }
        p = tmp_path / "a" / "evil.gltf"
        p.write_text(__import__("json").dumps(doc))
        with pytest.raises(GltfError, match="escapes"):
            load_gltf_asset(str(p))
