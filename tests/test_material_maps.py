"""Normal-map perturbation + metallic-roughness textures in the G-buffer.

The reference's G-buffer material is a patched MeshPhysicalMaterial, so
its packed normal/roughness/metalness include normalMap and
roughnessMap/metalnessMap sampling (`GBufferMaterial.js:6-98`,
three.js `normal_fragment_maps` via ``getTangentFrame``).
"""

import numpy as np
import jax

from realism_effects_tpu import (
    Material, PerspectiveCamera, Scene, make_plane,
)
from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer


def _render_plane(material, size=64):
    scene = Scene()
    scene.add(make_plane(4, material))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(0, 3, 0.01)
    cam.look_at((0, 0, 0))
    m = cam.matrices()
    return rasterize_gbuffer(
        scene.pack(), scene.model_matrices(), m.projection_view_matrix,
        size, size)


class TestMRMap:
    def test_mr_texture_multiplies_factors(self):
        mr = np.zeros((8, 8, 4), np.float32)
        mr[..., 1] = 0.25   # roughness (G)
        mr[..., 2] = 0.75   # metalness (B)
        gb = _render_plane(Material(roughness=0.8, metalness=1.0, mr_map=mr))
        c = slice(28, 36)
        assert np.allclose(np.asarray(gb.roughness)[c, c], 0.2, atol=1e-3)
        assert np.allclose(np.asarray(gb.metalness)[c, c], 0.75, atol=1e-3)

    def test_no_mr_map_keeps_factors(self):
        gb = _render_plane(Material(roughness=0.8, metalness=0.3))
        c = slice(28, 36)
        assert np.allclose(np.asarray(gb.roughness)[c, c], 0.8, atol=1e-3)
        assert np.allclose(np.asarray(gb.metalness)[c, c], 0.3, atol=1e-3)


class TestNormalMap:
    def test_flat_map_is_identity(self):
        flat = np.zeros((8, 8, 4), np.float32)
        flat[..., 0] = 0.5
        flat[..., 1] = 0.5
        flat[..., 2] = 1.0
        gb = _render_plane(Material(normal_map=flat))
        n = np.asarray(gb.normal)[28:36, 28:36]
        # plane normal is +y
        assert np.allclose(n, [0, 1, 0], atol=2e-2)

    def test_tilted_map_tilts_and_scale_flips(self):
        def tilted(r):
            t = np.zeros((8, 8, 4), np.float32)
            t[..., 0] = r
            t[..., 1] = 0.5
            t[..., 2] = 0.8
            return t

        gb_pos = _render_plane(Material(normal_map=tilted(1.0)))
        gb_neg = _render_plane(Material(normal_map=tilted(0.0)))
        c = slice(28, 36)
        n_pos = np.asarray(gb_pos.normal)[c, c].mean((0, 1))
        n_neg = np.asarray(gb_neg.normal)[c, c].mean((0, 1))
        # unit length, genuinely tilted away from +y
        assert abs(np.linalg.norm(n_pos) - 1.0) < 0.05
        assert n_pos[1] < 0.95
        # opposite red channels tilt in opposite tangent directions
        horiz_pos = np.array([n_pos[0], n_pos[2]])
        horiz_neg = np.array([n_neg[0], n_neg[2]])
        assert np.dot(horiz_pos, horiz_neg) < 0
        # normal_scale=0 restores the geometric normal
        gb_zero = _render_plane(
            Material(normal_map=tilted(1.0), normal_scale=0.0))
        assert np.allclose(
            np.asarray(gb_zero.normal)[c, c], [0, 1, 0], atol=2e-2)


class TestAOMap:
    def test_ao_map_darkens_ambient_only(self):
        from realism_effects_tpu.scene.shading import shade_direct

        dark = np.zeros((8, 8, 4), np.float32)
        dark[..., 0] = 0.25  # R channel = occlusion
        scene = Scene()
        scene.sun_intensity = 0.0  # ambient-only lighting
        scene.add(make_plane(4, Material(ao_map=dark)))
        cam = PerspectiveCamera(50, 1, 0.1, 100)
        cam.set_position(0, 3, 0.01)
        cam.look_at((0, 0, 0))
        m = cam.matrices()
        gb = rasterize_gbuffer(
            scene.pack(), scene.model_matrices(),
            m.projection_view_matrix, 64, 64)
        c = slice(28, 36)
        # ao plane carries 1 + strength*(r-1) = 0.25
        assert np.allclose(np.asarray(gb.ao)[c, c], 0.25, atol=1e-3)
        lit = np.asarray(shade_direct(gb, m, scene.lighting_params()))
        gb_no = gb.replace(ao=None)
        lit_no = np.asarray(shade_direct(gb_no, m, scene.lighting_params()))
        assert np.allclose(lit[c, c], lit_no[c, c] * 0.25, atol=1e-4)

    def test_ao_strength_half(self):
        dark = np.zeros((8, 8, 4), np.float32)
        gb = _render_plane(Material(ao_map=dark, ao_strength=0.5))
        c = slice(28, 36)
        assert np.allclose(np.asarray(gb.ao)[c, c], 0.5, atol=1e-3)


class TestGltfMaterialMaps:
    def test_loader_parses_normal_and_mr(self, tmp_path):
        import base64
        import io
        import json
        import os

        from PIL import Image

        from realism_effects_tpu.scene.gltf import load_gltf

        def png_uri(rgb):
            arr = np.full((4, 4, 3), rgb, np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "PNG")
            return ("data:image/png;base64,"
                    + base64.b64encode(buf.getvalue()).decode())

        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        doc = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0}, "material": 0}]}],
            "materials": [{
                "pbrMetallicRoughness": {
                    "metallicRoughnessTexture": {"index": 0},
                },
                "normalTexture": {"index": 1, "scale": 0.5},
            }],
            "textures": [{"source": 0}, {"source": 1}],
            "images": [{"uri": png_uri((0, 128, 64))},
                       {"uri": png_uri((128, 128, 255))}],
            "accessors": [{
                "bufferView": 0, "componentType": 5126, "count": 3,
                "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]}],
            "bufferViews": [{"buffer": 0, "byteOffset": 0,
                             "byteLength": 36}],
            "buffers": [{
                "uri": "data:application/octet-stream;base64,"
                       + base64.b64encode(pos.tobytes()).decode(),
                "byteLength": 36}],
        }
        path = os.path.join(str(tmp_path), "maps.gltf")
        with open(path, "w") as f:
            json.dump(doc, f)
        (mesh,) = load_gltf(path)
        assert mesh.material.mr_map is not None
        # linear data: G=128 stays ~0.5 (no sRGB decode)
        assert abs(mesh.material.mr_map[0, 0, 1] - 128 / 255) < 1e-3
        assert mesh.material.normal_map is not None
        assert abs(mesh.material.normal_map[0, 0, 2] - 1.0) < 1e-3
        assert mesh.material.normal_scale == 0.5
