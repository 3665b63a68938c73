"""glTF keyframe animation: sampler math, mixer semantics, loader wiring.

The reference plays glTF animations through three.js' AnimationMixer
(`/root/reference/example/main.js:949-957`, advanced by the frame clock
at `main.js:629-632`); the framework's native analog is
`scene/animation.py` driving the retained node hierarchy of
`scene/gltf.py::GltfAsset`.
"""

import base64
import json
import os

import numpy as np
import pytest

from realism_effects_tpu.scene.animation import (
    AnimationChannel, AnimationClip, AnimationMixer, compose_trs,
    decompose_trs, matrix_to_quat, quat_to_matrix, slerp,
)
from realism_effects_tpu.scene.gltf import load_gltf_asset


# ---------------------------------------------------------------------------
# quaternion / TRS helpers
# ---------------------------------------------------------------------------

class TestQuatMath:
    def test_quat_matrix_round_trip(self):
        rng = np.random.default_rng(7)
        for _ in range(20):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            q2 = matrix_to_quat(quat_to_matrix(q))
            # q and -q encode the same rotation
            assert (np.allclose(q, q2, atol=1e-12)
                    or np.allclose(q, -q2, atol=1e-12))

    def test_slerp_endpoints_and_midpoint(self):
        q0 = np.array([0.0, 0.0, 0.0, 1.0])
        # 90 deg about z
        q1 = np.array([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
        assert np.allclose(slerp(q0, q1, 0.0), q0)
        assert np.allclose(slerp(q0, q1, 1.0), q1)
        mid = slerp(q0, q1, 0.5)  # 45 deg about z
        expect = np.array([0, 0, np.sin(np.pi / 8), np.cos(np.pi / 8)])
        assert np.allclose(mid, expect, atol=1e-12)

    def test_slerp_takes_shortest_path(self):
        q0 = np.array([0.0, 0.0, 0.0, 1.0])
        q1 = np.array([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
        mid_flipped = slerp(q0, -q1, 0.5)
        assert np.allclose(np.abs(mid_flipped),
                           np.abs(slerp(q0, q1, 0.5)), atol=1e-12)

    def test_decompose_compose_round_trip(self):
        rng = np.random.default_rng(3)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        m = compose_trs(np.array([1.0, -2.0, 3.0]), q,
                        np.array([2.0, 0.5, 1.5]))
        t, r, s = decompose_trs(m)
        assert np.allclose(compose_trs(t, r, s), m, atol=1e-12)


# ---------------------------------------------------------------------------
# channel sampling (glTF 2.0 sampler semantics)
# ---------------------------------------------------------------------------

class TestChannelSampling:
    def test_linear_translation(self):
        ch = AnimationChannel(
            node=0, path="translation",
            times=np.array([0.0, 1.0, 3.0]),
            values=np.array([[0, 0, 0], [2, 0, 0], [2, 4, 0]], np.float64))
        assert np.allclose(ch.sample(0.5), [1, 0, 0])
        assert np.allclose(ch.sample(2.0), [2, 2, 0])
        # clamped outside the key range
        assert np.allclose(ch.sample(-1.0), [0, 0, 0])
        assert np.allclose(ch.sample(9.0), [2, 4, 0])

    def test_step_holds_previous_key(self):
        ch = AnimationChannel(
            node=0, path="scale", interpolation="STEP",
            times=np.array([0.0, 1.0]),
            values=np.array([[1, 1, 1], [3, 3, 3]], np.float64))
        assert np.allclose(ch.sample(0.999), [1, 1, 1])
        assert np.allclose(ch.sample(1.0), [3, 3, 3])

    def test_linear_rotation_is_slerp(self):
        q0 = np.array([0.0, 0.0, 0.0, 1.0])
        q1 = np.array([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
        ch = AnimationChannel(
            node=0, path="rotation",
            times=np.array([0.0, 2.0]), values=np.stack([q0, q1]))
        assert np.allclose(
            ch.sample(1.0),
            [0, 0, np.sin(np.pi / 8), np.cos(np.pi / 8)], atol=1e-12)

    def test_cubicspline_hermite(self):
        """glTF appendix-C Hermite: zero tangents reduce to smoothstep
        blending between the two key values."""
        p0, p1 = np.array([0.0]), np.array([4.0])
        zero = np.zeros(1)
        ch = AnimationChannel(
            node=0, path="weights", interpolation="CUBICSPLINE",
            times=np.array([0.0, 2.0]),
            values=np.array([[zero, p0, zero], [zero, p1, zero]]))
        u = 0.25  # t=0.5 of [0,2]
        expect = (3 * u * u - 2 * u ** 3) * 4.0
        assert np.allclose(ch.sample(0.5), [expect], atol=1e-12)
        # endpoints exact
        assert np.allclose(ch.sample(0.0), p0)
        assert np.allclose(ch.sample(2.0), p1)

    def test_cubicspline_tangents_scale_with_interval(self):
        """Nonzero out-tangent at key0: value'(t0) = tangent (the spec
        multiplies stored tangents by the keyframe interval)."""
        tan = np.array([1.0])
        ch = AnimationChannel(
            node=0, path="weights", interpolation="CUBICSPLINE",
            times=np.array([0.0, 4.0]),
            values=np.array([
                [np.zeros(1), np.zeros(1), tan],
                [np.zeros(1), np.zeros(1), np.zeros(1)]]))
        eps = 1e-5
        deriv = (ch.sample(eps) - ch.sample(0.0)) / eps
        assert np.allclose(deriv, [1.0], atol=1e-3)


# ---------------------------------------------------------------------------
# synthetic .gltf documents exercising the loader + mixer end-to-end
# ---------------------------------------------------------------------------

def _write_gltf(tmp_path, doc, blobs):
    """Write a .gltf with data-URI buffers built from numpy arrays."""
    buffers = []
    for blob in blobs:
        raw = blob.tobytes()
        buffers.append({
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(raw).decode(),
            "byteLength": len(raw),
        })
    doc["buffers"] = buffers
    path = os.path.join(str(tmp_path), "anim.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


def _tri_mesh_doc():
    """Single-triangle mesh + one node, accessors in buffer 0."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "accessors": [{
            "bufferView": 0, "componentType": 5126, "count": 3,
            "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0],
        }],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": 36}],
    }
    return doc, pos


class TestLoaderAnimation:
    def test_translation_channel_moves_mesh(self, tmp_path):
        doc, pos = _tri_mesh_doc()
        times = np.array([0.0, 1.0], np.float32)
        vals = np.array([[0, 0, 0], [0, 2, 0]], np.float32)
        blob = np.concatenate(
            [pos.reshape(-1), times, vals.reshape(-1)]).astype(np.float32)
        doc["bufferViews"] += [
            {"buffer": 0, "byteOffset": 36, "byteLength": 8},
            {"buffer": 0, "byteOffset": 44, "byteLength": 24},
        ]
        doc["accessors"] += [
            {"bufferView": 1, "componentType": 5126, "count": 2,
             "type": "SCALAR", "min": [0.0], "max": [1.0]},
            {"bufferView": 2, "componentType": 5126, "count": 2,
             "type": "VEC3"},
        ]
        doc["animations"] = [{
            "name": "rise",
            "samplers": [{"input": 1, "output": 2,
                          "interpolation": "LINEAR"}],
            "channels": [{"sampler": 0,
                          "target": {"node": 0, "path": "translation"}}],
        }]
        asset = load_gltf_asset(_write_gltf(tmp_path, doc, [blob]))
        assert len(asset.animations) == 1
        clip = asset.animations[0]
        assert clip.name == "rise" and clip.duration == pytest.approx(1.0)

        mixer = AnimationMixer(asset)
        mixer.clip_action("rise").play()
        mixer.set_time(0.5)
        mesh = asset.meshes[0]
        assert np.allclose(mesh.matrix_world[:3, 3], [0, 1, 0])
        # prev-frame matrix snapshot feeds the velocity pass
        mixer.update(0.25)
        assert np.allclose(mesh.prev_matrix_world[:3, 3], [0, 1, 0])
        assert np.allclose(mesh.matrix_world[:3, 3], [0, 1.5, 0])

    def test_looping_wraps_clip_time(self, tmp_path):
        doc, pos = _tri_mesh_doc()
        times = np.array([0.0, 1.0], np.float32)
        vals = np.array([[0, 0, 0], [4, 0, 0]], np.float32)
        blob = np.concatenate(
            [pos.reshape(-1), times, vals.reshape(-1)]).astype(np.float32)
        doc["bufferViews"] += [
            {"buffer": 0, "byteOffset": 36, "byteLength": 8},
            {"buffer": 0, "byteOffset": 44, "byteLength": 24},
        ]
        doc["accessors"] += [
            {"bufferView": 1, "componentType": 5126, "count": 2,
             "type": "SCALAR", "min": [0.0], "max": [1.0]},
            {"bufferView": 2, "componentType": 5126, "count": 2,
             "type": "VEC3"},
        ]
        doc["animations"] = [{
            "samplers": [{"input": 1, "output": 2}],
            "channels": [{"sampler": 0,
                          "target": {"node": 0, "path": "translation"}}],
        }]
        asset = load_gltf_asset(_write_gltf(tmp_path, doc, [blob]))
        mixer = AnimationMixer(asset)
        action = mixer.clip_action(0).play()
        mixer.set_time(1.25)  # LoopRepeat: wraps to 0.25
        assert np.allclose(asset.meshes[0].matrix_world[:3, 3], [1, 0, 0])
        action.loop = False
        mixer.set_time(1.25)  # clamped at duration
        assert np.allclose(asset.meshes[0].matrix_world[:3, 3], [4, 0, 0])

    def test_morph_targets_and_weights_channel(self, tmp_path):
        doc, pos = _tri_mesh_doc()
        delta = np.array([[0, 0, 1], [0, 0, 1], [0, 0, 1]], np.float32)
        times = np.array([0.0, 2.0], np.float32)
        wvals = np.array([0.0, 1.0], np.float32)  # one target => (N, 1)
        blob = np.concatenate([
            pos.reshape(-1), delta.reshape(-1), times, wvals]).astype(
            np.float32)
        doc["meshes"][0]["primitives"][0]["targets"] = [{"POSITION": 1}]
        doc["meshes"][0]["weights"] = [0.25]
        doc["bufferViews"] += [
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 8},
            {"buffer": 0, "byteOffset": 80, "byteLength": 8},
        ]
        doc["accessors"] += [
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 2,
             "type": "SCALAR", "min": [0.0], "max": [2.0]},
            {"bufferView": 3, "componentType": 5126, "count": 2,
             "type": "SCALAR"},
        ]
        doc["animations"] = [{
            "samplers": [{"input": 2, "output": 3}],
            "channels": [{"sampler": 0,
                          "target": {"node": 0, "path": "weights"}}],
        }]
        asset = load_gltf_asset(_write_gltf(tmp_path, doc, [blob]))
        mesh = asset.meshes[0]
        # morph deltas parsed; default weight from mesh.weights
        assert mesh.morph_positions.shape == (1, 3, 3)
        assert np.allclose(mesh.morph_positions[0], delta)
        assert np.allclose(mesh.morph_weights, [0.25])

        mixer = AnimationMixer(asset)
        mixer.clip_action(0).play()
        mixer.set_time(1.0)
        assert np.allclose(mesh.morph_weights, [0.5])
        mixer.set_time(2.0)
        assert np.allclose(mesh.prev_morph_weights, [0.5])
        assert np.allclose(mesh.morph_weights, [1.0])

    def test_animated_skin_updates_bone_palette(self, tmp_path):
        """Rotation channel on a joint regenerates globalJoint @ IBM and
        snapshots the previous palette (skinned-velocity source,
        `VelocityDepthNormalPass.js:24-64`)."""
        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        joints = np.zeros((3, 4), np.uint16)
        weights = np.zeros((3, 4), np.float32)
        weights[:, 0] = 1.0
        ibm = np.eye(4, dtype=np.float32).T.reshape(-1)  # column-major
        times = np.array([0.0, 1.0], np.float32)
        # joint rotates 0 -> 90 deg about z
        quats = np.array(
            [[0, 0, 0, 1],
             [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)]], np.float32)
        blob_f32 = np.concatenate([
            pos.reshape(-1), weights.reshape(-1), ibm, times,
            quats.reshape(-1)]).astype(np.float32)
        blob_u16 = joints.reshape(-1)
        doc = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0, 1]}],
            "nodes": [
                {"mesh": 0, "skin": 0},
                {},  # joint node
            ],
            "skins": [{"joints": [1], "inverseBindMatrices": 2}],
            "meshes": [{"primitives": [{"attributes": {
                "POSITION": 0, "WEIGHTS_0": 1, "JOINTS_0": 5}}]}],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 36},
                {"buffer": 0, "byteOffset": 36, "byteLength": 48},
                {"buffer": 0, "byteOffset": 84, "byteLength": 64},
                {"buffer": 0, "byteOffset": 148, "byteLength": 8},
                {"buffer": 0, "byteOffset": 156, "byteLength": 32},
                {"buffer": 1, "byteOffset": 0, "byteLength": 24},
            ],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3,
                 "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
                {"bufferView": 1, "componentType": 5126, "count": 3,
                 "type": "VEC4"},
                {"bufferView": 2, "componentType": 5126, "count": 1,
                 "type": "MAT4"},
                {"bufferView": 3, "componentType": 5126, "count": 2,
                 "type": "SCALAR", "min": [0.0], "max": [1.0]},
                {"bufferView": 4, "componentType": 5126, "count": 2,
                 "type": "VEC4"},
                {"bufferView": 5, "componentType": 5123, "count": 3,
                 "type": "VEC4"},
            ],
            "animations": [{
                "samplers": [{"input": 3, "output": 4}],
                "channels": [{"sampler": 0,
                              "target": {"node": 1, "path": "rotation"}}],
            }],
        }
        path = _write_gltf(tmp_path, doc, [blob_f32, blob_u16])
        asset = load_gltf_asset(path)
        mesh = asset.meshes[0]
        assert mesh.skin_indices is not None
        assert np.allclose(mesh.bone_matrices[0], np.eye(4))

        mixer = AnimationMixer(asset)
        mixer.clip_action(0).play()
        mixer.set_time(1.0)
        # palette now rotates +90 deg about z: x-axis -> y-axis
        rot = np.asarray(mesh.bone_matrices[0])[:3, :3]
        assert np.allclose(rot @ [1, 0, 0], [0, 1, 0], atol=1e-6)
        mixer.update(0.0)
        assert np.allclose(
            np.asarray(mesh.prev_bone_matrices[0])[:3, :3], rot, atol=1e-6)


class TestSparseAccessor:
    def test_sparse_morph_deltas(self, tmp_path):
        """Sparse accessors (glTF §3.6.2.3) overlay indexed values on a
        zero base — the spec's canonical use is morph-target deltas."""
        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        sparse_vals = np.array([[0, 0, 5]], np.float32)   # vertex 1 only
        sparse_idx = np.array([1], np.uint16)
        blob = (pos.tobytes() + sparse_vals.tobytes()
                + sparse_idx.tobytes())
        doc = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0},
                "targets": [{"POSITION": 1}]}]}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3,
                 "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
                {"componentType": 5126, "count": 3, "type": "VEC3",
                 "sparse": {
                     "count": 1,
                     "indices": {"bufferView": 2, "componentType": 5123},
                     "values": {"bufferView": 1},
                 }},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 36},
                {"buffer": 0, "byteOffset": 36, "byteLength": 12},
                {"buffer": 0, "byteOffset": 48, "byteLength": 2},
            ],
            "buffers": [{
                "uri": "data:application/octet-stream;base64,"
                       + base64.b64encode(blob).decode(),
                "byteLength": len(blob)}],
        }
        path = os.path.join(str(tmp_path), "sparse.gltf")
        with open(path, "w") as f:
            json.dump(doc, f)
        asset = load_gltf_asset(path)
        mp = asset.meshes[0].morph_positions
        assert mp.shape == (1, 3, 3)
        assert np.allclose(mp[0], [[0, 0, 0], [0, 0, 5], [0, 0, 0]])


REF_TRAA = ("/root/reference/example/public/gltf/"
            "traa_demo_scene.optimized.glb")


@pytest.mark.skipif(not os.path.exists(REF_TRAA), reason="reference absent")
class TestReferenceAsset:
    def test_traa_demo_scene_clips_play(self):
        """The reference's AA torture scene ships 4 animation clips
        (LINEAR + STEP TRS channels) that its demo plays on load
        (`main.js:949-957`); they load and drive the meshes here."""
        asset = load_gltf_asset(REF_TRAA)
        assert len(asset.animations) == 4
        assert all(c.duration > 0 for c in asset.animations)
        mixer = AnimationMixer(asset)
        for clip in asset.animations:
            mixer.clip_action(clip).play()
        before = [np.asarray(m.matrix_world).copy() for m in asset.meshes]
        mixer.set_time(0.5)
        moved = sum(
            1 for b, m in zip(before, asset.meshes)
            if not np.allclose(b, m.matrix_world))
        assert moved >= 3  # Cube/Plane/Cylinder/Plane.002 all animate
