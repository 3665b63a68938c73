"""Core substrate tests: transforms, sampling, packing codecs, RNG.

Covers the property tests SURVEY.md §4 calls for: pack/unpack round trips
(K3), sampler sanity, and screen<->world transform inverses.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from realism_effects_tpu.core import math3d, packing, sampling
from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.core.rng import (
    blue_noise_tile, pcg4d, r2_sequence, blue_noise_image,
)


class TestTransforms:
    def _camera(self):
        cam = PerspectiveCamera(60, 1.5, 0.1, 100.0)
        cam.set_position(1.0, 2.0, 3.0)
        cam.look_at((0.0, 0.0, 0.0))
        return cam.matrices()

    def test_screen_world_roundtrip(self):
        m = self._camera()
        rng = np.random.default_rng(0)
        world = jnp.asarray(rng.uniform(-2, 2, (64, 3)), jnp.float32)
        # project to screen + depth
        view = math3d.transform_point(m.view_matrix, world)
        in_front = np.asarray(view[:, 2]) < -0.2
        clip, w = math3d.transform_point_nodiv(m.projection_matrix, view)
        ndc = np.asarray(clip) / np.asarray(w)[:, None]
        uv = jnp.asarray(ndc[:, :2] * 0.5 + 0.5)
        depth = jnp.asarray(ndc[:, 2] * 0.5 + 0.5)
        back = math3d.screen_to_world(
            uv, depth, m.camera_matrix_world, m.projection_matrix_inverse
        )
        err = np.abs(np.asarray(back) - np.asarray(world))[in_front]
        assert err.max() < 1e-2

    def test_view_z_depth_roundtrip(self):
        near, far = 0.1, 100.0
        depth = jnp.linspace(0.01, 0.999, 32)
        vz = math3d.perspective_depth_to_view_z(depth, near, far)
        assert np.all(np.asarray(vz) < 0)
        back = math3d.view_z_to_perspective_depth(vz, near, far)
        np.testing.assert_allclose(np.asarray(back), np.asarray(depth), atol=1e-5)

    def test_view_to_screen_matches_projection(self):
        m = self._camera()
        rng = np.random.default_rng(1)
        view = jnp.asarray(
            np.concatenate(
                [rng.uniform(-1, 1, (16, 2)), rng.uniform(-50, -0.5, (16, 1))], -1
            ),
            jnp.float32,
        )
        uv = math3d.view_to_screen(view, m.projection_matrix)
        # compare against explicit ndc computation
        clip, w = math3d.transform_point_nodiv(m.projection_matrix, view)
        expect = np.asarray(clip)[:, :2] / np.asarray(w)[:, None] * 0.5 + 0.5
        np.testing.assert_allclose(np.asarray(uv), expect, atol=1e-5)

    def test_get_view_position(self):
        m = self._camera()
        h = w = 8
        uv = math3d.uv_grid(h, w)
        depth = jnp.full((h, w), 0.9)
        vz = math3d.perspective_depth_to_view_z(depth, m.near, m.far)
        vp = math3d.get_view_position(uv, vz, m.projection_matrix, m.projection_matrix_inverse)
        # reconstructed position should project back to the same uv
        uv2 = math3d.view_to_screen(vp, m.projection_matrix)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-4)


class TestSampling:
    def test_bilinear_at_texel_centers(self):
        rng = np.random.default_rng(2)
        tex = jnp.asarray(rng.uniform(size=(16, 16, 3)), jnp.float32)
        ys, xs = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        uv = jnp.asarray(
            np.stack([(xs + 0.5) / 16, (ys + 0.5) / 16], -1), jnp.float32
        )
        out = sampling.sample_bilinear(tex, uv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(tex), atol=1e-6)

    def test_bilinear_interpolates(self):
        tex = jnp.zeros((4, 4), jnp.float32).at[1, 2].set(1.0)
        # halfway between texel (2,1) and (1,1) in x
        uv = jnp.asarray([(2.0 / 4), (1.5 / 4)])
        val = sampling.sample_bilinear(tex, uv)
        np.testing.assert_allclose(float(val), 0.5, atol=1e-6)

    def test_catmull_rom_reproduces_centers(self):
        rng = np.random.default_rng(3)
        tex = jnp.asarray(rng.uniform(size=(16, 16, 4)), jnp.float32)
        ys, xs = np.meshgrid(np.arange(2, 14), np.arange(2, 14), indexing="ij")
        uv = jnp.asarray(
            np.stack([(xs + 0.5) / 16, (ys + 0.5) / 16], -1), jnp.float32
        )
        out = sampling.sample_catmull_rom_5tap(tex, uv)
        ref = np.asarray(tex)[2:14, 2:14]
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_mip_chain(self):
        tex = jnp.ones((32, 32, 3), jnp.float32)
        mips = sampling.build_mip_chain(tex)
        assert len(mips) == 6
        assert mips[-1].shape == (1, 1, 3)
        out = sampling.sample_bilinear_mip(mips, jnp.asarray([0.5, 0.5]), 2.5)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


class TestPacking:
    def test_oct_normal_roundtrip(self):
        rng = np.random.default_rng(4)
        n = rng.standard_normal((256, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        n = jnp.asarray(n, jnp.float32)
        dec = packing.decode_oct(packing.encode_oct(n))
        dots = np.sum(np.asarray(dec) * np.asarray(n), -1)
        assert dots.min() > 0.99999

    def test_pack_normal_float_roundtrip(self):
        rng = np.random.default_rng(5)
        n = rng.standard_normal((128, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        n = jnp.asarray(n, jnp.float32)
        dec = packing.unpack_normal(packing.pack_normal(n))
        dots = np.sum(np.asarray(dec) * np.asarray(n), -1)
        assert dots.min() > 0.999  # half-precision oct encoding

    def test_color2float_roundtrip(self):
        rng = np.random.default_rng(6)
        c = jnp.asarray(rng.uniform(size=(64, 3)), jnp.float32)
        back = packing.float2color(packing.color2float(c))
        assert np.abs(np.asarray(back) - np.asarray(c)).max() < 1.0 / 255.0

    def test_rgbe8_roundtrip(self):
        rng = np.random.default_rng(7)
        c = jnp.asarray(rng.uniform(0, 50, size=(64, 3)), jnp.float32)
        back = packing.decode_rgbe8(packing.encode_rgbe8(c))
        rel = np.abs(np.asarray(back) - np.asarray(c)) / (np.asarray(c) + 1e-3)
        assert rel.max() < 0.02

    def test_vec4_to_float_roundtrip(self):
        rng = np.random.default_rng(8)
        v = jnp.asarray(rng.uniform(size=(64, 4)), jnp.float32)
        back = packing.float_to_vec4(packing.vec4_to_float(v))
        assert np.abs(np.asarray(back) - np.asarray(v)).max() < 1.0 / 255.0

    def test_half2x16_roundtrip(self):
        v = jnp.asarray([[0.25, 100.0], [1e-3, 3.0]], jnp.float32)
        back = packing.unpack_half2x16(packing.pack_half2x16(v))
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), rtol=1e-3)


class TestRNG:
    def test_blue_noise_tile_uniform(self):
        tile = blue_noise_tile()
        assert tile.shape == (128, 128, 4)
        # rank-normalized: near-perfect uniform histogram
        for c in range(4):
            vals = np.sort(tile[..., c].ravel())
            expect = (np.arange(vals.size) + 0.5) / vals.size
            assert np.abs(vals - expect).max() < 1e-5

    def test_blue_noise_is_blue(self):
        """High-pass property: low-frequency energy must be suppressed."""
        tile = blue_noise_tile()[..., 0] - 0.5
        spec = np.abs(np.fft.fft2(tile)) ** 2
        freq = np.sqrt(
            np.fft.fftfreq(128)[:, None] ** 2 + np.fft.fftfreq(128)[None, :] ** 2
        )
        low = spec[(freq < 0.05) & (freq > 0)].mean()
        high = spec[freq > 0.3].mean()
        assert low < 0.2 * high

    def test_pcg4d_changes_and_is_deterministic(self):
        v = jnp.asarray([[1, 2, 3, 4], [1, 2, 3, 5]], jnp.uint32)
        out1 = np.asarray(pcg4d(v))
        out2 = np.asarray(pcg4d(v))
        np.testing.assert_array_equal(out1, out2)
        assert (out1[0] != out1[1]).any()

    def test_r2_low_discrepancy(self):
        pts = r2_sequence(1024)
        assert pts.shape == (1024, 2)
        assert pts.min() >= 0 and pts.max() < 1
        # mean should converge to 0.5 much faster than random
        assert np.abs(pts.mean(0) - 0.5).max() < 0.01

    def test_blue_noise_image_shapes_and_frames_differ(self):
        img0 = np.asarray(blue_noise_image(32, 48, 0))
        img1 = np.asarray(blue_noise_image(32, 48, 1))
        assert img0.shape == (32, 48, 4)
        assert (img0 != img1).any()
        assert img0.min() >= 0.0 and img0.max() <= 1.0


class TestMipAtlas:
    def test_matches_chain_for_non_pow2(self):
        """Atlas trilinear fetch == explicit chain blend, incl. non-pow2."""
        from realism_effects_tpu.core.sampling import (
            build_mip_atlas, build_mip_chain, sample_bilinear_mip,
            sample_mip_atlas,
        )
        rng = np.random.default_rng(11)
        for shape in [(64, 128, 3), (100, 200, 3), (48, 80, 3)]:
            tex = jnp.asarray(rng.uniform(size=shape), jnp.float32)
            atlas = build_mip_atlas(tex)
            mips = build_mip_chain(tex)
            uv = jnp.asarray(rng.uniform(0.02, 0.98, (32, 32, 2)), jnp.float32)
            for lod in (0.0, 1.5, 3.0, 4.7):
                a = np.asarray(sample_mip_atlas(atlas, uv, lod))
                b = np.asarray(sample_bilinear_mip(mips, uv, lod))
                np.testing.assert_allclose(a, b, atol=2e-5, err_msg=f"{shape} lod={lod}")
