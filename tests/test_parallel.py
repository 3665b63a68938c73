"""Multi-chip spatial sharding tests on the 8-device virtual CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realism_effects_tpu.core.framebuffers import GBuffer
from realism_effects_tpu.ops.poisson_denoise import (
    PoissonDenoiseConfig, poisson_denoise,
)
from realism_effects_tpu.parallel.halo import (
    halo_exchange_rows, poisson_denoise_sharded, sharded_stencil,
)
from realism_effects_tpu.parallel.sharding import (
    ROW_AXIS, make_mesh, row_sharding, shard_pytree,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8])


class TestHaloExchange:
    def test_matches_edge_padding(self, mesh):
        """Sharded halo-extended identity stencil == unsharded array."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(size=(64, 32, 3)), jnp.float32)

        def blur3(a):
            # vertical 3-tap box blur with edge clamp
            up = jnp.concatenate([a[:1], a[:-1]], axis=0)
            dn = jnp.concatenate([a[1:], a[-1:]], axis=0)
            return (up + a + dn) / 3.0

        ref = np.asarray(blur3(x))
        fn = sharded_stencil(blur3, mesh, halo=1)
        xs = jax.device_put(x, row_sharding(mesh))
        out = np.asarray(fn(xs))
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_halo_rows_content(self, mesh):
        """Each shard's halo must hold its neighbors' boundary rows."""
        x = jnp.arange(16.0).repeat(4).reshape(16, 4)

        def probe(b):
            ext = halo_exchange_rows(b, 1)
            # return (top_halo_row, first_own_row, bottom_halo_row)
            return jnp.stack([ext[0], b[0], ext[-1]])

        fn = jax.shard_map(
            probe, mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(ROW_AXIS),),
            out_specs=jax.sharding.PartitionSpec(ROW_AXIS),
        )
        xs = jax.device_put(x, row_sharding(mesh))
        out = np.asarray(fn(xs)).reshape(8, 3, 4)
        # shard i owns rows [2i, 2i+1]; top halo = row 2i-1 (or 2i at edge)
        for i in range(8):
            top = 2 * i - 1 if i > 0 else 0
            bot = 2 * i + 2 if i < 7 else 15
            assert out[i, 0, 0] == top
            assert out[i, 1, 0] == 2 * i
            assert out[i, 2, 0] == bot


def _rand_gbuffer(rng, h, w):
    # varied normals/depth so edge-stopping weights and fwidth paths are live
    nrm = rng.uniform(-1, 1, size=(h, w, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    return GBuffer(
        diffuse=jnp.asarray(rng.uniform(size=(h, w, 4)), jnp.float32),
        normal=jnp.asarray(nrm, jnp.float32),
        roughness=jnp.asarray(rng.uniform(size=(h, w)), jnp.float32),
        metalness=jnp.zeros((h, w), jnp.float32),
        emissive=jnp.zeros((h, w, 3), jnp.float32),
        depth=jnp.asarray(rng.uniform(0.3, 0.95, size=(h, w)), jnp.float32),
    )


class TestShardedPoisson:
    def test_matches_single_device_exactly(self, mesh):
        """Row-sharded Poisson denoise is bit-identical to single-chip:
        per-pass halo exchange + global-row blue-noise phase."""
        rng = np.random.default_rng(1)
        h, w = 64, 48
        tex = jnp.asarray(rng.uniform(size=(h, w, 4)), jnp.float32)
        gb = _rand_gbuffer(rng, h, w)
        cfg = PoissonDenoiseConfig(iterations=1, radius=3.0)
        ref = poisson_denoise([tex], gb, jnp.int32(0), cfg)[0]

        tex_s = jax.device_put(tex, row_sharding(mesh))
        gb_s = shard_pytree(gb, mesh)
        out = poisson_denoise_sharded(
            [tex_s], gb_s, jnp.int32(0), cfg, mesh
        )[0]
        # identical program modulo XLA float reassociation across the
        # shard boundary fusion choices (observed max ~9e-5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_two_iterations_match(self, mesh):
        """4 ping-pong passes: a later pass reads the previous pass's
        output in the halo, so the per-pass re-exchange is load-bearing."""
        rng = np.random.default_rng(2)
        h, w = 32, 32
        tex = jnp.asarray(rng.uniform(size=(h, w, 4)), jnp.float32)
        gb = _rand_gbuffer(rng, h, w)
        cfg = PoissonDenoiseConfig(iterations=2, radius=2.0)
        ref = poisson_denoise([tex], gb, jnp.int32(3), cfg)[0]
        out = poisson_denoise_sharded(
            [jax.device_put(tex, row_sharding(mesh))],
            shard_pytree(gb, mesh), jnp.int32(3), cfg, mesh,
        )[0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


class TestShardFrameFn:
    def test_outputs_row_sharded_and_equal(self, mesh):
        """shard_frame_fn constrains image outputs to row sharding and
        preserves values (GSPMD inserts the halo collectives)."""
        from realism_effects_tpu.parallel.sharding import shard_frame_fn

        def stencil(x, scale):
            up = jnp.concatenate([x[:1], x[:-1]], axis=0)
            dn = jnp.concatenate([x[1:], x[-1:]], axis=0)
            return {"img": (up + x + dn) * scale, "count": jnp.float32(3.0)}

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(size=(64, 32, 3)), jnp.float32)
        ref = stencil(x, jnp.float32(0.5))

        fn = shard_frame_fn(stencil, mesh)
        xs = jax.device_put(x, row_sharding(mesh))
        out = fn(xs, jnp.float32(0.5))
        np.testing.assert_allclose(
            np.asarray(out["img"]), np.asarray(ref["img"]), atol=1e-6)
        assert out["img"].sharding == row_sharding(mesh)
        # scalar leaves come out replicated, not row-sharded
        assert out["count"].sharding.is_fully_replicated


class TestShardedTemporalReproject:
    def test_gspmd_row_sharded_matches(self, mesh):
        """Temporal reprojection under GSPMD row sharding == single chip.

        Reprojection gathers history at arbitrary uv offsets, so its
        multi-chip mapping is row-sharded compute over replicated read
        textures (SURVEY §2.5) — the jit/GSPMD path, not halo exchange.
        """
        from realism_effects_tpu.core.camera import PerspectiveCamera
        from realism_effects_tpu.core.framebuffers import VelocityBuffer
        from realism_effects_tpu.ops.temporal_reproject import (
            TemporalReprojectConfig, temporal_reproject,
        )
        from realism_effects_tpu.parallel.sharding import shard_frame_fn

        rng = np.random.default_rng(4)
        h, w = 64, 48
        nrm = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (h, w, 1))
        vel = VelocityBuffer(
            velocity=jnp.asarray(
                rng.uniform(-0.01, 0.01, size=(h, w, 2)), jnp.float32),
            normal=jnp.asarray(nrm),
            depth=jnp.asarray(rng.uniform(0.4, 0.9, size=(h, w)), jnp.float32),
        )
        inputs = [jnp.asarray(rng.uniform(size=(h, w, 4)), jnp.float32)]
        history = [jnp.asarray(rng.uniform(size=(h, w, 4)), jnp.float32)]
        cam_obj = PerspectiveCamera(50, w / h, 0.1, 100)
        cam_obj.set_position(0, 1, 4)
        cam_obj.look_at((0, 0, 0))
        cam = cam_obj.matrices()
        cfg = TemporalReprojectConfig(texture_count=1)

        def step(inp, hist, v):
            return temporal_reproject(
                [inp], [hist], v, v, cam, cam, cfg, max_blend=0.9,
            )[0]

        ref = np.asarray(step(inputs[0], history[0], vel))

        fn = shard_frame_fn(step, mesh)
        out = fn(
            jax.device_put(inputs[0], row_sharding(mesh)),
            jax.device_put(history[0], row_sharding(mesh)),
            shard_pytree(vel, mesh),
        )
        assert out.sharding == row_sharding(mesh)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestShardedFullFrame:
    def test_full_frame_gspmd_matches_single_chip(self, mesh):
        """Capstone: the composer's monolithic frame function, jitted via
        shard_frame_fn over the 8-device mesh with row-sharded state,
        matches the unsharded single-device result (the executable the
        driver's multichip dryrun runs, now checked for *values*)."""
        import numpy as np
        from realism_effects_tpu import (
            EffectComposer, HBAOEffect, Material, PerspectiveCamera, Scene,
            TRAAEffect, make_box, make_plane, translation,
        )

        def build():
            scene = Scene()
            scene.add(make_plane(16, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
            box = scene.add(make_box(
                (1, 1, 1), Material(diffuse=(0.9, 0.3, 0.2, 1.0))))
            box.set_matrix(translation(0, 0.5, 0))
            cam = PerspectiveCamera(50, 1, 0.1, 100)
            cam.set_position(3, 2.5, 4)
            cam.look_at((0, 0.5, 0))
            composer = EffectComposer(scene, cam, 64, 64)
            composer.add_effect(HBAOEffect(spp=2))
            composer.add_effect(TRAAEffect())
            composer._packed = composer.scene.pack()
            composer._state = composer._init_state()
            cm = cam.matrices()
            args = (
                composer._packed,
                composer.scene.model_matrices(),
                composer.scene.prev_model_matrices(),
                cm, cm, cm,
                composer._state,
                composer.build_params(),
                jnp.int32(2),
                composer.scene.environment,
                composer.scene.lighting_params(),
            )
            return composer, args

        composer, args = build()
        ref_img, _ = composer._build_frame_fn()(*args)
        ref_img = np.asarray(ref_img)

        composer2, args2 = build()
        args2 = list(args2)
        args2[6] = shard_pytree(args2[6], mesh)  # row-shard the state
        sharded_fn = composer2._build_frame_fn(mesh=mesh)
        img, _ = sharded_fn(*args2)
        assert img.sharding == row_sharding(mesh)
        np.testing.assert_allclose(np.asarray(img), ref_img, atol=2e-4)
