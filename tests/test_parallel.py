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

    def test_multi_hop_halo(self, mesh):
        """halo > shard height forces multiple ppermute hops
        (halo_exchange_rows hops = ceil(halo / H_loc)): 16 rows over 8
        devices = 2-row shards, so halo 3 needs 2 hops and halo 5 needs
        3. Sharded == unsharded for both."""
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(size=(16, 8, 3)), jnp.float32)

        def blur(a, r):
            # vertical (2r+1)-tap box blur with edge clamp
            pad = jnp.concatenate(
                [jnp.repeat(a[:1], r, 0), a, jnp.repeat(a[-1:], r, 0)], 0)
            return sum(pad[i: i + a.shape[0]] for i in range(2 * r + 1)) \
                / (2.0 * r + 1.0)

        for halo in (3, 5):
            ref = np.asarray(blur(x, halo))
            fn = sharded_stencil(lambda a, h=halo: blur(a, h), mesh,
                                 halo=halo)
            out = np.asarray(fn(jax.device_put(x, row_sharding(mesh))))
            np.testing.assert_allclose(out, ref, atol=1e-6,
                                       err_msg=f"halo={halo}")

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


def _collective_defs(hlo_text):
    """Count *definitions* of each collective op in optimized HLO text
    (operand mentions excluded)."""
    import collections
    import re

    pat = re.compile(
        r"= \S+ (all-gather|collective-permute|all-reduce|all-to-all|"
        r"reduce-scatter)\(")
    return collections.Counter(m.group(1) for m in pat.finditer(hlo_text))


class TestCollectiveAudit:
    """HLO-level audit of sharded data movement (the PARITY.md §2.5
    per-stage table's evidence): bounded-stencil stages move only halo
    rows (collective-permute, never a full-frame all-gather), and the
    fused GSPMD frame's all-gathers are exactly the documented
    replicated-read planes of the gather-unbounded stages."""

    def test_poisson_halo_path_all_permute_no_gather(self, mesh):
        from realism_effects_tpu.parallel.halo import _poisson_sharded_fn

        rng = np.random.default_rng(11)
        h, w = 64, 48
        tex = jax.device_put(
            jnp.asarray(rng.uniform(size=(h, w, 4)), jnp.float32),
            row_sharding(mesh))
        gb = shard_pytree(_rand_gbuffer(rng, h, w), mesh)
        gb_leaves, gb_treedef = jax.tree_util.tree_flatten(gb)
        cfg = PoissonDenoiseConfig(iterations=1, radius=3.0)
        fn = _poisson_sharded_fn(1, gb_treedef, cfg, mesh, (h, w))
        txt = fn.lower(jnp.int32(0), tex, *gb_leaves).compile().as_text()
        defs = _collective_defs(txt)
        assert defs["all-gather"] == 0, defs
        assert defs["collective-permute"] > 0, defs

    def test_sharded_stencil_all_permute_no_gather(self, mesh):
        """The sharpness-class 3x3 stencil under sharded_stencil: halo
        rows ride ppermute; no all-gather appears."""
        def unsharp(c):
            pad = jnp.pad(c, ((1, 1), (1, 1), (0, 0)), mode="edge")
            acc = sum(pad[1 + dy: 1 + dy + c.shape[0],
                          1 + dx: 1 + dx + c.shape[1]]
                      for dy in (-1, 0, 1) for dx in (-1, 0, 1))
            return jnp.maximum(c + (c - acc / 9.0), 0.0)

        from jax.sharding import PartitionSpec as P
        from realism_effects_tpu.parallel.halo import (
            _crop, halo_exchange_rows,
        )

        def local(b):
            return _crop(unsharp(halo_exchange_rows(b, 1)), 1)

        fn = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P(ROW_AXIS),),
            out_specs=P(ROW_AXIS)))
        x = jax.device_put(jnp.ones((64, 32, 3), jnp.float32),
                           row_sharding(mesh))
        txt = fn.lower(x).compile().as_text()
        defs = _collective_defs(txt)
        assert defs["all-gather"] == 0, defs
        assert defs["collective-permute"] > 0, defs

    def test_fused_frame_all_gather_census(self, mesh):
        """The HBAO+TRAA fused sharded frame moves NO full-frame planes:
        since round 5 every bounded fetch (AO taps, temporal history/
        probe) rides the shard_map window-warp path (ppermute halo, see
        parallel.context), so the measured all-gather count is 0 — the
        round-3/4 budget of <= 14 covered the replicated-read planes the
        GSPMD-partitioned gather fetches used to force. A regression
        that reintroduces full-frame replication into this stack blows
        the budget."""
        import jax.numpy as jnp
        from realism_effects_tpu import (
            EffectComposer, HBAOEffect, Material, PerspectiveCamera,
            Scene, TRAAEffect, make_box, make_plane, translation,
        )

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
            shard_pytree(composer._state, mesh),
            composer.build_params(),
            jnp.int32(2),
            composer.scene.environment,
            composer.scene.lighting_params(),
        )
        fn = composer._build_frame_fn(mesh=mesh)
        txt = fn.lower(*args).compile().as_text()
        defs = _collective_defs(txt)
        assert defs["all-gather"] <= 14, defs
        # halo-style movement is present too (GSPMD compiles the bounded
        # shifts to collective-permutes)
        assert defs["collective-permute"] > 0, defs


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

    @pytest.mark.parametrize("trace", ["march", "sweep"])
    def test_flagship_ssgi_stack_multi_frame_matches(self, mesh, trace):
        """The FLAGSHIP stack (SSGI + HBAO + motion blur + TRAA — the
        `__graft_entry__._build_pipeline` composition, with the full
        temporal feedback topology: SSGI reads last frame's composed
        output, the temporal history is the Poisson B buffer,
        `SSGIPass.js:88` / `Denoiser.js:51`) run for 3 frames on the
        8-device mesh, asserting sharded == single-chip on every frame's
        image AND on the final temporal state — for BOTH trace
        discretizations (the reference gather march and the TPU-native
        roll sweep, whose rolls GSPMD must lower to exact collectives)."""
        import jax.numpy as jnp
        from realism_effects_tpu import (
            EffectComposer, HBAOEffect, Material, MotionBlurEffect,
            PerspectiveCamera, Scene, SSGIEffect, TRAAEffect,
            make_box, make_plane, make_sphere, translation,
        )

        h, w = 96, 64

        def build():
            scene = Scene()
            scene.add(make_plane(
                20, Material(diffuse=(0.6, 0.6, 0.65, 1.0))))
            box = scene.add(make_box(
                (1, 1, 1), Material(diffuse=(0.9, 0.3, 0.2, 1.0))))
            box.set_matrix(translation(0, 0.5, 0))
            sph = scene.add(make_sphere(0.6, material=Material(
                diffuse=(0.2, 0.5, 0.9, 1.0), roughness=0.2,
                metalness=0.8)))
            sph.set_matrix(translation(1.5, 0.6, 0.5))
            cam = PerspectiveCamera(50, w / h, 0.1, 100)
            cam.set_position(3, 2.5, 4)
            cam.look_at((0, 0.5, 0))
            composer = EffectComposer(scene, cam, w, h)
            composer.add_effect(SSGIEffect(steps=6, refine_steps=2,
                                           trace=trace, sweep_dirs=8,
                                           sweep_steps=12))
            composer.add_effect(HBAOEffect(spp=2))
            composer.add_effect(MotionBlurEffect(samples=4))
            composer.add_effect(TRAAEffect())
            composer._packed = composer.scene.pack()
            composer._state = composer._init_state()
            cm = cam.matrices()
            fixed = (
                composer._packed,
                composer.scene.model_matrices(),
                composer.scene.prev_model_matrices(),
                cm, cm, cm,
            )
            tail = (
                composer.build_params(),
                composer.scene.environment,
                composer.scene.lighting_params(),
            )
            return composer, fixed, tail

        ref_c, ref_fixed, ref_tail = build()
        ref_fn = ref_c._build_frame_fn()
        state = ref_c._state
        ref_imgs = []
        for f in range(3):
            img, state = ref_fn(*ref_fixed, state, ref_tail[0],
                                jnp.int32(f), ref_tail[1], ref_tail[2])
            ref_imgs.append(np.asarray(img))
        ref_state = state

        sh_c, sh_fixed, sh_tail = build()
        sh_fn = sh_c._build_frame_fn(mesh=mesh)
        state = shard_pytree(sh_c._state, mesh)
        for f in range(3):
            img, state = sh_fn(*sh_fixed, state, sh_tail[0],
                               jnp.int32(f), sh_tail[1], sh_tail[2])
            assert img.sharding == row_sharding(mesh)
            np.testing.assert_allclose(
                np.asarray(img), ref_imgs[f], atol=5e-4,
                err_msg=f"frame {f}")

        # the temporal feedback state survives sharded: every leaf of
        # the final state matches the single-chip run
        ref_leaves, treedef = jax.tree_util.tree_flatten(ref_state)
        sh_leaves, treedef2 = jax.tree_util.tree_flatten(state)
        assert treedef == treedef2
        for i, (a, b) in enumerate(zip(ref_leaves, sh_leaves)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-4,
                err_msg=f"state leaf {i}")
