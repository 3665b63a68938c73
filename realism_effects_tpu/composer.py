"""EffectComposer: the staged, jit-compiled frame graph.

TPU-native redesign of the reference's pass graph: where three.js'
``EffectComposer`` issues one WebGL draw per pass per frame
(`example/main.js:525-539, 647-649`), this composer runs the frame as a
small sequence of jitted stages — raster+shade, then one stage per
effect — over HxWxC tensors. History/accumulation textures live in an
explicit ``state`` pytree that is donated back each frame (the
functional replacement for render-target ping-pong and
``copyFramebufferToTexture``, `TemporalReprojectPass.js:197-200`).

Performance-critical host<->device rules (measured on the axon TPU
runtime: each fresh host->device transfer costs ~35 ms, the first
device->host readback ~minutes):

- ALL per-frame host data (camera matrices, model matrices, effect
  uniforms, frame counters) is packed into ONE flat float32 "uniform
  buffer" and uploaded with a single transfer per frame — the TPU analog
  of a GPU uniform buffer object. Stages slice it inside jit.
- The frame loop never reads device data back to host; camera-move
  detection runs on the host-side numpy matrices.
- Scene geometry, env maps and lighting are uploaded once and passed as
  persistent device arguments (never closed over, never re-created).

Host responsibilities per frame (non-traced): camera jitter bookkeeping
(`TAAUtils.js:5-11`), previous-matrix snapshots
(`TemporalReprojectPass.js:202-213`), camera-moved detection
(`SceneUtils.js:17-43`), and the one-frame ``keepData=0`` reset
(`TemporalReprojectPass.js:158-160`).
"""

from __future__ import annotations

import os
import tempfile
import time

import chex
import jax
import jax.numpy as jnp
import numpy as np

from .core.camera import Camera, CameraMatrices
from .core.framebuffers import VelocityBuffer
from .scene.rasterizer import rasterize_gbuffer, rasterize_velocity
from .scene.scene import Scene
from .scene.shading import shade_direct


@chex.dataclass(frozen=True)
class FrameContext:
    """Everything an effect stage may read (traced device values)."""

    gbuffer: object
    velocity: object
    last_velocity: object
    scene_color: jnp.ndarray          # direct-lit input (H, W, 3)
    cam: CameraMatrices               # jittered (matches G-buffer raster)
    unjittered_cam: CameraMatrices
    prev_cam: CameraMatrices          # previous frame, unjittered
    frame_index: jnp.ndarray          # traced int32 scalar
    params: dict                      # per-effect uniform dicts
    env: object                       # EquirectEnv | None
    #: restricted G-buffer (excluded faces absent) for exact SSGI
    #: Selection semantics (`SSGIPass.js:71-79`); None unless an effect
    #: requests ``selection="rerender"`` and the scene excludes meshes
    gi_gbuffer: object = None


class UniformLayout:
    """Flat float32 per-frame constant buffer: host packs, device slices."""

    def __init__(self):
        self.slots: dict[str, tuple[int, int, tuple]] = {}
        self.size = 0

    def add(self, name: str, shape: tuple = ()):  # noqa: D401
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        self.slots[name] = (self.size, n, shape)
        self.size += n
        return self

    def pack(self, values: dict) -> np.ndarray:
        # hot path: runs every frame on the host. Slot extents are
        # precomputed at add(); scalars assign directly and arrays
        # convert dtype on assignment (no intermediate asarray copies)
        buf = np.empty(self.size, np.float32)
        for name, (off, n, _shape) in self.slots.items():
            if n == 1:
                v = values[name]
                # .item() coerces 0-d/1-element arrays to a python
                # scalar: assigning those directly is a NumPy
                # DeprecationWarning (future hard error)
                buf[off] = v.item() if hasattr(v, "item") else v
            else:
                buf[off: off + n] = np.ravel(values[name])
        return buf

    def get(self, buf: jnp.ndarray, name: str) -> jnp.ndarray:
        off, n, shape = self.slots[name]
        v = jax.lax.dynamic_slice_in_dim(buf, off, n)
        return v.reshape(shape) if shape else v[0]


_CAM_FIELDS = ("projection_matrix", "projection_matrix_inverse",
               "view_matrix", "camera_matrix_world")


def _add_camera_slots(layout: UniformLayout, prefix: str):
    for f in _CAM_FIELDS:
        layout.add(f"{prefix}.{f}", (4, 4))
    layout.add(f"{prefix}.position", (3,))
    layout.add(f"{prefix}.near")
    layout.add(f"{prefix}.far")


def _rigid_inverse(m: np.ndarray) -> np.ndarray:
    """Inverse of a rigid transform (R | t): (R^T | -R^T t). Camera
    world matrices are rigid, so this replaces np.linalg.inv in the
    per-frame hot path."""
    out = np.eye(4)
    rt = m[:3, :3].T
    out[:3, :3] = rt
    out[:3, 3] = -rt @ m[:3, 3]
    return out


def _pack_camera(values: dict, prefix: str, camera: Camera,
                 matrix_world: np.ndarray, projection: np.ndarray):
    proj = np.asarray(projection, np.float64)
    world = np.asarray(matrix_world, np.float64)
    values[f"{prefix}.projection_matrix"] = proj
    values[f"{prefix}.projection_matrix_inverse"] = np.linalg.inv(proj)
    values[f"{prefix}.view_matrix"] = _rigid_inverse(world)
    values[f"{prefix}.camera_matrix_world"] = world
    values[f"{prefix}.position"] = world[:3, 3]
    values[f"{prefix}.near"] = camera.near
    values[f"{prefix}.far"] = camera.far


def _unpack_camera(layout: UniformLayout, buf: jnp.ndarray, prefix: str
                   ) -> CameraMatrices:
    g = lambda f: layout.get(buf, f"{prefix}.{f}")
    return CameraMatrices(
        projection_matrix=g("projection_matrix"),
        projection_matrix_inverse=g("projection_matrix_inverse"),
        view_matrix=g("view_matrix"),
        camera_matrix_world=g("camera_matrix_world"),
        position=g("position"),
        near=g("near"),
        far=g("far"),
    )


_COMPILE_CACHE_READY = False


def _machine_tag() -> str:
    """Fingerprint of the host CPU's feature set.

    XLA:CPU persists AOT-compiled executables specialized to the compile
    host's CPU features; loading them on a host with different features
    is not caught by the cache key and SIGABRTs/SIGILLs deep in native
    code (observed: a cache written on an avx512 `prefer-no-gather`
    machine aborting every sharded program on the next session's host).
    Namespacing the default cache dir by this tag makes a machine change
    a cache miss instead of a crash."""
    try:
        import hashlib

        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine()


def _enable_compile_cache():
    """Persistent XLA compilation cache: big scenes (e.g. the 262k-triangle
    Sponza) compile their raster scan in minutes the first time; caching
    makes every later process start in seconds. Opt out with
    RE_TPU_NO_COMPILE_CACHE=1."""
    global _COMPILE_CACHE_READY
    if _COMPILE_CACHE_READY or os.environ.get("RE_TPU_NO_COMPILE_CACHE"):
        _COMPILE_CACHE_READY = True
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(tempfile.gettempdir(),
                         f"re_tpu_xla_cache_{_machine_tag()}"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    _COMPILE_CACHE_READY = True


class EffectComposer:
    """Drives the frame loop; owns effects, state, and host bookkeeping."""

    def __init__(self, scene: Scene, camera: Camera, width: int, height: int,
                 alpha_peels: int = 3, msaa: int = 1):
        _enable_compile_cache()
        self.scene = scene
        self.camera = camera
        self.width = int(width)
        self.height = int(height)
        #: geometric-edge anti-aliasing by supersampled raster: ``msaa=s``
        #: rasterizes and shades at s*s the display resolution and
        #: box-resolves the color (the TPU analog of the reference demo's
        #: WebGL ``multisampling: 4`` composer branch,
        #: `example/main.js:116-154` — there is no hardware multisample
        #: resolve on TPU, so this is true SSAA: strictly higher quality,
        #: s^2 raster+shade cost). The G-buffer/velocity planes the
        #: effects consume resolve by center-sample pick (depth/normals/
        #: ids don't average). Static: changing it retraces.
        self.msaa = max(1, int(msaa))
        #: depth-peel passes bounding alpha-*map* transparency depth
        #: (scene/rasterizer._visibility); raise for scenes with > 3
        #: overlapping dithered-out texels per pixel (each extra peel is
        #: one more raster pass). Static: changing it retraces.
        self.alpha_peels = int(alpha_peels)
        self.effects = []
        self.frame = 0
        self.camera_not_moved_frames = 0
        self._state = None
        self._raster_stage = None
        self._effect_stages = []
        self._layout = None
        self._static_sig = None
        self._packed = None
        self._lighting = None           # cached device lighting params
        self._env_cache_key = None      # id() of the raw map last built
        self._env_built = None          # EquirectEnv built from it
        self._env_raw = None            # the raw map itself (pins its id)
        self._prev_world = None         # numpy snapshots (host-side)
        self._prev_proj = None
        self._last_world = None
        self._reset_pending = True
        # measured per-frame dt (`MotionBlurEffect.js:87-89`): wall clock
        # between renders, clamped to >= 1 ms, overridable via render(dt=)
        self.delta_time = 1.0 / 60.0
        self._last_frame_walltime = None
        #: set True to populate :attr:`last_timings` (per-stage ms) each
        #: frame; adds one device sync per stage, so leave off in production
        self.collect_timings = False
        self.last_timings: dict[str, float] = {}
        #: run the whole effect chain as ONE jitted program (single host
        #: dispatch) instead of one per effect. Same math, fewer
        #: dispatches (~1 ms of host overhead saved per stage; the frame
        #: itself is device-bound — see BENCH_breakdown artifacts). Set
        #: False to fall back to per-effect stages (collect_timings does
        #: so automatically, it needs the stage boundaries)
        self.fuse_effects = True
        #: additionally fuse the raster+shade stage into that same
        #: program: ONE dispatch per frame total. Same math; saves one
        #: dispatch of host overhead at the cost of a bigger XLA program
        #: (longer first compile). Measured on the TPU bench before
        #: being made the default — see README perf notes.
        self.fuse_raster = True
        #: resolve visibility ONCE per frame: the velocity pass reuses
        #: the G-buffer scan's winner-triangle ids instead of running its
        #: own z-scan (the scan is ~32 of the 35 ms raster cost at
        #: 1080p). OFF by default: under TRAA/TAA the G-buffer scan is
        #: camera-jittered, and jitter leaking into the velocity/depth
        #: planes makes edge pixels fail temporal disocclusion every
        #: frame — accumulation (and therefore the AA itself) never
        #: happens at exactly the pixels AA exists for (measured:
        #: test_traa blended-edge count drops to 0). The reference's
        #: unjittered VelocityDepthNormalPass exists for this reason.
        #: Safe+fast for jitter-free pipelines — though there the two
        #: scans' matrices are identical and XLA already CSEs the second
        #: scan away in the fused program, so the win is small. Static:
        #: changing it retraces.
        self.share_visibility = False

    # ------------------------------------------------------------------
    def add_effect(self, effect) -> "EffectComposer":
        if any(e.name == effect.name for e in self.effects):
            raise ValueError(
                f"effect name {effect.name!r} already in the composer; "
                "give the instance a unique .name (names key uniforms "
                "and state)"
            )
        self.effects.append(effect)
        self._raster_stage = None
        self._state = None
        return self

    def reset(self):
        """Discard temporal history next frame (keepData=0 for one frame,
        like `TemporalReprojectPass.js:158-160`)."""
        self._reset_pending = True

    def refresh_lighting(self):
        """Re-stage the scene's lighting (sun/ambient/point lights) on
        device next frame. Lighting is cached at first render — one
        host->device transfer costs ~35 ms on this hardware, so it is
        deliberately NOT re-read per frame; call this after mutating
        ``scene.sun_*`` / ``scene.ambient`` / ``scene.point_lights``.
        Changing the *set* of params (enabling ``sun_specular``, first
        point light) retraces; changing values does not."""
        self._lighting = None

    def refresh_environment(self):
        """Force the environment bundle to rebuild next frame.

        The composer's ``keepEnvMapUpdated`` analog
        (`SSGIEffect.js:309-366`): assigning a NEW raw map to
        ``scene.environment`` is auto-detected by identity (like the
        reference's texture-uuid comparison, `SSGIEffect.js:317-329`);
        call this only after mutating the same array in place."""
        self._env_cache_key = None

    def _resolve_environment(self):
        """The reference's per-frame env upkeep (`SSGIEffect.js:309-366`):
        ``scene.environment`` may be a prebuilt :class:`EquirectEnv`, a
        raw (H, W, 3) equirect HDR array, or (6, S, S, 3) cube faces.
        Raw maps are converted (cube -> equirect like
        `CubeToEquirectEnvPass.js:59-99`) and their CDF/mip bundle built
        once, cached by map identity; a new assignment rebuilds and
        resets temporal history (`SSGIEffect.js:348-351`)."""
        env = self.scene.environment
        if env is None:
            # drop the cache: a future map allocated at the recycled id()
            # of the old (now collectable) array must not hit it
            self._env_cache_key = None
            self._env_built = None
            self._env_raw = None
            return None
        from .core.envmap import EquirectEnv, build_equirect_env

        if isinstance(env, EquirectEnv):
            return env
        key = id(env)
        if self._env_cache_key != key or self._env_built is None:
            arr = np.asarray(env, np.float32)
            if arr.ndim == 4 and arr.shape[0] == 6:
                from .core.envmap import cube_to_equirect

                s = arr.shape[1]
                arr = np.asarray(cube_to_equirect(
                    jnp.asarray(arr), 2 * s, 4 * s))
            self._env_built = build_equirect_env(arr)
            self._env_cache_key = key
            # keep the raw map alive while the cache is valid so its id
            # cannot be recycled by a different same-shape array
            self._env_raw = env
            self.reset()
        return self._env_built

    def set_size(self, width: int, height: int):
        """Resize the frame (``EffectComposer.setSize`` /
        ``Pass.setSize`` analog): rebuilds the jitted stages for the new
        static shapes and discards temporal state (the reference
        reallocates every render target, losing history the same way)."""
        if (width, height) == (self.width, self.height):
            return
        self.width = width
        self.height = height
        self._raster_stage = None
        self._state = None
        self._reset_pending = True

    # ------------------------------------------------------------------
    def _init_state(self):
        state = {
            "__global__": {
                "last_velocity": VelocityBuffer.zeros(self.height, self.width),
            }
        }
        for e in self.effects:
            state[e.name] = e.init_state(self.height, self.width)
        return state

    def _build_layout(self) -> UniformLayout:
        layout = UniformLayout()
        for prefix in ("cam", "unjit_cam", "prev_cam"):
            _add_camera_slots(layout, prefix)
        n_mesh = max(len(self.scene.meshes), 1)
        layout.add("model_matrices", (n_mesh, 4, 4))
        layout.add("prev_model_matrices", (n_mesh, 4, 4))
        if self.scene.num_bones() > 1:
            nb = self.scene.num_bones()
            layout.add("bone_matrices", (nb, 4, 4))
            layout.add("prev_bone_matrices", (nb, 4, 4))
        t_max = self.scene.max_morph_targets()
        if t_max > 0:
            layout.add("morph_weights", (n_mesh, t_max))
            layout.add("prev_morph_weights", (n_mesh, t_max))
        layout.add("gi_mask", (n_mesh,))
        layout.add("keep_data")
        layout.add("camera_moved")
        layout.add("camera_not_moved_frames")
        layout.add("frame_index")
        for e in self.effects:
            for key in e.uniforms():
                layout.add(f"{e.name}.{key}")
        return layout

    def _params_from_buf(self, buf: jnp.ndarray) -> dict:
        layout = self._layout
        params = {
            "__global__": {
                "keep_data": layout.get(buf, "keep_data"),
                "camera_moved": layout.get(buf, "camera_moved") > 0.5,
                "camera_not_moved_frames": layout.get(buf, "camera_not_moved_frames"),
                "gi_mask_meshes": layout.get(buf, "gi_mask"),
            }
        }
        for e in self.effects:
            params[e.name] = {
                key: layout.get(buf, f"{e.name}.{key}") for key in e.uniforms()
            }
        return params

    def _build_stages(self):
        """Stage-level jits: one raster+shade stage, one per effect.

        Per-frame host data arrives pre-packed in the uniform buffer; each
        stage unpacks what it needs on device.
        """
        h, w = self.height, self.width
        ss = self.msaa
        hr, wr = h * ss, w * ss  # raster resolution (msaa supersampling)
        layout = self._layout

        has_bones = self.scene.num_bones() > 1
        has_morphs = self.scene.max_morph_targets() > 0
        has_alpha = any(
            m.material.diffuse[3] < 1.0 or m.material.alpha_map is not None
            for m in self.scene.meshes
        )
        # exact Selection: a second, restricted raster pass is built only
        # when requested AND something is excluded (the membership itself
        # stays a uniform — toggling WHICH meshes are excluded does not
        # retrace)
        gi_rerender = (
            any(getattr(e, "selection", "mask") == "rerender"
                for e in self.effects)
            and any(m.gi_exclude for m in self.scene.meshes)
        )

        def raster_stage(packed, ubuf, env, lighting):
            cam = _unpack_camera(layout, ubuf, "cam")
            unjit_cam = _unpack_camera(layout, ubuf, "unjit_cam")
            prev_cam = _unpack_camera(layout, ubuf, "prev_cam")
            model_mats = layout.get(ubuf, "model_matrices")
            prev_model_mats = layout.get(ubuf, "prev_model_matrices")
            bones = layout.get(ubuf, "bone_matrices") if has_bones else None
            prev_bones = (
                layout.get(ubuf, "prev_bone_matrices") if has_bones else None
            )
            morph_w = (
                layout.get(ubuf, "morph_weights") if has_morphs else None
            )
            prev_morph_w = (
                layout.get(ubuf, "prev_morph_weights") if has_morphs else None
            )
            cnmf = layout.get(ubuf, "camera_not_moved_frames")
            if has_alpha:
                # dither animated by the still-frame counter so TRAA/TAA
                # converge transparency (`GBufferPass.js:59,78-82`)
                from .core.rng import blue_noise_image
                seed = (
                    cnmf + layout.get(ubuf, "frame_index")
                ).astype(jnp.int32)
                dither = blue_noise_image(hr, wr, seed)[..., 0]
            else:
                dither = None
            share = self.share_visibility
            gbuffer = rasterize_gbuffer(
                packed, model_mats, cam.projection_view_matrix, hr, wr,
                bones=bones, dither=dither, cnmf=cnmf,
                morph_weights=morph_w, alpha_peels=self.alpha_peels,
                return_ids=share,
            )
            gb_ids = None
            if share:
                gbuffer, gb_ids = gbuffer
            velocity = rasterize_velocity(
                packed, model_mats, prev_model_mats,
                unjit_cam.projection_view_matrix,
                prev_cam.projection_view_matrix, hr, wr,
                bones=bones, prev_bones=prev_bones, dither=dither,
                cnmf=cnmf, morph_weights=morph_w,
                prev_morph_weights=prev_morph_w,
                alpha_peels=self.alpha_peels,
                share_ids=gb_ids,
            )
            color = shade_direct(gbuffer, cam, lighting, env)
            gi_gbuffer = None
            if gi_rerender:
                fm = packed.vert_mesh_id[packed.faces[:, 0]]
                face_keep = layout.get(ubuf, "gi_mask")[fm] > 0.5
                gi_gbuffer = rasterize_gbuffer(
                    packed, model_mats, cam.projection_view_matrix, hr, wr,
                    bones=bones, dither=dither, cnmf=cnmf,
                    morph_weights=morph_w, alpha_peels=self.alpha_peels,
                    face_keep=face_keep,
                )
            if ss > 1:
                # MSAA resolve: box-average shaded color over each s*s
                # sample block; pick the center sample for the planes the
                # effects consume (depth/normals/ids are non-averageable)
                color = color.reshape(h, ss, w, ss, 3).mean(axis=(1, 3))
                pick = lambda a: a[ss // 2::ss, ss // 2::ss]
                gbuffer = jax.tree_util.tree_map(pick, gbuffer)
                velocity = jax.tree_util.tree_map(pick, velocity)
                if gi_gbuffer is not None:
                    gi_gbuffer = jax.tree_util.tree_map(pick, gi_gbuffer)
            return gbuffer, velocity, color, gi_gbuffer

        self._raster_stage = jax.jit(raster_stage)

        def make_stage(e):
            def stage(ubuf, gbuffer, velocity, last_velocity, scene_color,
                      color, state, env, gi_gbuffer=None):
                ctx = FrameContext(
                    gbuffer=gbuffer,
                    velocity=velocity,
                    last_velocity=last_velocity,
                    scene_color=scene_color,
                    cam=_unpack_camera(layout, ubuf, "cam"),
                    unjittered_cam=_unpack_camera(layout, ubuf, "unjit_cam"),
                    prev_cam=_unpack_camera(layout, ubuf, "prev_cam"),
                    frame_index=layout.get(ubuf, "frame_index").astype(jnp.int32),
                    params=self._params_from_buf(ubuf),
                    env=env,
                    gi_gbuffer=gi_gbuffer,
                )
                return e.apply(ctx, color, state)
            return jax.jit(stage, donate_argnums=(6,))

        self._effect_stages = [make_stage(e) for e in self.effects]

        effects = tuple(self.effects)

        def fused_stage(ubuf, gbuffer, velocity, last_velocity,
                        scene_color, state, env, gi_gbuffer=None):
            # whole effect chain in ONE program: same math as the staged
            # path, but a single host dispatch per frame (fewer dispatch
            # round-trips, and XLA additionally fuses pointwise stages
            # across effect boundaries)
            ctx = FrameContext(
                gbuffer=gbuffer,
                velocity=velocity,
                last_velocity=last_velocity,
                scene_color=scene_color,
                cam=_unpack_camera(layout, ubuf, "cam"),
                unjittered_cam=_unpack_camera(layout, ubuf, "unjit_cam"),
                prev_cam=_unpack_camera(layout, ubuf, "prev_cam"),
                frame_index=layout.get(ubuf, "frame_index").astype(jnp.int32),
                params=self._params_from_buf(ubuf),
                env=env,
                gi_gbuffer=gi_gbuffer,
            )
            image = scene_color
            new_state = {}
            for e in effects:
                image, new_state[e.name] = e.apply(ctx, image, state[e.name])
            return image, new_state

        self._fused_stage = jax.jit(fused_stage, donate_argnums=(5,))

        def full_stage(packed, ubuf, env, lighting, state):
            # raster + shade + whole effect chain as ONE program: a
            # single host dispatch per frame (fuse_raster mode)
            gbuffer, velocity, color, gi_gbuffer = raster_stage(
                packed, ubuf, env, lighting)
            last_velocity = state["__global__"]["last_velocity"]
            image, eff_state = fused_stage(
                ubuf, gbuffer, velocity, last_velocity, color,
                {e.name: state[e.name] for e in effects}, env,
                gi_gbuffer,
            )
            new_state = {"__global__": {"last_velocity": velocity}}
            new_state.update(eff_state)
            return image, new_state

        self._full_stage = jax.jit(full_stage, donate_argnums=(4,))

    # ------------------------------------------------------------------
    def render(self, dt: float | None = None):
        """Render one frame; returns the (H, W, 3) image (device array).

        ``dt``: seconds since the previous frame, used by frame-rate-
        dependent effects (motion blur). Defaults to the measured wall
        clock between ``render`` calls, clamped to >= 1 ms — the
        reference's ``max(1/1000, deltaTime)``
        (`MotionBlurEffect.js:87-89`).
        """
        return self._render_frame(external=None, dt=dt)

    def render_external(self, gbuffer, velocity, scene_color,
                        dt: float | None = None):
        """Run the effect chain on externally produced buffers.

        The ingestion boundary from SURVEY.md §7: instead of the built-in
        rasterizer, the caller supplies a :class:`GBuffer`, a
        :class:`VelocityBuffer` and a lit scene color (e.g. fixtures, an
        external renderer, or a replayed capture). Camera bookkeeping,
        uniforms and temporal state behave exactly as in :meth:`render`
        (both run through the same internal frame driver).
        """
        return self._render_frame(
            external=(gbuffer, velocity, scene_color), dt=dt
        )

    def _render_frame(self, external, dt):
        """Single frame driver shared by :meth:`render` (built-in raster)
        and :meth:`render_external` (ingested buffers)."""
        if self._packed is None:
            self._packed = self.scene.pack()
        if self._lighting is None:
            self._lighting = self.scene.lighting_params()

        static_sig = (
            self.alpha_peels,
            self.share_visibility,
            # whether a restricted-re-render raster pass exists at all
            # (WHICH meshes are excluded stays a per-frame uniform)
            any(m.gi_exclude for m in self.scene.meshes),
        ) + tuple((e.name, e.static_key()) for e in self.effects)
        if self._raster_stage is None or static_sig != self._static_sig:
            self._layout = self._build_layout()
            self._build_stages()
            self._static_sig = static_sig
            if self._state is None:
                self._state = self._init_state()

        # --- measured frame dt (host clock) ------------------------------
        now = time.perf_counter()
        if dt is None:
            dt = (
                now - self._last_frame_walltime
                if self._last_frame_walltime is not None else 1.0 / 60.0
            )
        self._last_frame_walltime = now
        self.delta_time = max(1.0 / 1000.0, float(dt))

        # --- host-side camera bookkeeping (numpy only, no device I/O) ---
        self.camera.clear_view_offset()
        unjit_world = np.asarray(self.camera.matrix_world, np.float64).copy()
        unjit_proj = np.asarray(self.camera.projection_matrix, np.float64).copy()
        moved = (
            self._last_world is None
            or np.abs(self._last_world - unjit_world).max() > 1e-6
        )
        self.camera_not_moved_frames = 0 if moved else self.camera_not_moved_frames + 1

        jit_proj = unjit_proj
        if external is None and any(e.needs_jitter for e in self.effects):
            self.camera.jitter(self.width, self.height, self.frame)
            jit_proj = np.asarray(self.camera.projection_matrix, np.float64).copy()

        prev_world = self._prev_world if self._prev_world is not None else unjit_world
        prev_proj = self._prev_proj if self._prev_proj is not None else unjit_proj

        for e in self.effects:
            e.host_update(self)

        # --- pack the per-frame uniform buffer: ONE host->device upload -
        values = {}
        _pack_camera(values, "cam", self.camera, unjit_world, jit_proj)
        _pack_camera(values, "unjit_cam", self.camera, unjit_world, unjit_proj)
        _pack_camera(values, "prev_cam", self.camera, prev_world, prev_proj)
        n_mesh = max(len(self.scene.meshes), 1)
        if external is None and self.scene.meshes:
            mm = np.stack([m.matrix_world for m in self.scene.meshes])
            pmm = np.stack([
                m.prev_matrix_world if m.prev_matrix_world is not None
                else m.matrix_world
                for m in self.scene.meshes
            ])
        else:
            # ingested buffers carry their own transforms; empty scenes
            # rasterize nothing
            mm = pmm = np.eye(4)[None].repeat(n_mesh, 0)
        values["model_matrices"] = mm
        values["prev_model_matrices"] = pmm
        if self.scene.num_bones() > 1:
            values["bone_matrices"] = self.scene.bone_matrices()
            values["prev_bone_matrices"] = self.scene.bone_matrices(prev=True)
        if self.scene.max_morph_targets() > 0:
            values["morph_weights"] = self.scene.morph_weight_matrix()
            values["prev_morph_weights"] = self.scene.morph_weight_matrix(
                prev=True)
        values["gi_mask"] = self.scene.gi_mask()
        values["keep_data"] = 0.0 if self._reset_pending else 1.0
        values["camera_moved"] = 1.0 if moved else 0.0
        values["camera_not_moved_frames"] = float(self.camera_not_moved_frames)
        values["frame_index"] = float(self.frame % 4096)
        for e in self.effects:
            for key, v in e.uniforms().items():
                values[f"{e.name}.{key}"] = float(v)
        ubuf = jnp.asarray(self._layout.pack(values))

        # --- device stages ----------------------------------------------
        timing = self.collect_timings
        if timing:
            self.last_timings = {}
            ubuf.block_until_ready()
            t_last = time.perf_counter()
        env = self._resolve_environment()
        if (external is None and self.fuse_raster and self.fuse_effects
                and not timing and self.effects):
            # single-dispatch frame: raster + effects in one program
            image, self._state = self._full_stage(
                self._packed, ubuf, env, self._lighting, self._state)
            self._prev_world = unjit_world
            self._prev_proj = unjit_proj
            self._last_world = unjit_world
            self.scene.commit_frame()
            self.frame += 1
            self._reset_pending = False
            return image
        if external is None:
            gbuffer, velocity, color, gi_gbuffer = self._raster_stage(
                self._packed, ubuf, env, self._lighting
            )
            if timing:
                jax.block_until_ready(color)
                t_now = time.perf_counter()
                self.last_timings["raster_shade"] = (t_now - t_last) * 1e3
                t_last = t_now
        else:
            gbuffer, velocity, color = external
            gi_gbuffer = None
        last_velocity = self._state["__global__"]["last_velocity"]
        new_state = {"__global__": {"last_velocity": velocity}}
        if self.fuse_effects and not timing and self.effects:
            image, fused_state = self._fused_stage(
                ubuf, gbuffer, velocity, last_velocity, color,
                {e.name: self._state[e.name] for e in self.effects}, env,
                gi_gbuffer,
            )
            new_state.update(fused_state)
        else:
            image = color
            for e, stage in zip(self.effects, self._effect_stages):
                image, new_state[e.name] = stage(
                    ubuf, gbuffer, velocity, last_velocity, color,
                    image, self._state[e.name], env, gi_gbuffer,
                )
                if timing:
                    jax.block_until_ready(image)
                    t_now = time.perf_counter()
                    self.last_timings[e.name] = (t_now - t_last) * 1e3
                    t_last = t_now
        self._state = new_state

        # --- end-of-frame snapshots ------------------------------------
        self._prev_world = unjit_world
        self._prev_proj = unjit_proj
        self._last_world = unjit_world
        if external is None:
            self.scene.commit_frame()
        self.frame += 1
        self._reset_pending = False
        return image

    # ------------------------------------------------------------------
    def build_params(self, moved: bool = False) -> dict:
        """Assemble a traced uniform pytree (used by the monolithic
        compile-check path in __graft_entry__)."""
        params = {
            "__global__": {
                "keep_data": jnp.float32(0.0 if self._reset_pending else 1.0),
                "camera_moved": jnp.asarray(moved),
                "camera_not_moved_frames": jnp.float32(self.camera_not_moved_frames),
                "gi_mask_meshes": jnp.asarray(self.scene.gi_mask()),
            }
        }
        if self.scene.max_morph_targets() > 0:
            params["__global__"]["morph_weights"] = jnp.asarray(
                self.scene.morph_weight_matrix())
            params["__global__"]["prev_morph_weights"] = jnp.asarray(
                self.scene.morph_weight_matrix(prev=True))
        for e in self.effects:
            params[e.name] = {k: jnp.asarray(v) for k, v in e.uniforms().items()}
        return params

    def _build_frame_fn(self, mesh=None):
        """Monolithic single-jit frame for the driver's compile check and
        the multi-chip dry run (`render()` uses the staged path).

        With ``mesh``, the frame is jitted via
        :func:`parallel.sharding.shard_frame_fn` so image outputs are
        row-sharded over the device mesh.
        """
        effects = tuple(self.effects)
        h, w = self.height, self.width
        gi_rerender = (
            any(getattr(e, "selection", "mask") == "rerender"
                for e in effects)
            and any(m.gi_exclude for m in self.scene.meshes)
        )

        def frame_fn(packed, model_mats, prev_model_mats, cam, unjit_cam,
                     prev_cam, state, params, frame_index, env, lighting):
            g = params["__global__"]
            gbuffer = rasterize_gbuffer(
                packed, model_mats, cam.projection_view_matrix, h, w,
                morph_weights=g.get("morph_weights"),
            )
            gi_gbuffer = None
            if gi_rerender:
                fm = packed.vert_mesh_id[packed.faces[:, 0]]
                face_keep = g["gi_mask_meshes"][fm] > 0.5
                gi_gbuffer = rasterize_gbuffer(
                    packed, model_mats, cam.projection_view_matrix, h, w,
                    morph_weights=g.get("morph_weights"),
                    face_keep=face_keep,
                )
            velocity = rasterize_velocity(
                packed, model_mats, prev_model_mats,
                unjit_cam.projection_view_matrix,
                prev_cam.projection_view_matrix, h, w,
                morph_weights=g.get("morph_weights"),
                prev_morph_weights=g.get("prev_morph_weights"),
            )
            color = shade_direct(gbuffer, cam, lighting, env)
            ctx = FrameContext(
                gbuffer=gbuffer,
                velocity=velocity,
                last_velocity=state["__global__"]["last_velocity"],
                scene_color=color,
                cam=cam,
                unjittered_cam=unjit_cam,
                prev_cam=prev_cam,
                frame_index=frame_index,
                params=params,
                env=env,
                gi_gbuffer=gi_gbuffer,
            )
            new_state = {"__global__": {"last_velocity": velocity}}
            for e in effects:
                color, st = e.apply(ctx, color, state[e.name])
                new_state[e.name] = st
            return color, new_state

        if mesh is not None:
            from .parallel.sharding import shard_frame_fn
            return shard_frame_fn(frame_fn, mesh, donate_argnums=(6,))
        return jax.jit(frame_fn, donate_argnums=(6,))

    # ------------------------------------------------------------------
    def state(self, effect_name: str):
        """Inspect an effect's state pytree (observability hook)."""
        return self._state[effect_name] if self._state else None

    # --- checkpoint / resume -------------------------------------------
    # The reference's only persistent state is GPU-resident history
    # textures (SURVEY.md §5 "checkpoint/resume: absent"). Here the whole
    # temporal state is an explicit pytree, so serialization is free.
    def save_state(self, path: str):
        """Serialize the full temporal state + frame counters to ``path``
        (.npz). Resume with :meth:`load_state` on a composer with the
        same effect stack and resolution."""
        if self._state is None:
            raise RuntimeError("no state yet: render at least one frame")
        leaves, treedef = jax.tree_util.tree_flatten(self._state)
        arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        arrays["__frame__"] = np.asarray(self.frame)
        arrays["__cnmf__"] = np.asarray(self.camera_not_moved_frames)
        arrays["__prev_world__"] = np.asarray(
            self._prev_world if self._prev_world is not None else np.eye(4))
        arrays["__prev_proj__"] = np.asarray(
            self._prev_proj if self._prev_proj is not None else np.eye(4))
        np.savez(path, **arrays)

    def load_state(self, path: str):
        """Restore temporal state saved by :meth:`save_state`."""
        if self._state is None:
            # materialize the structure to unflatten into
            self._packed = self._packed or self.scene.pack()
            self._layout = self._build_layout()
            self._build_stages()
            self._static_sig = tuple(
                (e.name, e.static_key()) for e in self.effects)
            self._state = self._init_state()
        data = np.load(path)
        leaves, treedef = jax.tree_util.tree_flatten(self._state)
        restored = [
            jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
        ]
        self._state = jax.tree_util.tree_unflatten(treedef, restored)
        self.frame = int(data["__frame__"])
        self.camera_not_moved_frames = int(data["__cnmf__"])
        self._prev_world = np.asarray(data["__prev_world__"], np.float64)
        self._prev_proj = np.asarray(data["__prev_proj__"], np.float64)
        self._last_world = self._prev_world
        self._reset_pending = False

    # --- profiling ------------------------------------------------------
    def profile(self, trace_dir: str, frames: int = 3):
        """Capture a jax.profiler trace of ``frames`` rendered frames
        (the stats-gl / `jax.profiler` observability analog, SURVEY §5)."""
        jax.profiler.start_trace(trace_dir)
        try:
            for _ in range(frames):
                self.render().block_until_ready()
        finally:
            jax.profiler.stop_trace()
