"""EffectComposer: the jit-compiled frame graph.

TPU-native redesign of the reference's pass graph: where three.js'
``EffectComposer`` issues one WebGL draw per pass per frame
(`example/main.js:525-539, 647-649`), this composer traces the whole
frame — G-buffer raster, velocity raster, direct lighting, every effect —
into ONE jitted function over HxWxC tensors. History/accumulation
textures live in an explicit ``state`` pytree that is donated back each
frame (the functional replacement for render-target ping-pong and
``copyFramebufferToTexture``, `TemporalReprojectPass.js:197-200`).

Host responsibilities per frame (non-traced): camera jitter bookkeeping
(`TAAUtils.js:5-11`), previous-matrix snapshots
(`TemporalReprojectPass.js:202-213`), camera-moved detection
(`SceneUtils.js:17-43`), and the one-frame ``keepData=0`` reset
(`TemporalReprojectPass.js:158-160`).
"""

from __future__ import annotations

import functools

import chex
import jax
import jax.numpy as jnp
import numpy as np

from .core.camera import Camera, CameraMatrices, did_camera_move
from .core.framebuffers import GBuffer, VelocityBuffer
from .scene.rasterizer import rasterize_gbuffer, rasterize_velocity
from .scene.scene import Scene
from .scene.shading import shade_direct


@chex.dataclass(frozen=True)
class FrameContext:
    """Everything an effect stage may read (all traced except env mips)."""

    gbuffer: GBuffer
    velocity: VelocityBuffer
    last_velocity: VelocityBuffer
    scene_color: jnp.ndarray          # direct-lit input (H, W, 3)
    cam: CameraMatrices               # jittered (matches G-buffer raster)
    unjittered_cam: CameraMatrices
    prev_cam: CameraMatrices          # previous frame, unjittered
    frame_index: jnp.ndarray          # traced int32 scalar
    params: dict                      # per-effect uniform dicts
    env: object                       # EquirectEnv | None


class EffectComposer:
    """Drives the frame loop; owns effects, state, and host bookkeeping."""

    def __init__(self, scene: Scene, camera: Camera, width: int, height: int):
        self.scene = scene
        self.camera = camera
        self.width = int(width)
        self.height = int(height)
        self.effects = []
        self.frame = 0
        self.camera_not_moved_frames = 0
        self._state = None
        self._frame_fn = None
        self._static_sig = None
        self._packed = None
        self._prev_cam: CameraMatrices | None = None
        self._last_unjittered: CameraMatrices | None = None
        self._reset_pending = True

    # ------------------------------------------------------------------
    def add_effect(self, effect) -> "EffectComposer":
        self.effects.append(effect)
        self._frame_fn = None
        self._state = None
        return self

    def reset(self):
        """Discard temporal history next frame (keepData=0 for one frame,
        like `TemporalReprojectPass.js:158-160`)."""
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

    def _build_frame_fn(self):
        effects = tuple(self.effects)
        env = self.scene.environment
        lighting = self.scene.lighting_params()
        h, w = self.height, self.width

        def frame_fn(packed, model_mats, prev_model_mats, cam, unjit_cam,
                     prev_cam, state, params, frame_index):
            gbuffer = rasterize_gbuffer(
                packed, model_mats, cam.projection_view_matrix, h, w
            )
            velocity = rasterize_velocity(
                packed, model_mats, prev_model_mats,
                unjit_cam.projection_view_matrix,
                prev_cam.projection_view_matrix, h, w,
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
            )
            new_state = {"__global__": {"last_velocity": velocity}}
            for e in effects:
                color, st = e.apply(ctx, color, state[e.name])
                new_state[e.name] = st
            return color, new_state

        return jax.jit(frame_fn, donate_argnums=(6,))

    # ------------------------------------------------------------------
    def render(self):
        """Render one frame; returns the (H, W, 3) image (device array)."""
        if self._packed is None:
            self._packed = self.scene.pack()

        static_sig = tuple((e.name, e.static_key()) for e in self.effects)
        if self._frame_fn is None or static_sig != self._static_sig:
            self._frame_fn = self._build_frame_fn()
            self._static_sig = static_sig
            if self._state is None:
                self._state = self._init_state()

        # --- host-side camera bookkeeping ------------------------------
        self.camera.clear_view_offset()
        unjit = self.camera.matrices()
        moved = did_camera_move(self._last_unjittered, unjit)
        self.camera_not_moved_frames = 0 if moved else self.camera_not_moved_frames + 1

        needs_jitter = any(e.needs_jitter for e in self.effects)
        if needs_jitter:
            self.camera.jitter(self.width, self.height, self.frame)
            cam = self.camera.matrices()
        else:
            cam = unjit
        prev_cam = self._prev_cam if self._prev_cam is not None else unjit

        # --- uniforms ---------------------------------------------------
        for e in self.effects:
            e.host_update(self)
        params = {
            "__global__": {
                "keep_data": jnp.float32(0.0 if self._reset_pending else 1.0),
                "camera_moved": jnp.asarray(moved),
                "camera_not_moved_frames": jnp.float32(self.camera_not_moved_frames),
            }
        }
        for e in self.effects:
            params[e.name] = {k: jnp.asarray(v) for k, v in e.uniforms().items()}

        image, self._state = self._frame_fn(
            self._packed,
            self.scene.model_matrices(),
            self.scene.prev_model_matrices(),
            cam, unjit, prev_cam,
            self._state, params, jnp.int32(self.frame),
        )

        # --- end-of-frame snapshots ------------------------------------
        self._prev_cam = unjit
        self._last_unjittered = unjit
        self.scene.commit_frame()
        self.frame += 1
        self._reset_pending = False
        return image

    # ------------------------------------------------------------------
    def state(self, effect_name: str):
        """Inspect an effect's state pytree (observability hook)."""
        return self._state[effect_name] if self._state else None
