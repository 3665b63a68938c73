"""SSGI / SSR effects: orchestrate trace -> denoise -> compose.

TPU port of `/root/reference/src/ssgi/SSGIEffect.js` (+ `SSREffect.js`,
`SSGIOptions.js`, `denoise/Denoiser.js`). The reference's temporal
feedback topology is reproduced exactly (SURVEY.md §7 "hard parts" #1):

- the SSGI tracer's radiance fetch reads *last frame's* denoiser output
  (`SSGIPass.js:88`),
- the temporal reprojector's history is the Poisson denoiser's B target
  from last frame (`Denoiser.js:51`),
- both live in this effect's state pytree and update every frame.

``denoise_mode`` mirrors `Denoiser.js:7` ("full" | "full_temporal" |
"denoised" | "temporal").
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.compose import ssgi_compose
from ..ops.denoiser_compose import denoiser_compose
from ..ops.poisson_denoise import PoissonDenoiseConfig, poisson_denoise
from ..ops.ssgi import SSGIConfig, ssgi
from ..ops.temporal_reproject import (
    TemporalReprojectConfig, temporal_reproject,
)
from .base import Effect
from ..core.framebuffers import GBuffer, VelocityBuffer
from ..core.math3d import uv_grid
from ..core.sampling import sample_bilinear, sample_nearest


def _resize_bilinear(tex, h, w):
    return sample_bilinear(tex, uv_grid(h, w))


def _resize_nearest(tex, h, w):
    return sample_nearest(tex, uv_grid(h, w))


def _resize_gbuffer(gb: GBuffer, h, w) -> GBuffer:
    return GBuffer(
        diffuse=_resize_nearest(gb.diffuse, h, w),
        normal=_resize_nearest(gb.normal, h, w),
        roughness=_resize_nearest(gb.roughness, h, w),
        metalness=_resize_nearest(gb.metalness, h, w),
        emissive=_resize_nearest(gb.emissive, h, w),
        depth=_resize_nearest(gb.depth, h, w),
    )


def _resize_velocity(vel: VelocityBuffer, h, w) -> VelocityBuffer:
    return VelocityBuffer(
        velocity=_resize_nearest(vel.velocity, h, w),
        normal=_resize_nearest(vel.normal, h, w),
        depth=_resize_nearest(vel.depth, h, w),
    )

#: quality presets (`SSGIEffect.js:79-99`; the reference's duplicated
#: "medium" case is collapsed, SURVEY.md quirks list)
SSGI_PRESETS = {
    "low": dict(steps=10, refine_steps=2, denoise_mode="full_temporal",
                resolution_scale=0.5),
    "medium": dict(steps=20, refine_steps=4, denoise_mode="full"),
}


class SSGIEffect(Effect):
    name = "ssgi"

    #: "ssgi" traces diffuse+specular; "ssr" specular only
    mode = "ssgi"

    def __init__(self, distance: float = 10.0, thickness: float = 10.0,
                 env_blur: float = 0.5, importance_sampling: bool = True,
                 steps: int = 20, refine_steps: int = 5,
                 missed_rays: bool = False,
                 denoise_iterations: int = 1, radius: float = 3.0,
                 phi: float = 0.5, luma_phi: float = 5.0,
                 depth_phi: float = 2.0, normal_phi: float = 50.0,
                 roughness_phi: float = 50.0, specular_phi: float = 50.0,
                 denoise_mode: str = "full",
                 fog_color=None, fog_density: float = 0.0,
                 resolution_scale: float = 1.0,
                 use_direct_light: bool = True,
                 env_box: tuple | None = None,
                 preset: str | None = None,
                 selection: str = "mask",
                 output_texture: str | None = None,
                 trace: str = "sweep", sweep_dirs: int = 16,
                 sweep_steps: int = 32, env_fetch_stride: int = 2):
        if preset is not None:
            p = SSGI_PRESETS[preset]
            steps = p.get("steps", steps)
            refine_steps = p.get("refine_steps", refine_steps)
            denoise_mode = p.get("denoise_mode", denoise_mode)
            resolution_scale = p.get("resolution_scale", resolution_scale)
        self.distance = distance
        self.thickness = thickness
        self.env_blur = env_blur
        self.denoise_mode = denoise_mode
        self.fog_color = fog_color
        self.fog_density = fog_density
        #: how ``Mesh.gi_exclude`` restricts the GI G-buffer
        #: (`SSGIPass.js:71-79` camera-layer Selection):
        #: "mask"     — derive the restricted buffer by masking excluded
        #:              pixels to background (free; geometry occluded
        #:              *behind* an excluded mesh stays hidden),
        #: "rerender" — true restricted re-render without the excluded
        #:              faces (exact reference semantics incl. revealing
        #:              occluded geometry; costs one extra raster pass)
        if selection not in ("mask", "rerender"):
            raise ValueError("selection must be 'mask' or 'rerender'")
        self.selection = selection
        #: debug routing like the reference's ``outputTexture`` option
        #: (`SSGIEffect.js:228-251`): None | "diffuse" | "specular" |
        #: "denoised_diffuse" | "denoised_specular" | "composed"
        self.output_texture = output_texture

        self.resolution_scale = float(resolution_scale)
        if trace not in ("march", "sweep"):
            raise ValueError("trace must be 'march' or 'sweep'")
        # use_direct_light defaults ON: the reference effect runs with
        # `isUsingRenderPass = true` (`SSGIEffect.js:29`), which sets the
        # `useDirectLight` define (`SSGIEffect.js:144-148`) so the lit
        # scene render is added into diffuse+specular GI
        # (`ssgi.frag:267-272`). Without it a scene lit only by
        # sun/point lights (no environment) composes to black.
        self.cfg = SSGIConfig(
            mode=self.mode, steps=steps, refine_steps=refine_steps,
            missed_rays=missed_rays, importance_sampling=importance_sampling,
            use_direct_light=use_direct_light, env_box=env_box,
            trace=trace, sweep_dirs=sweep_dirs, sweep_steps=sweep_steps,
            env_fetch_stride=env_fetch_stride,
        )
        n_tex = 2 if self.mode == "ssgi" else 1
        self.temporal_cfg = TemporalReprojectConfig(
            texture_count=n_tex,
            log_transform=True,
            reproject_specular=(False, True) if n_tex == 2 else (True,),
            neighborhood_clamp=(True,) * n_tex,
            confidence_power=0.75,
            input_type="diffuse_specular" if n_tex == 2 else "specular",
        )
        self.denoise_cfg = PoissonDenoiseConfig(
            iterations=denoise_iterations, radius=radius, phi=phi,
            luma_phi=luma_phi, depth_phi=depth_phi, normal_phi=normal_phi,
            roughness_phi=roughness_phi, specular_phi=specular_phi,
            is_specular=(False, True) if n_tex == 2 else (True,),
        )

    # ------------------------------------------------------------------
    def static_key(self):
        return (self.cfg, self.temporal_cfg, self.denoise_cfg,
                self.denoise_mode, self.output_texture, self.selection,
                self.fog_color, self.fog_density, self.resolution_scale)

    def uniforms(self):
        return {
            "ray_distance": float(self.distance),
            "thickness": float(self.thickness),
            "env_blur": float(self.env_blur),
        }

    def init_state(self, height, width):
        n_tex = self.temporal_cfg.texture_count
        return {
            "history": [
                jnp.zeros((height, width, 4), jnp.float32) for _ in range(n_tex)
            ],
            "composed": jnp.zeros((height, width, 3), jnp.float32),
        }

    # ------------------------------------------------------------------
    def apply(self, ctx, color, state):
        u = ctx.params[self.name]
        g = ctx.params["__global__"]

        # 0. Selection: the reference renders the GI G-buffer with only
        #    the selected camera layers (`SSGIPass.js:71-79`), so
        #    excluded meshes are absent from every GI input — they
        #    neither occlude rays nor appear in reflections, and their
        #    pixels read as background (scene color passes through in
        #    step 5). Derive that restricted G-buffer by sending
        #    gi_exclude pixels to background.
        gbuffer = ctx.gbuffer
        mesh_id = getattr(gbuffer, "mesh_id", None)
        gi_w = g.get("gi_mask_meshes")
        gi_rerender = getattr(ctx, "gi_gbuffer", None)
        if self.selection == "rerender" and gi_rerender is not None:
            # exact camera-layer re-render: the composer rasterized a
            # second G-buffer without the excluded faces; the WHOLE
            # chain (trace, temporal, denoise, compose depth test) runs
            # on it, exactly like `SSGIPass.js:74-77` + the compose
            # shader's restricted depthTexture (`ssgi_compose.frag`).
            gbuffer = gi_rerender
        elif mesh_id is not None and gi_w is not None:
            sel = jnp.where(
                mesh_id >= 0, gi_w[jnp.maximum(mesh_id, 0)], 1.0) > 0.5
            s1 = sel[..., None]
            gbuffer = GBuffer(
                diffuse=jnp.where(s1, gbuffer.diffuse, 0.0),
                normal=jnp.where(s1, gbuffer.normal, 0.0),
                roughness=jnp.where(sel, gbuffer.roughness, 0.0),
                metalness=jnp.where(sel, gbuffer.metalness, 0.0),
                emissive=jnp.where(s1, gbuffer.emissive, 0.0),
                depth=jnp.where(sel, gbuffer.depth, 1.0),
                mesh_id=jnp.where(sel, mesh_id, -1),
                ao=None if gbuffer.ao is None
                else jnp.where(sel, gbuffer.ao, 1.0),
            )

        # 1. stochastic trace; radiance feedback = last frame's composed
        #    output (`SSGIPass.js:88`). With resolution_scale < 1 the trace
        #    runs on a downsampled G-buffer and the result is upsampled
        #    (the reference's SSGIPass renderTarget scaling,
        #    `SSGIPass.js:52-57`).
        if self.resolution_scale < 1.0:
            h, w = gbuffer.depth.shape
            h2 = max(int(h * self.resolution_scale), 8)
            w2 = max(int(w * self.resolution_scale), 8)
            gb_lo = _resize_gbuffer(gbuffer, h2, w2)
            vel_lo = _resize_velocity(ctx.velocity, h2, w2)
            acc_lo = _resize_bilinear(state["composed"], h2, w2)
            color_lo = _resize_bilinear(color, h2, w2)
            g_diffuse, g_specular = ssgi(
                gb_lo, vel_lo, acc_lo, color_lo,
                ctx.env, ctx.cam, ctx.frame_index, self.cfg,
                ray_distance=u["ray_distance"], thickness=u["thickness"],
                env_blur=u["env_blur"],
            )
            # nearest for diffuse: bilinear would blend the -1
            # "no diffuse sample" sentinel into valid radiance
            g_diffuse = _resize_nearest(g_diffuse, h, w)
            g_specular = _resize_bilinear(g_specular, h, w)
        else:
            g_diffuse, g_specular = ssgi(
                gbuffer, ctx.velocity, state["composed"], color,
                ctx.env, ctx.cam, ctx.frame_index, self.cfg,
                ray_distance=u["ray_distance"], thickness=u["thickness"],
                env_blur=u["env_blur"],
            )
        inputs = [g_diffuse, g_specular] if self.mode == "ssgi" else [g_specular]

        # 2. temporal reprojection; history = last frame's denoised B
        #    (`Denoiser.js:51`), options per `Denoiser.js:33-42`
        temporal = temporal_reproject(
            inputs, state["history"],
            ctx.velocity, ctx.last_velocity,
            ctx.cam, ctx.prev_cam,
            self.temporal_cfg,
            max_blend=1.0,
            neighborhood_clamp_intensity=0.5,
            full_accumulate=~g["camera_moved"],
            keep_data=g["keep_data"],
            roughness_tex=gbuffer.roughness,
        )

        # 3. spatial Poisson denoise (skipped for *_temporal modes)
        if self.denoise_mode in ("full", "denoised"):
            denoised = poisson_denoise(
                temporal, gbuffer, ctx.frame_index, self.denoise_cfg
            )
        else:
            denoised = temporal

        # 4. final GI composition (K7)
        if self.mode == "ssgi":
            d_gi, s_gi = denoised
            scene_tex = None
            input_type = "diffuse_specular"
        else:
            d_gi = denoised[0]
            s_gi = denoised[0]
            scene_tex = color
            input_type = "specular"
        composed = denoiser_compose(
            d_gi, s_gi, gbuffer, ctx.cam,
            scene_color=scene_tex, input_type=input_type,
        )

        # 5. composite over the scene + optional fog (K13)
        out = ssgi_compose(
            composed, color, gbuffer.depth, ctx.cam,
            fog_color=self.fog_color, fog_density=self.fog_density,
        )

        # (no per-pixel restore step needed: the masked G-buffer makes
        # excluded pixels background, so step 5 already passes scene
        # color through for them, exactly like the reference)

        new_state = {"history": denoised, "composed": composed}

        if self.output_texture is not None:
            debug = {
                "diffuse": g_diffuse[..., :3],
                "specular": g_specular[..., :3],
                "temporal_diffuse": temporal[0][..., :3],
                "temporal_specular": temporal[-1][..., :3],
                "denoised_diffuse": denoised[0][..., :3],
                "denoised_specular": denoised[-1][..., :3],
                "composed": composed,
            }[self.output_texture]
            return debug, new_state
        return out, new_state


class SSREffect(SSGIEffect):
    """Specular-only screen-space reflections (`SSREffect.js:3-9`)."""

    name = "ssr"
    mode = "ssr"
