"""realism_effects_tpu — TPU-native real-time post-processing engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
0beqz/realism-effects (screen-space GI, temporal reprojection AA,
spatio-temporal denoising, HBAO/GTAO, motion blur, finishing effects).

The public surface mirrors the reference's 14 exports
(`/root/reference/src/index.js:1-31`) plus the TPU framework's own
entry points (EffectComposer, Scene, cameras, rasterizer).
"""

from .composer import EffectComposer, FrameContext
from .core.camera import CameraMatrices, OrthographicCamera, PerspectiveCamera
from .core.envmap import (
    EquirectEnv, blur_env, build_equirect_env, cube_to_equirect,
    equirect_to_cube, load_cubemap,
    procedural_sky,
)
from .core.framebuffers import GBuffer, VelocityBuffer
from .effects.ao import AOEffect, GTAOEffect, HBAOEffect
from .effects.base import Effect
from .effects.fxaa import FXAAEffect
from .effects.smaa import SMAAEffect
from .effects.finishing import (
    GradualBackgroundEffect, LensDistortionEffect, SharpnessEffect,
    SparkleEffect,
)
from .effects.motion_blur import MotionBlurEffect
from .effects.postfx import (
    BloomEffect, LUT3DEffect, ToneMappingEffect, VignetteEffect,
    load_lut_3dl,
)
from .effects.ssgi import SSGI_PRESETS, SSGIEffect, SSREffect
from .effects.taa import TAAPass
from .effects.traa import TRAAEffect
from .ops.poisson_denoise import PoissonDenoiseConfig, poisson_denoise
from .ops.temporal_reproject import (
    TemporalReprojectConfig, temporal_reproject,
)
from .scene.geometry import (
    Material, Mesh, make_box, make_plane, make_sphere, rotation_x,
    rotation_y, scale, translation,
)
from .scene.animation import AnimationClip, AnimationMixer
from .scene.gltf import GltfAsset, load_gltf, load_gltf_asset, write_glb
from .scene.rasterizer import rasterize_gbuffer, rasterize_velocity
from .scene.scene import Scene
from .scene.shading import shade_direct
from .utils.debug import visualize_gbuffer, visualize_velocity
from .utils.image_io import save_frame, write_png

__version__ = "0.1.0"

__all__ = [
    # reference export parity (src/index.js)
    "SSGIEffect", "SSREffect", "TAAPass", "TRAAEffect", "MotionBlurEffect",
    "HBAOEffect", "GTAOEffect", "SharpnessEffect", "GradualBackgroundEffect",
    "SparkleEffect", "LensDistortionEffect",
    # postprocessing-package companions the reference demo stacks with
    # (`example/main.js:465-476,510-539`)
    "BloomEffect", "VignetteEffect", "ToneMappingEffect", "LUT3DEffect",
    "FXAAEffect",
    "SMAAEffect",
    "load_lut_3dl",
    "temporal_reproject", "TemporalReprojectConfig",
    "poisson_denoise", "PoissonDenoiseConfig",
    "rasterize_velocity",  # VelocityPass / VelocityDepthNormalPass
    # framework
    "EffectComposer", "FrameContext", "Effect", "AOEffect",
    "Scene", "Mesh", "Material", "PerspectiveCamera", "OrthographicCamera",
    "CameraMatrices", "GBuffer", "VelocityBuffer",
    "EquirectEnv", "build_equirect_env", "procedural_sky",
    "cube_to_equirect", "equirect_to_cube", "load_cubemap", "blur_env",
    "make_box", "make_plane", "make_sphere",
    "translation", "rotation_x", "rotation_y", "scale",
    "rasterize_gbuffer", "shade_direct", "load_gltf", "load_gltf_asset",
    "GltfAsset", "AnimationMixer", "AnimationClip", "write_glb",
    "visualize_gbuffer", "visualize_velocity", "save_frame", "write_png",
    "SSGI_PRESETS",
]
