"""Edge-aware spatio-temporal Poisson denoiser (kernel K6).

TPU re-implementation of
`/root/reference/src/denoise/shader/poisson_denoise.frag` +
`/root/reference/src/denoise/pass/PoissonDenoisePass.js`: 8 rotated
Poisson taps with normal/depth/roughness/luma edge-stopping weights and
disocclusion-age blending, run as ``2 * iterations`` ping-pong passes.

The rotated, flatness-scaled tap offsets are per-pixel, so taps are
gathers (the one pattern XLA can't turn into shifted adds). Every
texture the reference shader taps is NearestFilter-bound
(`GBufferPass.js:35-36`, `VelocityDepthNormalPass.js:79-80`,
`TemporalReprojectPass.js:66-67`), and the reference's own storage is
PACKED: normals ride octahedral-f16 in one float channel
(`gbuffer_packing.glsl:61`, read back via ``unpackNormal`` at
`poisson_denoise.frag:59,85`) and the denoise targets are rgba16f.
Reproducing that storage lets every tap fetch EVERYTHING in ONE
<= 8-slot gather: [depth f32 | oct-normal half2x16 | roughness f32 |
2 x half2x16 per texture] — 1 gather/tap instead of the 8 a naive
per-texture bilinear formulation costs (see CLAUDE.md rule 2b).
Deviation: roughness stays f32 (the reference packs it to f16 with
metalness; a full slot is free here, strictly more precise).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..core.framebuffers import GBuffer
from ..core.math3d import fwidth, mix
from ..core.packing import pack_half2x16, pack_normal, unpack_half2x16, \
    unpack_normal
from ..core.rng import blue_noise_image

_SQRT2_4 = 0.25 * float(np.sqrt(2.0))
# `poisson_denoise.frag:91-92`
POISSON8 = np.array(
    [
        (-1.0, 0.0), (0.0, -1.0), (1.0, 0.0), (0.0, 1.0),
        (-_SQRT2_4, -_SQRT2_4), (_SQRT2_4, -_SQRT2_4),
        (_SQRT2_4, _SQRT2_4), (-_SQRT2_4, _SQRT2_4),
    ],
    np.float32,
)


@dataclasses.dataclass(frozen=True)
class PoissonDenoiseConfig:
    """Defaults mirror ``defaultPoissonBlurOptions``
    (`PoissonDenoisePass.js:16-24`) + SSGI option overrides."""

    iterations: int = 1
    radius: float = 3.0
    phi: float = 0.5
    luma_phi: float = 5.0
    depth_phi: float = 2.0
    normal_phi: float = 3.25
    roughness_phi: float = 50.0
    specular_phi: float = 50.0
    #: which input slots hold specular data
    is_specular: tuple = (False,)


def _to_denoise_space(c):
    return jnp.log(c + 1.0)


def _to_linear_space(c):
    return jnp.exp(c) - 1.0


def _luminance8(rgb):
    """pow(luminance, 0.125) (`poisson_denoise.frag:28`)."""
    base = rgb[..., 0] * 0.2125 + rgb[..., 1] * 0.7154 + rgb[..., 2] * 0.0721
    return jnp.maximum(base, 0.0) ** 0.125


def poisson_denoise_pass(
    textures: Sequence[jnp.ndarray],
    gbuffer: GBuffer,
    noise_index,
    cfg: PoissonDenoiseConfig,
    row_offset=0,
    resolution: tuple | None = None,
    scalar_slots: tuple | None = None,
):
    """One 8-tap pass over all texture slots. (H, W, 4) in/out per slot.

    ``row_offset``: global row of this block's first row (sharded blocks
    pass it so the blue-noise phase matches the single-chip image).
    ``resolution``: the *global* (H, W) the tap pattern is defined
    against (`poisson_denoise.frag:190`: offsets are rotated in uv space,
    so the pixel-space pattern depends on the full-image aspect); sharded
    blocks pass the unsharded size, default is this block's own shape."""
    from .pallas import poisson as fused_mod

    hg_, wg_ = resolution if resolution is not None else gbuffer.depth.shape
    if fused_mod.USE_FUSED_PASS and fused_mod.fused_pass_supported(
        cfg, len(textures), int(hg_), int(wg_)
    ):
        return fused_mod.poisson_pass_fused(
            textures, gbuffer, noise_index, cfg,
            row_offset=row_offset, resolution=resolution,
            scalar_slots=scalar_slots,
        )

    h, w = gbuffer.depth.shape
    depth = gbuffer.depth
    # the reference reads normals through the packed G-buffer's
    # octahedral half2x16 channel (`poisson_denoise.frag:59,85`) — the
    # center normal is quantized exactly like the tap normals. Zero
    # (background) normals stay zero: oct encoding divides by |n|_1 and
    # would turn them into NaNs that poison the fwidth-based flatness of
    # every neighboring pixel.
    n_valid = (
        jnp.sum(jnp.abs(gbuffer.normal), axis=-1, keepdims=True) > 1e-8
    )
    packed_nrm = jnp.where(
        n_valid[..., 0], pack_normal(gbuffer.normal), 0.0
    )
    normal = jnp.where(n_valid, unpack_normal(packed_nrm), 0.0)
    roughness = gbuffer.roughness
    is_background = depth >= 1.0
    # denoise targets are rgba16f render targets: centers and taps both
    # read half-quantized texels
    textures = [t.astype(jnp.float16).astype(jnp.float32) for t in textures]

    glossiness = jnp.maximum(0.0, 4.0 * (1.0 - roughness / 0.25))
    specular_factor = jnp.exp(-glossiness * cfg.specular_phi)

    flatness = 1.0 - jnp.minimum(
        jnp.linalg.norm(fwidth(normal), axis=-1), 1.0
    )
    flatness = flatness ** 2.0 * 0.75 + 0.25

    noise = blue_noise_image(h, w, noise_index, row_offset=row_offset)
    angle = noise[..., 0] * 2.0 * jnp.pi
    s, c = jnp.sin(angle), jnp.cos(angle)
    rscale = cfg.radius * flatness

    # per-slot accumulators
    center = []
    for i, tex in enumerate(textures):
        t_rgb = _to_denoise_space(tex[..., :3] * 1.0003)  # `:156` brighten hack
        age = 1.0 / (tex[..., 3] + 1.0) ** (1.2 * cfg.phi)
        center.append({
            "rgb": t_rgb,
            "a": tex[..., 3],
            "lum": _luminance8(t_rgb),
            "w": age,
            "total": jnp.ones((h, w), jnp.float32),
            "acc": t_rgb,
        })

    # ONE packed fetch bundle per tap (CLAUDE.md rule 2b): f32 slots
    # [depth, oct-normal half2x16, roughness, (rg half2x16, ba half2x16)
    # per texture]
    n_tex = len(textures)
    slots = [depth, packed_nrm, roughness]
    for t in textures:
        slots.append(pack_half2x16(t[..., 0:2]))
        slots.append(pack_half2x16(t[..., 2:4]))
    bundle = jnp.stack(slots, axis=-1) if 3 + 2 * n_tex <= 8 else None
    aux = (
        jnp.concatenate(
            [normal, depth[..., None], roughness[..., None]], axis=-1
        ) if bundle is None else None
    )

    hg, wg = resolution if resolution is not None else (h, w)
    # GLOBAL pixel-center uv of this block's rows: tap positions, the
    # nearest-texel snap, and the border clamp are all evaluated in
    # global image coordinates, so a sharded block makes bit-identical
    # snap decisions to the single-chip program (integer row shift is
    # exact; all f32 ops below are the same ops on the same values).
    row0f = jnp.asarray(row_offset, jnp.float32)
    row0i = jnp.asarray(row_offset, jnp.int32)
    ug = (jnp.arange(w, dtype=jnp.float32) + 0.5) / wg
    vg = (jnp.arange(h, dtype=jnp.float32) + row0f + 0.5) / hg
    uug, vvg = jnp.meshgrid(ug, vg)
    uv_g = jnp.stack([uug, vvg], axis=-1)

    def tap_indices(n_uv):
        """Target texel of the clamped nearest fetch at global ``n_uv``,
        addressed into this (possibly halo-extended) block
        (`poisson_denoise.frag:96`; all inputs NearestFilter)."""
        ix = jnp.clip(
            jnp.floor(n_uv[..., 0] * wg).astype(jnp.int32), 0, wg - 1
        )
        iy = jnp.clip(
            jnp.floor(n_uv[..., 1] * hg).astype(jnp.int32), 0, hg - 1
        ) - row0i
        return jnp.clip(iy, 0, h - 1), ix

    def fetch(tex3, n_uv):
        iy, ix = tap_indices(n_uv)
        return tex3[iy, ix]

    # tap uvs for all 8 taps (`poisson_denoise.frag:185-190`:
    # neighborUv = vUv + rm * (offset / resolution) with
    # rm = r * flatness * mat2(c, -s, s, c); GLSL mat2 is column-major,
    # so rm @ v = (c*vx + s*vy, -s*vx + c*vy), applied to the
    # aspect-scaled *global* uv offset)
    tap_uvs = []
    for k in range(8):
        off = POISSON8[k]
        ox_g = (c * (off[0] / wg) + s * (off[1] / hg)) * rscale
        oy_g = (-s * (off[0] / wg) + c * (off[1] / hg)) * rscale
        tap_uvs.append(uv_g + jnp.stack([ox_g, oy_g], axis=-1))

    # dense-select path: tap reach is bounded by the radius, so on the
    # unsharded path the 8 nearest fetches become ONE Pallas kernel of
    # masked VMEM selects — bit-identical values, no per-index gather
    # pricing (see ops/pallas/poisson_taps.py)
    dense_taps = None
    if bundle is not None and resolution is None:
        from .pallas.poisson_taps import dense_windows, poisson_taps_dense
        windows = dense_windows(cfg.radius, hg, wg)
        if windows is not None:
            idx = [tap_indices(tuv) for tuv in tap_uvs]
            dense_taps = poisson_taps_dense(
                bundle,
                jnp.stack([iy for iy, _ in idx]),
                jnp.stack([ix for _, ix in idx]),
                windows,
            )

    for k in range(8):
        n_uv = tap_uvs[k]

        if bundle is not None:
            b = dense_taps[k] if dense_taps is not None \
                else fetch(bundle, n_uv)
            n_depth = b[..., 0]
            n_normal = unpack_normal(b[..., 1])
            n_rough = b[..., 2]
            n_texs = [
                jnp.concatenate(
                    [unpack_half2x16(b[..., 3 + 2 * i]),
                     unpack_half2x16(b[..., 4 + 2 * i])], axis=-1
                ) for i in range(n_tex)
            ]
        else:
            n_aux = fetch(aux, n_uv)
            n_normal = n_aux[..., :3]
            n_depth = n_aux[..., 3]
            n_rough = n_aux[..., 4]
            n_texs = None

        normal_diff = 1.0 - jnp.maximum(
            jnp.sum(normal * n_normal, axis=-1), 0.0
        )
        depth_diff = 10000.0 * jnp.abs(depth - n_depth)
        rough_diff = jnp.abs(roughness - n_rough)
        w_basic = jnp.exp(
            -normal_diff * cfg.normal_phi
            - depth_diff * cfg.depth_phi
            - rough_diff * cfg.roughness_phi
        )
        w_basic = jnp.where(n_depth >= 1.0, 0.0, w_basic)

        for i, tex in enumerate(textures):
            wgt = w_basic * (specular_factor if cfg.is_specular[i] else 1.0)
            t = n_texs[i] if n_texs is not None else fetch(tex, n_uv)
            t_rgb = _to_denoise_space(jnp.maximum(t[..., :3], 0.0))

            disoccl_w = jnp.maximum(wgt, 1e-20) ** 0.1
            luma_diff = jnp.minimum(
                jnp.abs(center[i]["lum"] - _luminance8(t_rgb)), 0.5
            )
            luma_factor = jnp.exp(-luma_diff * cfg.luma_phi)
            age = center[i]["w"]
            wgt = mix(wgt * luma_factor, disoccl_w, age) * age
            wgt = wgt * (wgt >= 0.0001)

            center[i]["acc"] = center[i]["acc"] + wgt[..., None] * t_rgb
            center[i]["total"] = center[i]["total"] + wgt

    outputs = []
    for i, tex in enumerate(textures):
        rgb = _to_linear_space(
            center[i]["acc"] / center[i]["total"][..., None]
        )
        out = jnp.concatenate([rgb, center[i]["a"][..., None]], axis=-1)
        # background discard keeps the input (`poisson_denoise.frag:129-132`)
        outputs.append(jnp.where(is_background[..., None], tex, out))
    return outputs


def poisson_denoise(
    textures: Sequence[jnp.ndarray],
    gbuffer: GBuffer,
    frame,
    cfg: PoissonDenoiseConfig,
    row_offset=0,
    resolution: tuple | None = None,
    scalar_slots: tuple | None = None,
):
    """Full denoise: 2*iterations sequential passes (the ping-pong A/B
    scheme of `PoissonDenoisePass.js:135-149` expressed as a loop carry).
    Returns the final texture list (= target B of the last iteration)."""
    out = list(textures)
    for p in range(2 * cfg.iterations):
        out = poisson_denoise_pass(
            out, gbuffer, jnp.asarray(frame) * 2 * cfg.iterations + p, cfg,
            row_offset=row_offset, resolution=resolution,
            scalar_slots=scalar_slots,
        )
    return out


def poisson_denoise_ao(ao: jnp.ndarray, normal: jnp.ndarray,
                       gbuffer: GBuffer, frame, cfg: PoissonDenoiseConfig):
    """AO-specialized denoise: edge-aware blur of the scalar AO channel.

    The reference routes AO through the same shader with duck-typed
    wiring (`AOEffect.js:57-59`, see SURVEY.md §3.3 caveat); here the AO
    value is denoised directly with normal/depth weights.
    """
    tex = jnp.concatenate(
        [ao[..., None].repeat(3, axis=-1), jnp.zeros_like(ao)[..., None]],
        axis=-1,
    )
    cfg1 = dataclasses.replace(cfg, is_specular=(False,))
    # the replicated-scalar structure survives every pass (identical rgb
    # in -> identical rgb out), so the fused kernel may carry ONE packed
    # channel per slot instead of two
    (out,) = poisson_denoise([tex], gbuffer, frame, cfg1,
                             scalar_slots=(True,))
    return jnp.clip(out[..., 0], 0.0, 1.0)
