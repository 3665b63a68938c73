"""Equirectangular environment maps: sampling, mips, CDF importance data.

TPU-native version of the reference env pipeline:

- direction <-> equirect uv transforms
  (`/root/reference/src/ssgi/shader/ssgi_utils.frag:64-92`),
- luminance-CDF inversion textures built in a Web Worker by the reference
  (`/root/reference/src/ssgi/utils/EquirectHdrInfoUniform.js:149-245`) —
  here a plain host-side numpy precompute producing the same
  marginal/conditional lookup arrays,
- mip chain for blurred env fetches (``envBlur``, `ssgi.frag:322-327`).
"""

from __future__ import annotations

import chex
import jax.numpy as jnp
import numpy as np

from .math3d import luminance
from .sampling import (
    MipAtlas, build_mip_atlas, build_mip_chain, sample_bilinear,
    sample_bilinear_mip, sample_mip_atlas,
)


@chex.dataclass(frozen=True)
class EquirectEnv:
    """Device-side environment bundle (pytree).

    ``mips`` is a tuple of (H, W, 3) arrays; ``marginal`` is (H,) and
    ``conditional`` (H, W) inverse-CDF lookup arrays matching the
    reference's marginal/conditional weight textures.
    """

    mips: tuple
    atlas: MipAtlas          # same pyramid flattened for fast mip fetches
    marginal: jnp.ndarray
    conditional: jnp.ndarray
    total_sum: jnp.ndarray  # scalar luminance sum
    #: (Hc, Wc, 4) f16 precomposed inverse-CDF table [u, v, lum, 0]
    #: indexed by (noise.y along width, noise.x along height): collapses
    #: the marginal -> conditional -> color lum fetch chain (3 priced
    #: gathers) into ONE f16 quad-packed gather for the sweep trace
    #: (see :func:`sample_equirect_probability` fast path)
    cdf_packed: jnp.ndarray | None = None

    @property
    def map(self) -> jnp.ndarray:
        return self.mips[0]

    @property
    def size(self) -> tuple:
        return self.mips[0].shape[0], self.mips[0].shape[1]

    @property
    def max_mip_level(self) -> int:
        return len(self.mips) - 1


def direction_to_equirect_uv(direction: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) world direction -> equirect uv (`ssgi_utils.frag:64-74`)."""
    u = jnp.arctan2(direction[..., 2], direction[..., 0]) / (2.0 * jnp.pi) + 0.5
    v = 1.0 - jnp.arccos(jnp.clip(direction[..., 1], -1.0, 1.0)) / jnp.pi
    return jnp.stack([u, v], axis=-1)


def equirect_uv_to_direction(uv: jnp.ndarray) -> jnp.ndarray:
    """Equirect uv -> (..., 3) world direction (`ssgi_utils.frag:77-86`)."""
    u = uv[..., 0] - 0.5
    v = 1.0 - uv[..., 1]
    theta = u * 2.0 * jnp.pi
    phi = v * jnp.pi
    sin_phi = jnp.sin(phi)
    return jnp.stack(
        [sin_phi * jnp.cos(theta), jnp.cos(phi), sin_phi * jnp.sin(theta)], axis=-1
    )


def sample_equirect_color(env: EquirectEnv, direction: jnp.ndarray, lod,
                          quantize: bool = False) -> jnp.ndarray:
    """``sampleEquirectEnvMapColor`` (`ssgi_utils.frag:90-92`) with mips.

    Uses the flat mip atlas: per-pixel lod is index arithmetic + gathers
    from one table (the layout-friendly pattern on TPU). ``quantize``
    rounds a traced per-pixel lod to the nearest mip (one gather instead
    of the trilinear pair) — the sweep trace's TPU-native choice.
    """
    uv = direction_to_equirect_uv(direction)
    return sample_mip_atlas(env.atlas, uv, lod, quantize=quantize)


def equirect_direction_pdf(direction: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of an equirect texel (`ssgi_utils.frag:196-205`)."""
    uv = direction_to_equirect_uv(direction)
    sin_theta = jnp.sin(uv[..., 1] * jnp.pi)
    pdf = 1.0 / (2.0 * jnp.pi * jnp.pi * jnp.maximum(sin_theta, 1e-8))
    return jnp.where(sin_theta == 0.0, 0.0, pdf)


def sample_equirect_probability(env: EquirectEnv, noise2: jnp.ndarray,
                                fast: bool = False):
    """Importance-sample the env CDF (`ssgi_utils.frag:210-225`).

    ``noise2``: (..., 2) uniforms. Returns (pdf, direction) where pdf is
    ``width*height * lum/totalSum`` exactly like the reference.

    ``fast=True`` reads the precomposed ``cdf_packed`` table instead of
    chaining marginal -> conditional -> color fetches: ONE f16 gather
    instead of three (the TPU prices gathers per index, CLAUDE.md rule
    2b). The composition is sampled on a dense noise grid at build time,
    so (u, v, lum) are bilinear-in-noise approximations of the exact
    chain; f16 quantizes directions by ~5e-4 — both far below the sweep
    trace's pi/dirs direction binning, which is the only consumer.
    """
    h, w = env.size
    if fast and env.cdf_packed is not None:
        t = sample_bilinear(env.cdf_packed, jnp.stack(
            [noise2[..., 1], noise2[..., 0]], axis=-1))
        uv = t[..., 0:2]
        direction = equirect_uv_to_direction(uv)
        pdf = t[..., 2] / env.total_sum
        return (w * h) * pdf, direction
    # marginal: 1D lookup by noise.x  -> row v in [0,1]
    v = sample_bilinear(env.marginal[:, None], jnp.stack(
        [jnp.zeros_like(noise2[..., 0]), noise2[..., 0]], axis=-1))
    # conditional: 2D lookup by (noise.y, v) -> column u in [0,1]
    u = sample_bilinear(env.conditional, jnp.stack([noise2[..., 1], v], axis=-1))
    uv = jnp.stack([u, v], axis=-1)
    direction = equirect_uv_to_direction(uv)
    color = sample_bilinear(env.map, uv)
    lum = luminance(color)
    pdf = lum / env.total_sum
    return (w * h) * pdf, direction


# ---------------------------------------------------------------------------
# Host-side construction (the Web Worker's job, EquirectHdrInfoUniform.js)
# ---------------------------------------------------------------------------

def _binary_search_rows(cdf: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Vectorized equivalent of ``binarySearchFindClosestIndexOf``."""
    return np.searchsorted(cdf, targets, side="left")


def _np_bilinear(tex: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Host bilinear with the same clamp-to-edge semantics as
    core.sampling.sample_bilinear (x/y in texel units, already -0.5)."""
    h, w = tex.shape[:2]
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = np.where(x0 < 0.0, 0.0, x - x0)
    fy = np.where(y0 < 0.0, 0.0, y - y0)
    xi = np.clip(x0.astype(np.int64), 0, w - 1)
    yi = np.clip(y0.astype(np.int64), 0, h - 1)
    xj = np.clip(xi + 1, 0, w - 1)
    yj = np.clip(yi + 1, 0, h - 1)
    if tex.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    top = tex[yi, xi] + (tex[yi, xj] - tex[yi, xi]) * fx
    bot = tex[yj, xi] + (tex[yj, xj] - tex[yj, xi]) * fx
    return top + (bot - top) * fy


def _build_cdf_packed(data: np.ndarray, marginal: np.ndarray,
                      conditional: np.ndarray, total: float) -> jnp.ndarray:
    """Precompose the inverse-CDF fetch chain onto a dense noise grid.

    Rows index noise.x (the marginal lookup), columns noise.y (the
    conditional lookup); each cell carries [u, v, lum] evaluated with the
    exact bilinear semantics of the runtime chain, so a runtime bilinear
    fetch of this table reproduces the chain up to grid interpolation.
    """
    h, w = conditional.shape
    hc = int(min(max(4 * h, 64), 1024))
    wc = int(min(max(2 * w, 64), 1024))
    nx = (np.arange(hc, dtype=np.float64) + 0.5) / hc
    ny = (np.arange(wc, dtype=np.float64) + 0.5) / wc
    # v = linear 1-D interp of marginal at noise.x (same clamp semantics)
    ym = nx * h - 0.5
    y0m = np.floor(ym)
    fym = np.where(y0m < 0.0, 0.0, ym - y0m)
    yim = np.clip(y0m.astype(np.int64), 0, h - 1)
    yjm = np.clip(yim + 1, 0, h - 1)
    marg = marginal.astype(np.float64)
    v = marg[yim] + (marg[yjm] - marg[yim]) * fym
    # u = bilinear of conditional at (noise.y, v)
    vy = np.broadcast_to(v[:, None], (hc, wc)) * h - 0.5
    uxx = np.broadcast_to(ny[None, :], (hc, wc)) * w - 0.5
    u = _np_bilinear(conditional.astype(np.float64), uxx, vy)
    # lum at the sampled (u, v)
    col = _np_bilinear(data.astype(np.float64), u * w - 0.5,
                       np.broadcast_to(v[:, None], (hc, wc)) * h - 0.5)
    lum = 0.2125 * col[..., 0] + 0.7154 * col[..., 1] + 0.0721 * col[..., 2]
    packed = np.stack(
        [u, np.broadcast_to(v[:, None], (hc, wc)), lum,
         np.zeros_like(u)], axis=-1,
    )
    return jnp.asarray(packed.astype(np.float16))


def build_equirect_env(data: np.ndarray, max_mip_levels: int | None = None) -> EquirectEnv:
    """Build the env bundle from an (H, W, 3) float HDR image.

    Mirrors ``gatherData`` (`EquirectHdrInfoUniform.js:149-245`): luminance
    pdf/cdf per row (conditional) and across rows (marginal), inverted into
    lookup arrays with half-texel centering.
    """
    # the reference's env textures are HalfFloatType (RGBELoader /
    # EXRLoader targets): quantize once to f16 storage and build the CDF
    # from the SAME quantized values so importance pdfs match fetches —
    # and a 3-channel bilinear env tap rides ONE 32-byte f16 quad gather
    # clip to the f16 max first: a >65504 sun texel would otherwise become
    # inf, and the cdf_packed host precompose (inf - inf) would write NaN
    # importance-sample cells (worse than the runtime chain's inf pdf)
    data = np.clip(np.asarray(data, np.float32), 0.0, 65504.0)
    data = np.asarray(data.astype(np.float16), np.float32)
    h, w = data.shape[:2]

    # native threaded CDF builder (the Web Worker's C++ replacement)
    from .. import native
    native_result = native.build_equirect_cdf(data)
    if native_result is not None:
        marginal, conditional, total = native_result
        mips = tuple(
            m.astype(jnp.float16)
            for m in build_mip_chain(jnp.asarray(data),
                                     max_levels=max_mip_levels))
        atlas = build_mip_atlas(jnp.asarray(data))
        return EquirectEnv(
            mips=mips,
            atlas=MipAtlas(atlas.data.astype(jnp.float16), atlas.shapes),
            marginal=jnp.asarray(marginal),
            conditional=jnp.asarray(conditional),
            total_sum=jnp.asarray(total, jnp.float32),
            cdf_packed=_build_cdf_packed(
                data, np.asarray(marginal), np.asarray(conditional), total),
        )

    lum = (
        0.2125 * data[..., 0] + 0.7154 * data[..., 1] + 0.0721 * data[..., 2]
    ).astype(np.float64)

    row_sums = lum.sum(axis=1)                     # (H,)
    total = float(lum.sum())
    cdf_cond = np.cumsum(lum, axis=1)
    safe_rows = np.where(row_sums > 0.0, row_sums, 1.0)
    cdf_cond = cdf_cond / safe_rows[:, None]
    cdf_marg = np.cumsum(row_sums)
    if total > 0:
        cdf_marg = cdf_marg / total

    # marginal inverse CDF: for each i, first row whose cdf >= (i+1)/h
    targets = (np.arange(h) + 1.0) / h
    rows = _binary_search_rows(cdf_marg, targets)
    marginal = ((np.clip(rows, 0, h - 1) + 0.5) / h).astype(np.float32)

    # conditional inverse CDF per row
    targets_x = (np.arange(w) + 1.0) / w
    cols = np.empty((h, w), np.int64)
    for y in range(h):
        cols[y] = _binary_search_rows(cdf_cond[y], targets_x)
    conditional = ((np.clip(cols, 0, w - 1) + 0.5) / w).astype(np.float32)

    mips = tuple(
        m.astype(jnp.float16)
        for m in build_mip_chain(jnp.asarray(data),
                                 max_levels=max_mip_levels))
    atlas = build_mip_atlas(jnp.asarray(data))
    return EquirectEnv(
        mips=mips,
        atlas=MipAtlas(atlas.data.astype(jnp.float16), atlas.shapes),
        marginal=jnp.asarray(marginal),
        conditional=jnp.asarray(conditional),
        total_sum=jnp.asarray(total, jnp.float32),
        cdf_packed=_build_cdf_packed(data, marginal, conditional, total),
    )


_CUBE_AXES = (
    # (major_axis_sign_vector, u_axis, v_axis) per face, GL order
    ((1, 0, 0), (0, 0, -1), (0, -1, 0)),   # +x
    ((-1, 0, 0), (0, 0, 1), (0, -1, 0)),   # -x
    ((0, 1, 0), (1, 0, 0), (0, 0, 1)),     # +y
    ((0, -1, 0), (1, 0, 0), (0, 0, -1)),   # -y
    ((0, 0, 1), (1, 0, 0), (0, -1, 0)),    # +z
    ((0, 0, -1), (-1, 0, 0), (0, -1, 0)),  # -z
)


def equirect_to_cube(equirect: jnp.ndarray, size: int) -> jnp.ndarray:
    """Render a (6, size, size, 3) cube map from an equirect image."""
    s = (np.arange(size) + 0.5) / size * 2.0 - 1.0
    sv, su = np.meshgrid(s, s, indexing="ij")
    faces = []
    for fwd, u_ax, v_ax in _CUBE_AXES:
        d = (
            np.asarray(fwd, np.float32)[None, None]
            + su[..., None] * np.asarray(u_ax, np.float32)
            + sv[..., None] * np.asarray(v_ax, np.float32)
        )
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
        faces.append(sample_bilinear(equirect, direction_to_equirect_uv(d)))
    return jnp.stack(faces)


def cube_to_equirect(faces: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Convert a (6, S, S, 3) cube map to an (height, width, 3) equirect.

    TPU-native version of ``CubeToEquirectEnvPass``
    (`/root/reference/src/ssgi/pass/CubeToEquirectEnvPass.js:59-99`) —
    a pure device computation instead of a fullscreen draw + GPU->CPU
    readback.
    """
    v, u = jnp.meshgrid(
        (jnp.arange(height) + 0.5) / height,
        (jnp.arange(width) + 0.5) / width,
        indexing="ij",
    )
    d = equirect_uv_to_direction(jnp.stack([u, v], axis=-1))
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])

    out = jnp.zeros((height, width, 3), faces.dtype)
    for idx, (fwd, u_ax, v_ax) in enumerate(_CUBE_AXES):
        fwd = jnp.asarray(fwd, jnp.float32)
        ma = math3d_dot_const(d, fwd)
        if fwd[0] != 0:
            is_major = (ax >= ay) & (ax >= az) & (ma > 0)
        elif fwd[1] != 0:
            is_major = (ay > ax) & (ay >= az) & (ma > 0)
        else:
            is_major = (az > ax) & (az > ay) & (ma > 0)
        safe_ma = jnp.where(jnp.abs(ma) > 1e-8, ma, 1e-8)
        fu = math3d_dot_const(d, jnp.asarray(u_ax, jnp.float32)) / safe_ma
        fv = math3d_dot_const(d, jnp.asarray(v_ax, jnp.float32)) / safe_ma
        face_uv = jnp.stack([fu, fv], axis=-1) * 0.5 + 0.5
        col = sample_bilinear(faces[idx], face_uv)
        out = jnp.where(is_major[..., None], col, out)
    return out


def math3d_dot_const(d, c):
    return d[..., 0] * c[0] + d[..., 1] * c[1] + d[..., 2] * c[2]


def _ggx_sample_table(roughness: float, samples: int,
                      base_h: int, base_w: int) -> np.ndarray:
    """Tangent-space GGX-NDF importance samples + weights (host precompute).

    The split-sum prefilter convention (n = v): half vectors drawn from
    the GGX NDF over an R2 low-discrepancy set, reflected about z to
    light directions, weighted by n·l. Each sample also carries a
    source-mip lod from its pdf (filtered importance sampling: reading
    a sample's whole solid angle from the box chain instead of a point
    kills HDR fireflies at practical sample counts). Returns
    (samples, 5) float32 rows ``(lx, ly, lz, weight, lod)``.
    """
    a = max(roughness, 1e-3) ** 2
    i = np.arange(samples, dtype=np.float64)
    # R2 plastic-number sequence (same generator family as core.rng)
    g = 1.3247179572447460
    xi1 = np.mod((i + 1) / g, 1.0)
    xi2 = np.mod((i + 1) / (g * g), 1.0)
    phi = 2.0 * np.pi * xi1
    cos_t = np.sqrt((1.0 - xi2) / (1.0 + (a * a - 1.0) * xi2))
    sin_t = np.sqrt(np.maximum(1.0 - cos_t * cos_t, 0.0))
    h = np.stack([sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t], -1)
    # l = reflect(-v, h) with v = n = +z  =>  l = 2 (h·z) h - z
    l = 2.0 * h[:, 2:3] * h - np.array([0.0, 0.0, 1.0])
    w = np.maximum(l[:, 2], 0.0)
    # pdf_l = D(theta_h) cos(theta_h) / (4 (v.h)) with v = n
    d_ggx = a * a / (np.pi * ((a * a - 1.0) * cos_t ** 2 + 1.0) ** 2)
    pdf = np.maximum(d_ggx * cos_t / np.maximum(4.0 * cos_t, 1e-8), 1e-12)
    omega_s = 1.0 / (samples * pdf)            # per-sample solid angle
    omega_p = 4.0 * np.pi / (base_h * base_w)  # mean base-texel solid angle
    lod = np.maximum(0.5 * np.log2(omega_s / omega_p), 0.0)
    return np.concatenate(
        [l, w[:, None], lod[:, None]], -1).astype(np.float32)


def _ggx_filter_level(box_mips: tuple, h: int, w: int,
                      roughness: float, samples: int) -> jnp.ndarray:
    """GGX-prefilter the box chain into an (h, w, 3) level."""
    import jax

    box_mips = tuple(jnp.asarray(m) for m in box_mips)
    v_g, u_g = jnp.meshgrid((jnp.arange(h) + 0.5) / h,
                            (jnp.arange(w) + 0.5) / w, indexing="ij")
    n = equirect_uv_to_direction(jnp.stack([u_g, v_g], axis=-1))  # (h, w, 3)
    # tangent frame around n
    up = jnp.where(jnp.abs(n[..., 1:2]) < 0.999,
                   jnp.asarray([0.0, 1.0, 0.0]),
                   jnp.asarray([1.0, 0.0, 0.0]))
    t = jnp.cross(up, n)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
    b = jnp.cross(n, t)
    base_h, base_w = box_mips[0].shape[:2]
    table = jnp.asarray(
        _ggx_sample_table(roughness, samples, base_h, base_w))

    def step(carry, row):
        acc, wsum = carry
        l = row[0] * t + row[1] * b + row[2] * n       # (h, w, 3)
        col = sample_bilinear_mip(
            box_mips, direction_to_equirect_uv(l), row[4])
        return (acc + col * row[3], wsum + row[3]), None

    (acc, wsum), _ = jax.lax.scan(
        step, (jnp.zeros((h, w, 3), box_mips[0].dtype), jnp.float32(0.0)),
        table)
    return acc / jnp.maximum(wsum, 1e-8)


def ggx_prefilter_mips(equirect: jnp.ndarray,
                       max_levels: int | None = None,
                       samples: int = 96) -> tuple:
    """Roughness-indexed GGX-prefiltered equirect mip chain.

    The TPU-native equivalent of three.js ``PMREMGenerator`` as the
    reference demo uses it (`example/BlurredEnvMapGenerator.js:310-358`):
    level L is the environment convolved with the GGX specular lobe of
    ``roughness = L / maxMip`` (split-sum prefilter, n = v), so a
    trilinear fetch at ``lod = roughness * maxMip`` returns the
    prefiltered radiance for that roughness. Level 0 is the unfiltered
    map; each level L also halves resolution like a regular mip and
    integrates over the box mip of matching resolution (anti-aliasing
    the wide-lobe gathers).
    """
    box = build_mip_chain(equirect, max_levels=max_levels)
    n_levels = len(box)
    out = [box[0]]
    for lvl in range(1, n_levels):
        h, w = box[lvl].shape[:2]
        roughness = lvl / (n_levels - 1)
        out.append(_ggx_filter_level(box, h, w, roughness, samples))
    return tuple(out)


#: fixed unit-sphere scatter set for blur_env's directional mixing
#: (the copy shader's ``mix(rayDirection, randomDir, blur)``,
#: `BlurredEnvMapGenerator.js:253-261`, with an R3 sequence standing in
#: for its blue-noise/PCG4D stream)
_BLUR_SCATTER_SAMPLES = 32


def blur_env(equirect: jnp.ndarray, blur: float,
             samples: int = 96) -> jnp.ndarray:
    """Return an equirect env blurred by ``blur`` in [0, 1].

    The analog of the example's ``BlurredEnvMapGenerator.generate``
    (`/root/reference/example/BlurredEnvMapGenerator.js:310-358`): build
    the GGX roughness-prefiltered pyramid (three.js PMREM equivalent,
    :func:`ggx_prefilter_mips`), then evaluate the copy shader's
    estimator per texel — average ``textureCubeUV(env, mix(dir, random,
    blur), blur)`` over a scatter set — into a new equirect map at the
    source resolution.
    """
    blur = float(blur)
    if blur <= 0.0:
        return equirect
    mips = ggx_prefilter_mips(equirect, samples=samples)
    h, w = equirect.shape[0], equirect.shape[1]
    v, u = jnp.meshgrid((jnp.arange(h) + 0.5) / h, (jnp.arange(w) + 0.5) / w,
                        indexing="ij")
    d = equirect_uv_to_direction(jnp.stack([u, v], axis=-1))
    lod = jnp.float32(blur) * (len(mips) - 1)

    i = np.arange(_BLUR_SCATTER_SAMPLES, dtype=np.float64) + 1.0
    g = 1.2207440846057596  # R3 plastic number (`harmoniousNumbers` :206)
    r = np.stack([np.mod(i / g, 1.0), np.mod(i / g ** 2, 1.0),
                  np.mod(i / g ** 3, 1.0)], -1) * 2.0 - 1.0
    r /= np.maximum(np.linalg.norm(r, axis=-1, keepdims=True), 1e-8)

    acc = jnp.zeros_like(equirect)
    for rd in np.asarray(r, np.float32):
        md = d * (1.0 - blur) + jnp.asarray(rd) * blur
        md = md / jnp.maximum(
            jnp.linalg.norm(md, axis=-1, keepdims=True), 1e-8)
        acc = acc + sample_bilinear_mip(
            mips, direction_to_equirect_uv(md), lod)
    return acc / _BLUR_SCATTER_SAMPLES


#: GL cube-face file order, the three.js ``CubeTextureLoader`` layout
CUBE_FACE_NAMES = ("posx", "negx", "posy", "negy", "posz", "negz")


def load_cubemap(path: str, height: int | None = None,
                 ext: str | None = None) -> jnp.ndarray:
    """Load a 6-face cube map directory into an equirect (H, W, 3) image.

    ``path`` holds ``posx/negx/posy/negy/posz/negz`` images (any PIL
    format) — the layout the reference's demo ships
    (`example/public/cubemap/yokohama_3/`) and feeds through
    ``CubeTextureLoader`` + ``CubeToEquirectEnvPass``
    (`CubeToEquirectEnvPass.js:59-99`). Cube faces upload unflipped
    (three.js sets ``flipY=false`` for cube textures), so rows stay in
    file order. ``height`` defaults to the reference's pow2 sizing:
    face size * 2 wide, * 1 tall (`CubeToEquirectEnvPass.js:63-72`).
    Returns linear-light values (sRGB decode applied)."""
    import os

    from PIL import Image

    faces = []
    for name in CUBE_FACE_NAMES:
        file = None
        for e in ([ext] if ext else ("jpg", "png", "jpeg", "webp")):
            cand = os.path.join(path, f"{name}.{e}")
            if os.path.exists(cand):
                file = cand
                break
        if file is None:
            raise FileNotFoundError(f"cube face {name}.* not in {path}")
        img = np.asarray(Image.open(file).convert("RGB"), np.float32) / 255.0
        faces.append(np.where(img <= 0.04045, img / 12.92,
                              ((img + 0.055) / 1.055) ** 2.4))
    size = faces[0].shape[0]
    if height is None:
        height = 1 << int(np.ceil(np.log2(size)))  # pow2, like :63-72
    return cube_to_equirect(jnp.asarray(np.stack(faces)), height, 2 * height)


def procedural_sky(height: int = 64, width: int = 128, sun_dir=(0.5, 0.6, 0.3),
                   sun_intensity: float = 40.0, sky_tint=(0.35, 0.55, 0.95),
                   ground_tint=(0.25, 0.22, 0.2)) -> np.ndarray:
    """Simple analytic HDR sky for demos/tests (gradient + sun disk)."""
    v, u = np.meshgrid(
        (np.arange(height) + 0.5) / height, (np.arange(width) + 0.5) / width,
        indexing="ij",
    )
    theta = (u - 0.5) * 2.0 * np.pi
    phi = (1.0 - v) * np.pi
    d = np.stack(
        [np.sin(phi) * np.cos(theta), np.cos(phi), np.sin(phi) * np.sin(theta)],
        axis=-1,
    )
    sun = np.asarray(sun_dir, np.float64)
    sun /= np.linalg.norm(sun)
    cos_sun = (d * sun).sum(-1)
    up = np.clip(d[..., 1], -1.0, 1.0)
    sky = np.asarray(sky_tint)[None, None] * (0.4 + 0.6 * np.clip(up, 0, 1))[..., None]
    ground = np.asarray(ground_tint)[None, None] * (0.3 - 0.2 * np.clip(up, -1, 0))[..., None]
    base = np.where(up[..., None] >= 0.0, sky, ground)
    sun_disk = sun_intensity * np.clip(cos_sun - 0.995, 0.0, 1.0)[..., None] * 200.0
    halo = 0.5 * np.clip(cos_sun, 0.0, 1.0)[..., None] ** 8
    return (base + sun_disk + halo).astype(np.float32)
