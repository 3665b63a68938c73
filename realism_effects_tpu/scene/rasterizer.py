"""Minimal JAX triangle rasterizer producing G-buffer + velocity buffers.

The reference delegates rasterization to three.js/WebGL with swapped
materials (K16 G-buffer write, `GBufferMaterial.js:46-96`; K17 velocity
write, `VelocityDepthNormalMaterial.js:105-189`). The TPU framework needs
its own: a **clipless 2D-homogeneous rasterizer** (Olano-Greer style).
Edge functions are evaluated directly on homogeneous vertex coordinates,
so triangles crossing the near plane need no clipping, there is no
data-dependent control flow, and the perspective-correct interpolation
weights fall out of the same edge values. Structured as a ``lax.scan``
over triangle chunks (visibility) plus one gather pass (attributes).

Entry points:
- :func:`rasterize_gbuffer`   -> :class:`GBuffer` (K16 semantics)
- :func:`rasterize_velocity`  -> :class:`VelocityBuffer` (K17 semantics:
  dual-matrix transform, per-object previous model matrices)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.framebuffers import GBuffer, VelocityBuffer
from .scene import PackedScene

_CHUNK = 16  # triangles per scan step; (H, W, CHUNK) temps must fit HBM
#: default depth-peel passes for alpha-*map* transparency (see
#: _visibility); each pass re-rasterizes with earlier per-pixel winners
#: excluded. Overridable per call via ``alpha_peels`` (and per composer
#: via ``EffectComposer(alpha_peels=...)``) — deeper transparency stacks
#: trade raster passes for correctness.
_ALPHA_PEELS = 3


def _world_transform(packed: PackedScene, model_mats: jnp.ndarray,
                     bones: jnp.ndarray | None = None,
                     morph_weights: jnp.ndarray | None = None):
    """Object -> world positions/normals: optional morph-target blend
    (three.js order: morphs first, `VelocityDepthNormalMaterial.js:110-132`),
    optional linear-blend skinning (K17 semantics incl. bones,
    `VelocityDepthNormalMaterial.js:8-66`), then the per-mesh model matrix.

    ``morph_weights``: (M, T) per-mesh weights matching the packed
    (V, T, 3) delta tables; the velocity pass calls this twice with
    current and previous-frame weights."""
    positions, normals = packed.positions, packed.normals
    if morph_weights is not None and packed.morph_pos_deltas.shape[1] > 0:
        wv = morph_weights[packed.vert_mesh_id]       # (V, T)
        positions = positions + jnp.sum(
            wv[:, :, None] * packed.morph_pos_deltas, axis=1
        )
        normals = normals + jnp.sum(
            wv[:, :, None] * packed.morph_nrm_deltas, axis=1
        )
    if bones is not None:
        bm = bones[packed.skin_indices]               # (V, 4, 4, 4)
        w = packed.skin_weights[:, :, None, None]
        skin = jnp.sum(bm * w, axis=1)                # (V, 4, 4)
        srot = skin[:, :3, :3]
        positions = jnp.sum(srot * positions[:, None, :], axis=-1) + skin[:, :3, 3]
        normals = jnp.sum(srot * normals[:, None, :], axis=-1)
    mats = model_mats[packed.vert_mesh_id]            # (V, 4, 4)
    # explicit broadcast arithmetic: exact f32 on the VPU (a dot_general
    # here would take the bf16 MXU path and corrupt vertex positions)
    rot = mats[:, :3, :3]
    pos = jnp.sum(rot * positions[:, None, :], axis=-1) + mats[:, :3, 3]
    # normal matrix ~ rotation part (assumes rigid/uniform-scale transforms)
    nrm = jnp.sum(rot * normals[:, None, :], axis=-1)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    return pos, nrm


def _clip_positions(world_pos: jnp.ndarray, view_proj: jnp.ndarray):
    """(V, 3) world -> (V, 4) clip."""
    homo = jnp.concatenate([world_pos, jnp.ones_like(world_pos[:, :1])], axis=-1)
    return jnp.matmul(homo, view_proj.T, precision="highest")


def _homogeneous_verts(clip: jnp.ndarray, height: int, width: int):
    """Clip coords -> 2D-homogeneous screen verts (hx, hy, hw).

    hx = pixel_x * w etc. — linear in clip space, defined for any w.
    """
    w = clip[..., 3]
    hx = (0.5 * clip[..., 0] + 0.5 * w) * width
    hy = (0.5 * clip[..., 1] + 0.5 * w) * height
    return jnp.stack([hx, hy, w], axis=-1)


def _edge_coeffs(h0, h1, h2):
    """Per-triangle edge-function coefficients and determinant.

    e_i(px, py) = A_i*px + B_i*py + C_i, where (A_i, B_i, C_i) is the cross
    product of the other two homogeneous vertices.
    """
    def cross_coeffs(a, b):
        A = a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1]
        B = a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2]
        C = a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
        return A, B, C

    c0 = cross_coeffs(h1, h2)
    c1 = cross_coeffs(h2, h0)
    c2 = cross_coeffs(h0, h1)
    det = h0[..., 0] * c0[0] + h0[..., 1] * c0[1] + h0[..., 2] * c0[2]
    return (c0, c1, c2), det


def _visibility(clip: jnp.ndarray, faces: jnp.ndarray, height: int, width: int,
                tri_alpha: jnp.ndarray | None = None,
                dither: jnp.ndarray | None = None,
                cnmf=None,
                alpha_tex: tuple | None = None,
                alpha_peels: int = _ALPHA_PEELS,
                face_keep: jnp.ndarray | None = None):
    """Z-buffer visibility: winning triangle id per pixel (-1 = none).

    ``tri_alpha``/``dither`` implement stochastic-alpha transparency with
    the reference's convergence law (`GBufferMaterial.js:57-79`):

    - per-pixel alpha ``a`` = material alpha, optionally multiplied by the
      *green* channel of an alpha map (``alpha_tex``),
    - on the first still frame (``cnmf`` == 0, i.e. the camera just
      moved) a hard 0.5 cut, no dithering,
    - on later still frames, dither against ``mix(a, step(0.5, a),
      1 / (cnmf*0.1 + 1))`` — near-binary right after movement, relaxing
      toward the true alpha as TRAA/TAA accumulates samples.

    ``alpha_tex``: optional (pages (F,) int32, uvs (V, 2), atlas
    (N, S, S, 4)) for per-texel map alpha (nearest-sampled). Texel alpha
    is resolved by **depth peeling**: the z-scan itself stays gather-free
    (an in-scan (H, W, K)-indexed atlas gather either faults the TPU or
    compiles pathologically at >= 512^2), so each peel pass rasterizes
    with previous winners excluded per pixel and the convergence-law
    test runs on the winner's texel at (H, W). Pixels whose first
    ``alpha_peels`` candidate layers all dither out become background —
    exact up to that depth complexity (the reference's in-shader discard
    has no such bound, but >3 overlapping dithered-out layers on one
    still-frame pixel is vanishing).
    Returns (tri_id (H, W) int32, depth01 (H, W) in [0, 1], 1 = background).
    """
    num_faces = faces.shape[0]
    pad = (-num_faces) % _CHUNK
    faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    tri_ids = jnp.concatenate(
        [jnp.arange(num_faces, dtype=jnp.int32), jnp.full((pad,), -1, jnp.int32)]
    )

    hverts = _homogeneous_verts(clip, height, width)   # (V, 3)
    tri_h = hverts[faces_p]                            # (F', 3, 3)
    # per-triangle scale normalization for f32 headroom
    scale = 1.0 / (jnp.sum(jnp.abs(tri_h[..., 2]), axis=-1, keepdims=True)[..., None] + 1e-6)
    tri_h = tri_h * scale
    tri_z = clip[faces_p][..., 2] * scale[..., 0]      # scaled z_clip
    tri_w = tri_h[..., 2]                              # scaled w

    (c0, c1, c2), det = _edge_coeffs(tri_h[:, 0], tri_h[:, 1], tri_h[:, 2])
    coeffs = jnp.stack(
        [jnp.stack(c0, -1), jnp.stack(c1, -1), jnp.stack(c2, -1)], axis=1
    )  # (F', 3 edges, 3 coeffs)

    # degenerate-sliver protection. Assets ship point/line-degenerate
    # triangles (e.g. amg has tris with three identical verts); their
    # edge coefficients are pure f32 cancellation noise — three almost-
    # parallel half-planes whose tests cover a thin line across the
    # WHOLE screen (radial-streak artifacts). Two guards:
    # (a) cull true-noise triangles: det = 2 * A_px * w0*w1*w2, so
    #     require |A| > 1e-6 px^2 (scale-invariant ratio test);
    # (b) clamp coverage to the triangle's projected bbox (+1 px guard)
    #     when all verts are in front of the camera — a degenerate tri
    #     then covers at most its own footprint. Triangles crossing
    #     w = 0 keep an unbounded bbox (their smear is geometrically
    #     real) and rely on the per-pixel w test.
    wprod = tri_w[:, 0] * tri_w[:, 1] * tri_w[:, 2]
    valid_tri = (jnp.abs(det) > 1e-14) & (tri_ids >= 0)
    valid_tri &= jnp.abs(det) > 2e-6 * jnp.abs(wprod)
    if face_keep is not None:
        # per-face participation mask (camera-layer Selection analog:
        # excluded meshes are simply absent from this render)
        valid_tri &= jnp.concatenate(
            [face_keep, jnp.zeros((pad,), jnp.bool_)])
    w_safe = jnp.where(jnp.abs(tri_h[..., 2]) > 1e-20, tri_h[..., 2], 1e-20)
    px_v = tri_h[..., 0] / w_safe                      # (F', 3)
    py_v = tri_h[..., 1] / w_safe
    w_pos = jnp.all(tri_h[..., 2] > 1e-12, axis=1)
    inf = jnp.float32(jnp.inf)
    tri_bbox = jnp.stack([
        jnp.where(w_pos, px_v.min(1) - 1.0, -inf),
        jnp.where(w_pos, px_v.max(1) + 1.0, inf),
        jnp.where(w_pos, py_v.min(1) - 1.0, -inf),
        jnp.where(w_pos, py_v.max(1) + 1.0, inf),
    ], axis=-1)                                        # (F', 4)
    sgn = jnp.where(det >= 0.0, 1.0, -1.0)

    # VMEM z-scan kernel (TPU, opaque scenes, SMEM-sized tri count):
    # per-triangle bbox skip collapses the scan's O(H*W*F) to the
    # triangles actually touching each block (ops/pallas/raster.py).
    # Stochastic-alpha scenes keep the XLA scan (per-pixel dither state),
    # as do the depth-peel passes it feeds.
    if tri_alpha is None:
        import jax as _jax

        from ..ops.pallas.raster import fits_smem, zscan_visibility

        if _jax.default_backend() == "tpu" and fits_smem(faces_p.shape[0]):
            ids, zbuf = zscan_visibility(
                coeffs, tri_z, tri_w, sgn, valid_tri, tri_bbox,
                height, width,
            )
            return ids, jnp.where(ids >= 0, zbuf * 0.5 + 0.5, 1.0)

    if tri_alpha is not None:
        alpha_p = jnp.concatenate(
            [tri_alpha, jnp.ones((pad,), tri_alpha.dtype)]
        )
    n_chunks = faces_p.shape[0] // _CHUNK
    chunk = lambda a: a.reshape((n_chunks, _CHUNK) + a.shape[1:])
    scan_in = {
        "coef": chunk(coeffs), "z": chunk(tri_z), "w": chunk(tri_w),
        "sgn": chunk(sgn), "valid": chunk(valid_tri), "ids": chunk(tri_ids),
        "bbox": chunk(tri_bbox),
    }
    if tri_alpha is not None:
        scan_in["alpha"] = chunk(alpha_p)

    pxg = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :, None]   # (1, W, 1)
    pyg = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None, None]  # (H, 1, 1)

    def raster_scan(exclude: tuple):
        """One z-buffer pass; ``exclude`` = per-pixel winner ids of
        earlier peel passes, removed from the competition."""

        def step(carry, inp):
            zbuf, ids = carry
            ccoef = inp["coef"]
            # e: (H, W, K) per edge
            e0 = ccoef[:, 0, 0] * pxg + ccoef[:, 0, 1] * pyg + ccoef[:, 0, 2]
            e1 = ccoef[:, 1, 0] * pxg + ccoef[:, 1, 1] * pyg + ccoef[:, 1, 2]
            e2 = ccoef[:, 2, 0] * pxg + ccoef[:, 2, 1] * pyg + ccoef[:, 2, 2]
            s = inp["sgn"][None, None, :]
            covered = (e0 * s >= 0.0) & (e1 * s >= 0.0) & (e2 * s >= 0.0)
            covered &= inp["valid"][None, None, :]
            bb = inp["bbox"]
            covered &= (pxg >= bb[:, 0]) & (pxg <= bb[:, 1]) \
                & (pyg >= bb[:, 2]) & (pyg <= bb[:, 3])

            cw, cz = inp["w"], inp["z"]
            zw = e0 * cw[:, 0] + e1 * cw[:, 1] + e2 * cw[:, 2]  # sum e_i*w_i
            zc = e0 * cz[:, 0] + e1 * cz[:, 1] + e2 * cz[:, 2]  # sum e_i*z_i
            se = e0 + e1 + e2
            se_safe = jnp.where(jnp.abs(se) > 1e-20, se, 1e-20)
            w_pix = zw / se_safe
            covered &= w_pix > 1e-6                         # in front of eye
            z_ndc = zc / jnp.where(jnp.abs(zw) > 1e-20, zw, 1e-20)
            covered &= (z_ndc >= -1.0) & (z_ndc <= 1.0)
            for prev_ids in exclude:
                covered &= inp["ids"][None, None, :] != prev_ids[..., None]
            if tri_alpha is not None:
                # material alpha only — per-triangle broadcast, no
                # gathers; texel alpha is handled by the peel passes
                a = jnp.broadcast_to(
                    inp["alpha"][None, None, :], covered.shape
                )
                opaque = a >= 0.9999
                # first still frame: hard cut; later: softening-ramp
                # dither (`GBufferMaterial.js:63-79`; GLSL step(0.5, a)
                # is 1 at 0.5)
                a_step = (a >= 0.5).astype(jnp.float32)
                ramp = 1.0 / (cnmf * 0.1 + 1.0)
                a_soft = a + (a_step - a) * ramp
                hard_pass = a >= 0.5
                soft_pass = opaque | (dither[..., None] < a_soft)
                covered &= jnp.where(cnmf < 0.5, hard_pass, soft_pass)

            z = jnp.where(covered, z_ndc, jnp.inf)
            k_best = jnp.argmin(z, axis=-1)                 # (H, W)
            z_best = jnp.min(z, axis=-1)
            # chunk ids are consecutive (arange, padded with -1 at the
            # very end — pad slots never win: valid=False -> z=inf), so
            # the winner id is plain arithmetic, NOT a full-res gather
            # (a gather here runs once per scan step: F/16 per pass)
            id_best = inp["ids"][0] + k_best.astype(jnp.int32)

            better = z_best < zbuf
            zbuf = jnp.where(better, z_best, zbuf)
            ids = jnp.where(better, id_best, ids)
            return (zbuf, ids), None

        zbuf0 = jnp.full((height, width), jnp.inf, jnp.float32)
        ids0 = jnp.full((height, width), -1, jnp.int32)
        (zbuf, ids), _ = jax.lax.scan(step, (zbuf0, ids0), scan_in)
        return zbuf, ids

    zbuf, ids = raster_scan(())
    if alpha_tex is None:
        return ids, jnp.where(ids >= 0, zbuf * 0.5 + 0.5, 1.0)

    # --- texel-alpha depth peeling -----------------------------------
    pages, uvs, atlas = alpha_tex
    size = atlas.shape[1]

    def winner_keeps(win_ids):
        """Full convergence-law test (material * texel alpha) on each
        pixel's winning texel — (H, W) gathers only, the same pattern
        as the G-buffer's texture sampling (`GBufferMaterial.js:57-79`,
        nearest texel, *green* channel per :60)."""
        rec = _fetch_face_table(_pack_face_table([
            _face_edge_coeffs(clip, faces, height, width),      # 0..8
            uvs[faces].reshape(-1, 6),                          # 9..14
            pages.astype(jnp.float32),                          # 15
            tri_alpha,                                          # 16
        ]), win_ids)
        wts = _weights_from_coeffs(rec[..., 0:9], height, width)
        uvv = rec[..., 9:15]
        uv = (uvv[..., 0:2] * wts[..., 0:1] + uvv[..., 2:4] * wts[..., 1:2]
              + uvv[..., 4:6] * wts[..., 2:3])
        page = rec[..., 15].astype(jnp.int32)
        iu = (jnp.mod(uv[..., 0], 1.0) * size).astype(jnp.int32) % size
        iv = (jnp.mod(uv[..., 1], 1.0) * size).astype(jnp.int32) % size
        tex_a = atlas[jnp.maximum(page, 0), iv, iu, 1]
        a = rec[..., 16] * jnp.where(page >= 0, tex_a, 1.0)
        a_step = (a >= 0.5).astype(jnp.float32)
        ramp = 1.0 / (cnmf * 0.1 + 1.0)
        a_soft = a + (a_step - a) * ramp
        keep = jnp.where(cnmf < 0.5, a >= 0.5,
                         (a >= 0.9999) | (dither < a_soft))
        return keep | (win_ids < 0)  # background resolves trivially

    keep = winner_keeps(ids)
    final_ids = jnp.where(keep, ids, -1)
    final_z = jnp.where(keep, zbuf, jnp.inf)
    resolved = keep
    exclude = [ids]
    for _ in range(max(alpha_peels - 1, 0)):
        zb, idp = raster_scan(tuple(exclude))
        kp = winner_keeps(idp)
        take = ~resolved & kp
        final_ids = jnp.where(take, idp, final_ids)
        final_z = jnp.where(take, zb, final_z)
        resolved = resolved | kp
        exclude.append(idp)
    depth01 = jnp.where(final_ids >= 0, final_z * 0.5 + 0.5, 1.0)
    return final_ids, depth01


def _pixel_weights(clip: jnp.ndarray, faces: jnp.ndarray, ids: jnp.ndarray,
                   height: int, width: int):
    """Perspective-correct weights for the winning triangle per pixel.

    With homogeneous edge functions, lambda_i = e_i / sum(e) is already
    perspective-correct. Returns (vidx (H,W,3), weights (H,W,3), valid).

    Gathers run per vertex slot — a fused (H, W, 3, 3) gather would carry
    tiny minor dims that TPU tiling pads ~40x (OOM at 4K).
    """
    safe_ids = jnp.maximum(ids, 0)
    vidx = faces[safe_ids]                 # (H, W, 3)
    hverts = _homogeneous_verts(clip, height, width)
    h0 = hverts[vidx[..., 0]]              # (H, W, 3) each
    h1 = hverts[vidx[..., 1]]
    h2 = hverts[vidx[..., 2]]
    scale = 1.0 / (
        jnp.abs(h0[..., 2]) + jnp.abs(h1[..., 2]) + jnp.abs(h2[..., 2]) + 1e-6
    )[..., None]
    h0 = h0 * scale
    h1 = h1 * scale
    h2 = h2 * scale

    (c0, c1, c2), _ = _edge_coeffs(h0, h1, h2)
    px = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5
    e = jnp.stack(
        [c[0] * px + c[1] * py + c[2] for c in (c0, c1, c2)], axis=-1
    )  # (H, W, 3)
    se = jnp.sum(e, axis=-1, keepdims=True)
    wts = e / jnp.where(jnp.abs(se) > 1e-20, se, 1e-20)
    return vidx, wts, ids >= 0


def _interp(attr: jnp.ndarray, vidx: jnp.ndarray, weights: jnp.ndarray):
    """Interpolate per-vertex attribute (V, C) -> (H, W, C).

    Per-slot gathers to avoid a padded (H, W, 3, C) temporary."""
    out = attr[vidx[..., 0]] * weights[..., 0:1]
    out = out + attr[vidx[..., 1]] * weights[..., 1:2]
    return out + attr[vidx[..., 2]] * weights[..., 2:3]


# --- per-face packed records ------------------------------------------------
#
# A full-resolution gather is priced per INDEX (~15 ms per 2M on the TPU,
# payload free to 32 B), so the per-pixel fetch chain (face -> 3 vertex
# ids -> hverts x3 -> attribute x3 per attribute -> material row) is the
# dominant raster cost. All of those quantities are per-FACE constants:
# building one packed per-face record (cheap — index count = F, not H*W)
# collapses the chain to ceil(K/8) gathers per pixel. Values are
# bit-identical: the same f32 ops run on the same inputs, hoisted from
# per-pixel to per-face.

def _face_edge_coeffs(clip: jnp.ndarray, faces: jnp.ndarray,
                      height: int, width: int) -> jnp.ndarray:
    """(F, 9): the scaled edge-function coefficients of `_pixel_weights`
    evaluated per face (c0 | c1 | c2)."""
    hverts = _homogeneous_verts(clip, height, width)
    tri = hverts[faces]                            # (F, 3, 3)
    h0, h1, h2 = tri[:, 0], tri[:, 1], tri[:, 2]
    scale = 1.0 / (
        jnp.abs(h0[..., 2]) + jnp.abs(h1[..., 2]) + jnp.abs(h2[..., 2]) + 1e-6
    )[..., None]
    h0 = h0 * scale
    h1 = h1 * scale
    h2 = h2 * scale
    (c0, c1, c2), _ = _edge_coeffs(h0, h1, h2)
    return jnp.concatenate(
        [jnp.stack(c, axis=-1) for c in (c0, c1, c2)], axis=-1
    )


def _face_attr_coeffs(edge9: jnp.ndarray, attr: jnp.ndarray) -> jnp.ndarray:
    """Compose per-face edge coefficients with a per-vertex attribute:
    the screen-space numerator plane of perspective-correct interpolation.

    ``Σ_i e_i(px,py)·a_i`` is linear in (px,py); its three coefficients
    per attribute channel are per-FACE constants, so baking them into the
    packed record replaces (edge-coeff chunk + per-vertex attr chunk)
    with one coeffs chunk: fewer priced per-pixel gathers, identical
    algebra (the weight normalization Σe either cancels in ratios —
    velocity ndc — or is carried once as :func:`_face_denominator`).

    edge9: (F, 9) from :func:`_face_edge_coeffs`; attr: (F, 3, C).
    Returns (F, 3*C): [A, B, C] per channel.
    """
    e = edge9.reshape(-1, 3, 3)                    # (F, vertex, ABC)
    return jnp.einsum("fvk,fvc->fck", e, attr,
                      precision="highest").reshape(attr.shape[0], -1)


def _face_denominator(edge9: jnp.ndarray) -> jnp.ndarray:
    """(F, 3): coefficients of Σ_i e_i (the weight normalizer)."""
    return edge9.reshape(-1, 3, 3).sum(axis=1)


def _eval_planes(rec: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Evaluate packed [A, B, C]*C linear planes at pixel centers.

    rec: (H, W, 3*C) fetched coefficients -> (H, W, C)."""
    px = jnp.arange(width, dtype=jnp.float32)[None, :, None] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[:, None, None] + 0.5
    c = rec.shape[-1] // 3
    r = rec.reshape(rec.shape[:-1] + (c, 3))
    return r[..., 0] * px + r[..., 1] * py + r[..., 2]


def _pack_face_table(cols) -> list:
    """Pack per-face columns ((F,) or (F, C)) into (F', 128, <=8) chunks
    riding the fast ``tex[y, x]`` gather pattern (flat (N, C) row gathers
    measured 6x slower)."""
    flat = [c[:, None] if c.ndim == 1 else c for c in cols]
    rec = jnp.concatenate(
        [c.astype(jnp.float32) for c in flat], axis=-1)
    f, k = rec.shape
    rows = -(-f // 128)
    rec = jnp.pad(rec, ((0, rows * 128 - f), (0, 0)))
    rec = rec.reshape(rows, 128, k)
    return [rec[..., i: i + 8] for i in range(0, k, 8)]


def _fetch_face_table(chunks, ids: jnp.ndarray) -> jnp.ndarray:
    """(H, W) face ids -> (H, W, K) packed record.

    Small tables (ordinary scenes) resolve by the Pallas VMEM dense
    select (ops/pallas/table.py) — no priced gather at all; huge meshes
    (e.g. Sponza's 262k faces -> 2048 table rows) keep the ceil(K/8)
    ``tex[y, x]`` gathers, which are cheaper there."""
    from ..ops.pallas.table import table_rows_ok, vmem_table_lookup

    safe = jnp.maximum(ids, 0)
    r, l = safe // 128, safe % 128
    return jnp.concatenate(
        [
            vmem_table_lookup(c, r, l) if table_rows_ok(c.shape[0])
            else c[r, l]
            for c in chunks
        ],
        axis=-1,
    )


def _weights_from_coeffs(coeffs: jnp.ndarray, height: int, width: int):
    """Per-pixel perspective-correct weights from the fetched (H, W, 9)
    edge-coefficient record (same formula as `_pixel_weights`)."""
    px = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5
    e = jnp.stack(
        [coeffs[..., 3 * i] * px + coeffs[..., 3 * i + 1] * py
         + coeffs[..., 3 * i + 2] for i in range(3)],
        axis=-1,
    )
    se = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.where(jnp.abs(se) > 1e-20, se, 1e-20)


def _sample_atlas(atlas: jnp.ndarray, page: jnp.ndarray, uv: jnp.ndarray):
    """Bilinear repeat-wrapped fetch from (N, S, S, C) at per-pixel page."""
    s = atlas.shape[1]
    x = jnp.mod(uv[..., 0], 1.0) * s - 0.5
    y = jnp.mod(uv[..., 1], 1.0) * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def tap(yy, xx):
        yy = jnp.mod(yy.astype(jnp.int32), s)
        xx = jnp.mod(xx.astype(jnp.int32), s)
        return atlas[page, yy, xx]

    c00 = tap(y0, x0)
    c01 = tap(y0, x0 + 1)
    c10 = tap(y0 + 1, x0)
    c11 = tap(y0 + 1, x0 + 1)
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def _dfdx(p: jnp.ndarray) -> jnp.ndarray:
    """Screen-space x derivative of an (H, W, C) plane (forward diff,
    edge-clamped — the dFdx analog)."""
    d = p[:, 1:] - p[:, :-1]
    return jnp.concatenate([d, d[:, -1:]], axis=1)


def _dfdy(p: jnp.ndarray) -> jnp.ndarray:
    d = p[1:] - p[:-1]
    return jnp.concatenate([d, d[-1:]], axis=0)


def _perturb_normal(n: jnp.ndarray, world_pos: jnp.ndarray, uv: jnp.ndarray,
                    map_rgb: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Apply a tangent-space normal map using screen-derivative tangent
    frames — three.js ``getTangentFrame`` + ``normal_fragment_maps``
    (`normal_pars_fragment.glsl.js`); the reference's G-buffer normal
    includes this because GBufferMaterial is a patched
    MeshPhysicalMaterial (`GBufferMaterial.js:6-98`). Coordinate-free:
    world-space derivatives give the same frame as three.js' view-space
    ones. Returns unit normals (H, W, 3)."""
    q0 = _dfdx(world_pos)
    q1 = _dfdy(world_pos)
    st0 = _dfdx(uv)
    st1 = _dfdy(uv)
    q1perp = jnp.cross(q1, n)
    q0perp = jnp.cross(n, q0)
    t = q1perp * st0[..., 0:1] + q0perp * st1[..., 0:1]
    b = q1perp * st0[..., 1:2] + q0perp * st1[..., 1:2]
    det = jnp.maximum(jnp.sum(t * t, -1), jnp.sum(b * b, -1))
    inv = jnp.where(det > 0.0, 1.0 / jnp.sqrt(jnp.maximum(det, 1e-30)), 0.0)
    inv = inv[..., None]
    mapn = map_rgb * 2.0 - 1.0
    s = scale[..., None] if scale.ndim == 2 else scale
    out = (t * inv * (mapn[..., 0:1] * s)
           + b * inv * (mapn[..., 1:2] * s)
           + n * mapn[..., 2:3])
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    # degenerate frames (no uv variation) keep the geometric normal
    return jnp.where(norm > 1e-8, out / jnp.maximum(norm, 1e-20), n)


def _alpha_inputs(packed: PackedScene, dither):
    """(tri_alpha, alpha_tex) for stochastic transparency, or Nones."""
    if dither is None:
        return None, None
    face_mesh = packed.vert_mesh_id[packed.faces[:, 0]]
    tri_alpha = packed.materials[face_mesh, 3]
    alpha_tex = None
    if packed.map_atlas.shape[0] > 0:
        pages = packed.alpha_map_index[face_mesh]
        alpha_tex = (pages, packed.uvs, packed.map_atlas)
    return tri_alpha, alpha_tex


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "alpha_peels",
                                    "return_ids"))
def rasterize_gbuffer(packed: PackedScene, model_mats: jnp.ndarray,
                      view_proj: jnp.ndarray, height: int, width: int,
                      bones: jnp.ndarray | None = None,
                      dither: jnp.ndarray | None = None,
                      cnmf=0.0,
                      morph_weights: jnp.ndarray | None = None,
                      alpha_peels: int = _ALPHA_PEELS,
                      face_keep: jnp.ndarray | None = None,
                      return_ids: bool = False) -> GBuffer:
    """Render the SoA G-buffer (K16 semantics: optional morph targets,
    skinning, and stochastic-alpha transparency via ``dither`` (H, W)
    noise + ``cnmf`` = cameraNotMovedFrames for the convergence law).
    ``alpha_peels`` bounds alpha-map transparency depth (static: each
    extra peel adds a raster pass). ``face_keep`` (F,) bool drops faces
    from the render entirely — the camera-layer restricted re-render
    used by exact SSGI Selection (`SSGIPass.js:71-79`).
    ``return_ids``: also return the (H, W) winner-triangle ids, for
    sharing the visibility scan with `rasterize_velocity`."""
    world_pos, world_nrm = _world_transform(
        packed, model_mats, bones, morph_weights
    )
    clip = _clip_positions(world_pos, view_proj)
    tri_alpha, alpha_tex = _alpha_inputs(packed, dither)
    ids, depth01 = _visibility(clip, packed.faces, height, width,
                               tri_alpha, dither, cnmf, alpha_tex,
                               alpha_peels, face_keep=face_keep)
    valid = ids >= 0
    # per-face packed record: ONE fetch chain instead of
    # face->vertices->attributes->material per pixel (see the
    # per-face-records comment block above; values bit-identical).
    # Interpolated attributes ride as COMPOSED numerator planes
    # (_face_attr_coeffs) + one shared denominator: 3 chunks untextured
    # instead of the 4 an (edge coeffs + per-vertex values) layout costs.
    textured = packed.map_atlas.shape[0] > 0
    face_mesh = packed.vert_mesh_id[packed.faces[:, 0]]
    n_mat = packed.materials.shape[1]
    edge9 = _face_edge_coeffs(clip, packed.faces, height, width)
    cols = [
        _face_attr_coeffs(edge9, world_nrm[packed.faces]),      # 0..8
        _face_denominator(edge9),                               # 9..11
        face_mesh.astype(jnp.float32),                          # 12
        packed.materials[face_mesh],                            # 13..13+n_mat
    ]
    if textured:
        cols.append(_face_attr_coeffs(edge9, packed.uvs[packed.faces]))
        cols.append(_face_attr_coeffs(edge9, world_pos[packed.faces]))
        # per-mesh atlas page indices ride the record too (small ints,
        # exact through f32)
        cols.append(jnp.stack([
            packed.map_index[face_mesh], packed.emissive_map_index[face_mesh],
            packed.mr_map_index[face_mesh], packed.normal_map_index[face_mesh],
            packed.ao_map_index[face_mesh],
        ], axis=-1).astype(jnp.float32))
    rec = _fetch_face_table(_pack_face_table(cols), ids)
    den = _eval_planes(rec[..., 9:12], height, width)[..., 0]
    inv_den = 1.0 / jnp.where(jnp.abs(den) > 1e-20, den, 1e-20)
    nrm = _eval_planes(rec[..., 0:9], height, width) * inv_den[..., None]
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)

    mesh_id = rec[..., 12].astype(jnp.int32)
    mat = rec[..., 13:13 + n_mat]          # (H, W, MATERIAL_ROW_SIZE)
    diffuse = mat[..., 0:4]
    emissive = mat[..., 6:9]

    roughness = mat[..., 4]
    metalness = mat[..., 5]
    ao = None
    if textured:
        # textured materials: perspective-correct uv, repeat wrap, atlas
        # page per mesh (`GBufferMaterial.js:46-96` map sampling)
        base = 13 + n_mat
        uv = (_eval_planes(rec[..., base: base + 6], height, width)
              * inv_den[..., None])
        pages = rec[..., base + 15: base + 20].astype(jnp.int32)
        m_page, e_page, mr_page, n_page, a_page = (
            pages[..., 0], pages[..., 1], pages[..., 2], pages[..., 3],
            pages[..., 4],
        )
        tex = _sample_atlas(packed.map_atlas, jnp.maximum(m_page, 0), uv)
        diffuse = jnp.where((m_page >= 0)[..., None], diffuse * tex, diffuse)
        etex = _sample_atlas(packed.map_atlas, jnp.maximum(e_page, 0), uv)
        emissive = jnp.where(
            (e_page >= 0)[..., None], emissive * etex[..., :3], emissive
        )
        # metallic-roughness texture (glTF: G = roughness, B = metalness,
        # multiplied onto the factors — three.js roughnessMap/metalnessMap)
        mr_tex = _sample_atlas(packed.map_atlas, jnp.maximum(mr_page, 0), uv)
        has_mr = mr_page >= 0
        roughness = jnp.where(has_mr, roughness * mr_tex[..., 1], roughness)
        metalness = jnp.where(has_mr, metalness * mr_tex[..., 2], metalness)
        # tangent-space normal map via screen-derivative tangent frames
        # (three.js getTangentFrame + normal_fragment_maps)
        n_tex = _sample_atlas(packed.map_atlas, jnp.maximum(n_page, 0), uv)
        wpos = (_eval_planes(rec[..., base + 6: base + 15], height, width)
                * inv_den[..., None])
        nrm = jnp.where(
            (n_page >= 0)[..., None],
            _perturb_normal(nrm, wpos, uv, n_tex[..., :3], mat[..., 9]),
            nrm,
        )
        # occlusion texture -> baked-AO plane (three.js aomap_fragment:
        # 1 + strength*(texel.r - 1); modulates indirect in shade_direct)
        a_tex = _sample_atlas(packed.map_atlas, jnp.maximum(a_page, 0), uv)
        ao = jnp.where(a_page >= 0,
                       1.0 + mat[..., 10] * (a_tex[..., 0] - 1.0), 1.0)

    vmask = valid[..., None]
    gb = GBuffer(
        diffuse=jnp.where(vmask, diffuse, 0.0),
        normal=jnp.where(vmask, nrm, 0.0),
        roughness=jnp.where(valid, roughness, 1.0),
        metalness=jnp.where(valid, metalness, 0.0),
        emissive=jnp.where(vmask, emissive, 0.0),
        depth=depth01,
        mesh_id=jnp.where(valid, mesh_id, -1).astype(jnp.int32),
        ao=(jnp.where(valid, ao, 1.0) if ao is not None else None),
    )
    return (gb, ids) if return_ids else gb


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "alpha_peels"))
def rasterize_velocity(packed: PackedScene, model_mats: jnp.ndarray,
                       prev_model_mats: jnp.ndarray, view_proj: jnp.ndarray,
                       prev_view_proj: jnp.ndarray, height: int, width: int,
                       bones: jnp.ndarray | None = None,
                       prev_bones: jnp.ndarray | None = None,
                       dither: jnp.ndarray | None = None,
                       cnmf=0.0,
                       morph_weights: jnp.ndarray | None = None,
                       prev_morph_weights: jnp.ndarray | None = None,
                       alpha_peels: int = _ALPHA_PEELS,
                       share_ids: jnp.ndarray | None = None
                       ) -> VelocityBuffer:
    """Render velocity/depth/normal (K17 semantics).

    Both view-proj matrices must be UNJITTERED, mirroring
    `VelocityDepthNormalPass.js:166-171`. Velocity is uv displacement
    ``current - previous`` like `VelocityDepthNormalMaterial.js:75-84`;
    skinned meshes use the previous frame's bone palette and
    morph-animated meshes the previous frame's morph weights for the
    previous position (the ``prevBoneTexture`` /
    ``morphtarget_pars_vertex`` paths,
    `VelocityDepthNormalMaterial.js:110-132`).

    ``share_ids``: optional (H, W) winner-triangle ids from an already-run
    visibility scan (the composer passes the G-buffer's). The z-scan is
    the raster's dominant cost (~32 of 35 ms at 1080p) and the two passes
    otherwise each run their own; sharing resolves visibility ONCE.
    Deviation (PARITY.md): the shared scan saw the TRAA-jittered camera,
    so at geometry edges a sub-pixel-different surface can win vs the
    reference's unjittered velocity rasterization — all velocity VALUES
    are still computed with the unjittered matrices, and depth comes from
    the winner's unjittered clip planes (same formula as the scan's
    z interpolation, hoisted per face). None = run the exact scan.
    """
    world_pos, world_nrm = _world_transform(
        packed, model_mats, bones, morph_weights
    )
    prev_world_pos, _ = _world_transform(
        packed, prev_model_mats,
        prev_bones if bones is not None else None,
        prev_morph_weights if morph_weights is not None else None,
    )
    clip = _clip_positions(world_pos, view_proj)
    prev_clip = _clip_positions(prev_world_pos, prev_view_proj)

    if share_ids is None:
        tri_alpha, alpha_tex = _alpha_inputs(packed, dither)
        ids, depth01 = _visibility(clip, packed.faces, height, width,
                                   tri_alpha, dither, cnmf, alpha_tex,
                                   alpha_peels)
    else:
        ids, depth01 = share_ids, None
    valid = ids >= 0
    # per-face packed record (see rasterize_gbuffer): composed numerator
    # planes for current/previous clip xyw + normals + denominator in
    # one 4-chunk fetch chain (the Σe weight normalizer cancels in the
    # ndc ratios, so velocity needs no denominator of its own; the
    # shared-scan path adds the z numerator plane to rebuild depth)
    edge9 = _face_edge_coeffs(clip, packed.faces, height, width)
    xyw = lambda c: c[packed.faces][..., jnp.asarray((0, 1, 3))]
    cols = [
        _face_attr_coeffs(edge9, xyw(clip)),        # 0..8
        _face_attr_coeffs(edge9, xyw(prev_clip)),   # 9..17
        _face_attr_coeffs(edge9, world_nrm[packed.faces]),  # 18..26
        _face_denominator(edge9),                   # 27..29
    ]
    if share_ids is not None:
        cols.append(_face_attr_coeffs(
            edge9, clip[packed.faces][..., 2:3]))   # 30..32: z numerator
    rec = _fetch_face_table(_pack_face_table(cols), ids)
    cur = _eval_planes(rec[..., 0:9], height, width)     # (H, W, 3): x y w
    prev = _eval_planes(rec[..., 9:18], height, width)
    safe = lambda w: jnp.where(jnp.abs(w) > 1e-6, w, 1e-6)
    cur_ndc = cur[..., :2] / safe(cur[..., 2:3])
    prev_ndc = prev[..., :2] / safe(prev[..., 2:3])
    vel = (cur_ndc - prev_ndc) * 0.5       # ndc -> uv units

    den = _eval_planes(rec[..., 27:30], height, width)[..., 0]
    nrm = _eval_planes(rec[..., 18:27], height, width) / jnp.where(
        jnp.abs(den) > 1e-20, den, 1e-20
    )[..., None]
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)

    if depth01 is None:
        # z_ndc = (Σe·z)/(Σe·w) of the winner under the UNJITTERED
        # matrices — the same interpolation the scan evaluates
        zc = _eval_planes(rec[..., 30:33], height, width)[..., 0]
        z_ndc = zc / safe(cur[..., 2])
        depth01 = jnp.where(valid, z_ndc * 0.5 + 0.5, 1.0)

    vmask = valid[..., None]
    return VelocityBuffer(
        velocity=jnp.where(vmask, vel, 0.0),
        normal=jnp.where(vmask, nrm, 0.0),
        depth=depth01,
    )
