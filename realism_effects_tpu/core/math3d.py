"""Core 3D math: view/screen/world transforms shared by every kernel.

TPU-native re-design of the transform helpers that the reference library
keeps in GLSL (`/root/reference/src/ssgi/shader/ssgi_utils.frag:7-38`,
`/root/reference/src/temporal-reproject/shader/reproject.frag:13-37`,
`/root/reference/src/hbao/shader/hbao_utils.glsl:10-29`).

Conventions
-----------
- Matrices are float32 ``(4, 4)`` arrays applied as ``M @ [x, y, z, 1]``
  (mathematically identical to GLSL's column-major ``M * v``).
- ``view_matrix`` maps world -> view (camera looks down -Z).
- ``camera_matrix_world`` = inverse(view_matrix), maps view -> world.
- Screen ``uv`` is in [0, 1]^2 with ``u`` along width and ``v`` along
  height; array storage is ``(H, W, ...)`` with row 0 at ``v = 0``.
- ``depth`` is the [0, 1] depth-buffer value (NDC z * 0.5 + 0.5).

All functions are shape-polymorphic over leading batch dims: ``uv`` may be
``(..., 2)``, positions ``(..., 3)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _apply_rows(m, p, rows, translate_col):
    """sum_j m[row, j] * p[..., j] (+ m[row, tcol]) for each row.

    Written as explicit broadcast arithmetic rather than a matmul: a (..., 3)
    x (3, 3) contraction would hit the MXU at bf16 default precision on TPU,
    which is far too coarse for camera transforms. The VPU form is exact f32
    and fuses with surrounding ops.
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    outs = []
    for r in rows:
        v = m[r, 0] * x + m[r, 1] * y + m[r, 2] * z
        if translate_col is not None:
            v = v + m[r, translate_col]
        outs.append(v)
    return outs


def transform_point(m, p):
    """Apply a 4x4 matrix to points ``(..., 3)`` with w-divide."""
    rx, ry, rz, w = _apply_rows(m, p, (0, 1, 2, 3), 3)
    r = jnp.stack([rx, ry, rz], axis=-1)
    return r / w[..., None]


def transform_point_nodiv(m, p):
    """Apply a 4x4 matrix to points ``(..., 3)``; returns xyz and w."""
    rx, ry, rz, w = _apply_rows(m, p, (0, 1, 2, 3), 3)
    return jnp.stack([rx, ry, rz], axis=-1), w


def transform_dir(m, d):
    """Rotate directions ``(..., 3)`` by the upper 3x3 of ``m``."""
    rx, ry, rz = _apply_rows(m, d, (0, 1, 2), None)
    return jnp.stack([rx, ry, rz], axis=-1)


def transform_dir_transpose(m, d):
    """Rotate directions by the *transpose* of the upper 3x3 of ``m``.

    Mirrors GLSL ``(vec4(d, 0.) * M).xyz`` which the reference uses to apply
    the inverse rotation of a rigid matrix (e.g. view -> world with the
    world -> view matrix, `ssgi.frag:136`).
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack(
        [
            m[0, 0] * x + m[1, 0] * y + m[2, 0] * z,
            m[0, 1] * x + m[1, 1] * y + m[2, 1] * z,
            m[0, 2] * x + m[1, 2] * y + m[2, 2] * z,
        ],
        axis=-1,
    )


def normalize(v, eps: float = 1e-20):
    return v * jnp.reciprocal(jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps))


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def luminance(rgb):
    """Rec.709-ish luminance used across the reference shaders
    (`reproject.frag:9`, `ssgi_utils.frag:3`)."""
    return rgb[..., 0] * 0.2125 + rgb[..., 1] * 0.7154 + rgb[..., 2] * 0.0721


def perspective_depth_to_view_z(depth, near, far):
    """[0,1] depth-buffer value -> (negative) view-space z.

    Matches three.js ``perspectiveDepthToViewZ`` used at
    `ssgi_utils.frag:7-13`: viewZ = (near*far) / ((far-near)*depth - far).
    """
    return (near * far) / ((far - near) * depth - far)


def orthographic_depth_to_view_z(depth, near, far):
    return depth * (near - far) - near


def depth_to_view_z(depth, cam):
    """Depth-buffer value -> view-space z, dispatching on the projection
    type like the reference's PERSPECTIVE_CAMERA define
    (`ssgi_utils.frag:7-13`, `hbao_utils.glsl:10-16`). The branch is read
    off the projection matrix itself: a perspective projection maps
    clip-w from -z (``P[3, 2] == -1``), an orthographic one maps w = 1
    (``P[3, 2] == 0``)."""
    persp = perspective_depth_to_view_z(depth, cam.near, cam.far)
    ortho = orthographic_depth_to_view_z(depth, cam.near, cam.far)
    return jnp.where(cam.projection_matrix[3, 2] != 0.0, persp, ortho)


def view_z_to_perspective_depth(view_z, near, far):
    """Inverse of :func:`perspective_depth_to_view_z`."""
    return ((near * far) / view_z + far) / (far - near)


def screen_to_world(uv, depth, camera_matrix_world, projection_matrix_inverse):
    """(uv, depth) -> world position. Mirrors `reproject.frag:21-28`."""
    ndc = jnp.stack(
        [
            (uv[..., 0] - 0.5) * 2.0,
            (uv[..., 1] - 0.5) * 2.0,
            (depth - 0.5) * 2.0,
        ],
        axis=-1,
    )
    clip = transform_point(projection_matrix_inverse, ndc)
    return transform_point(camera_matrix_world, clip)


def view_to_screen(view_pos, projection_matrix):
    """View-space position -> screen uv in [0,1]^2 (`ssgi_utils.frag:26-33`)."""
    xyz, w = transform_point_nodiv(projection_matrix, view_pos)
    ndc_xy = xyz[..., :2] / w[..., None]
    return ndc_xy * 0.5 + 0.5


def world_to_screen(world_pos, view_matrix, projection_matrix):
    """World position -> screen uv (`hbao.frag:30-32`)."""
    return view_to_screen(transform_point(view_matrix, world_pos), projection_matrix)


def get_view_position(uv, view_z, projection_matrix, projection_matrix_inverse):
    """Reconstruct a view-space position from (uv, viewZ).

    Mirrors ``getViewPosition`` (`ssgi_utils.frag:17-24`): builds the clip
    position at the depth-buffer value implied by viewZ via the projection
    matrix's w row.
    """
    clip_w = projection_matrix[3, 2] * view_z + projection_matrix[3, 3]
    ndc = jnp.stack(
        [
            (uv[..., 0] - 0.5) * 2.0,
            (uv[..., 1] - 0.5) * 2.0,
            jnp.broadcast_to((view_z - 0.5) * 2.0, uv[..., 0].shape),
        ],
        axis=-1,
    )
    m = projection_matrix_inverse
    cx, cy, cz = (ndc[..., i] * clip_w for i in range(3))
    cw = jnp.broadcast_to(clip_w, cx.shape)
    view = jnp.stack(
        [
            m[0, 0] * cx + m[0, 1] * cy + m[0, 2] * cz + m[0, 3] * cw,
            m[1, 0] * cx + m[1, 1] * cy + m[1, 2] * cz + m[1, 3] * cw,
        ],
        axis=-1,
    )
    # GLSL overwrites p.z with viewZ after the inverse projection
    # (`ssgi_utils.frag:17-24`), so only xy are taken from the matrix.
    view_z_arr = jnp.broadcast_to(view_z, view[..., 0].shape)[..., None]
    return jnp.concatenate([view[..., :2], view_z_arr], axis=-1)


def fwidth(v):
    """Per-pixel |ddx| + |ddy| over an ``(H, W, ...)`` array.

    Stand-in for GLSL ``fwidth`` (`reproject.frag:265-268`): forward
    differences with edge replication instead of 2x2 quad derivatives.
    """
    dx = jnp.abs(jnp.diff(v, axis=1, append=v[:, -1:]))
    dy = jnp.abs(jnp.diff(v, axis=0, append=v[-1:]))
    return dx + dy


def uv_grid(height: int, width: int, dtype=jnp.float32):
    """Pixel-center uv coordinates, shape ``(H, W, 2)``; row 0 is v=0."""
    u = (jnp.arange(width, dtype=dtype) + 0.5) / width
    v = (jnp.arange(height, dtype=dtype) + 0.5) / height
    uu, vv = jnp.meshgrid(u, v)
    return jnp.stack([uu, vv], axis=-1)


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def mix(a, b, t):
    return a + (b - a) * t


def reflect(i, n):
    """GLSL reflect: i - 2*dot(n,i)*n."""
    return i - 2.0 * dot(n, i)[..., None] * n
