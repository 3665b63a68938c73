"""Random / quasirandom sources.

TPU-native equivalents of the reference's noise stack:

- R2 plastic-number low-discrepancy sequence for camera jitter
  (`/root/reference/src/temporal-reproject/utils/QuasirandomGenerator.js:11-24`).
- PCG4D hash + tiled blue-noise texture for per-pixel shader randomness
  (`/root/reference/src/utils/shader/blue_noise.glsl:9-48`,
  `/root/reference/src/utils/BlueNoiseUtils.js`).

The reference ships a 128x128 RGBA blue-noise PNG asset; we generate our
own blue-noise tile once (FFT high-pass filtered white noise, rank-order
normalized to a uniform histogram) and cache it under ``assets/``.
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

# Plastic number constants (QuasirandomGenerator.js:11-14)
_G = 1.32471795724474602596090885447809
_A1 = 1.0 / _G
_A2 = 1.0 / (_G * _G)
_BASE = 1.1127756842787055  # harmoniousNumber(7)

BLUE_NOISE_SIZE = 128

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "assets")


def r2_sequence_point(n: int) -> tuple[float, float]:
    """n-th point of the R2 sequence in [0,1)^2."""
    return ((_BASE + _A1 * n) % 1.0, (_BASE + _A2 * n) % 1.0)


def r2_sequence(count: int) -> np.ndarray:
    n = np.arange(count, dtype=np.float64)
    return np.stack([(_BASE + _A1 * n) % 1.0, (_BASE + _A2 * n) % 1.0], axis=-1)


def r3_sequence_point(n: int) -> tuple[float, float, float]:
    g = 1.2207440846057596
    a1, a2, a3 = 1.0 / g, 1.0 / (g * g), 1.0 / (g * g * g)
    return ((_BASE + a1 * n) % 1.0, (_BASE + a2 * n) % 1.0, (_BASE + a3 * n) % 1.0)


# ---------------------------------------------------------------------------
# Blue-noise tile
# ---------------------------------------------------------------------------

def _generate_blue_noise_channel(rng: np.random.Generator, size: int) -> np.ndarray:
    """One blue-noise channel via FFT high-pass + rank-order normalization."""
    white = rng.standard_normal((size, size))
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.fftfreq(size)[None, :]
    radius = np.sqrt(fx * fx + fy * fy)
    # High-pass ramp: suppress low frequencies -> blue spectrum.
    filt = radius ** 1.5
    filt[0, 0] = 0.0
    shaped = np.real(np.fft.ifft2(np.fft.fft2(white) * filt))
    # Rank-order normalize to an exactly uniform histogram in [0, 1).
    flat = shaped.ravel()
    ranks = np.empty_like(flat)
    ranks[np.argsort(flat, kind="stable")] = np.arange(flat.size)
    return ((ranks + 0.5) / flat.size).reshape(size, size)


def generate_blue_noise(size: int = BLUE_NOISE_SIZE, channels: int = 4,
                        seed: int = 0x5EED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.stack(
        [_generate_blue_noise_channel(rng, size) for _ in range(channels)], axis=-1
    ).astype(np.float32)


@functools.lru_cache(maxsize=1)
def blue_noise_tile() -> np.ndarray:
    """The cached (128, 128, 4) float32 blue-noise tile in [0, 1)."""
    path = os.path.join(_ASSET_DIR, "blue_noise_128x128x4.npy")
    if os.path.exists(path):
        return np.load(path)
    tile = generate_blue_noise()
    try:
        os.makedirs(_ASSET_DIR, exist_ok=True)
        np.save(path, tile)
    except OSError:
        pass
    return tile


# ---------------------------------------------------------------------------
# PCG4D-shifted blue-noise sampling (device side)
# ---------------------------------------------------------------------------

def pcg4d(v: jnp.ndarray) -> jnp.ndarray:
    """PCG4D hash over uint32 ``(..., 4)`` (`blue_noise.glsl:17-28`)."""
    v = v.astype(jnp.uint32)
    v = v * np.uint32(1664525) + np.uint32(1013904223)
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    v = jnp.stack([x, y, z, w], axis=-1)
    v = v ^ (v >> np.uint32(16))
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return jnp.stack([x, y, z, w], axis=-1)


def blue_noise_image(height: int, width: int, index,
                     tile: jnp.ndarray | None = None,
                     row_offset=0, col_offset=0) -> jnp.ndarray:
    """Per-pixel (H, W, 4) blue-noise values for frame ``index``.

    Mirrors ``blueNoise()`` in `blue_noise.glsl:37-48`: the pixel coordinate
    is shifted by a PCG4D hash of the frame index, then used to fetch the
    128x128 tile toroidally. ``index`` may be a traced scalar.

    ``row_offset``/``col_offset`` (static or traced ints, may be negative)
    shift the pixel coordinates to their *global* position — a row-sharded
    device block at global row ``r0`` passes ``row_offset=r0`` and gets
    bit-identical noise to the single-chip image, which is what makes the
    sharded stencil passes exactly equal to their unsharded counterparts.
    """
    # The fetch pattern tile[(y + sy) % size, (x + sx) % size] is a
    # toroidal ROLL of the tile followed by tiling — pure shifts/
    # broadcasts instead of a full-res 2M-index gather (each of which
    # costs ~15 ms on the TPU; this function is called ~15x per frame
    # across the kernels). Values are bit-identical to the gather
    # formulation, including negative sharded row offsets (signed mod).
    return blue_noise_transform(
        height, width, index, lambda t: t, tile=tile,
        row_offset=row_offset, col_offset=col_offset,
    )


def blue_noise_transform(height: int, width: int, index, fn,
                         tile: jnp.ndarray | None = None,
                         row_offset=0, col_offset=0) -> jnp.ndarray:
    """``fn(blue_noise_image(h, w, index))`` for POINTWISE ``fn`` — but
    evaluated on the 128x128 tile and roll+tiled afterwards.

    A pointwise function commutes with the toroidal roll + tiling that
    :func:`blue_noise_image` is built from, so the result is
    bit-identical while any *gathers inside fn* (e.g. the env CDF
    inversion, `ssgi_utils.frag:210-225`) price 16k indices instead of
    H*W ~ 2M (gathers are priced per index on this TPU, CLAUDE.md rule
    2b — this is a ~100x discount on noise-driven table lookups).

    ``fn``: (S, S, 4) noise tile -> (S, S, C) values.
    """
    if tile is None:
        tile = jnp.asarray(blue_noise_tile())
    size = tile.shape[0]
    rolled = rolled_noise_tile(index, row_offset=row_offset,
                               col_offset=col_offset, tile=fn(tile))
    reps_y = -(-height // size)
    reps_x = -(-width // size)
    return jnp.tile(rolled, (reps_y, reps_x, 1))[:height, :width]


def rolled_noise_tile(index, row_offset=0, col_offset=0,
                      tile: jnp.ndarray | None = None) -> jnp.ndarray:
    """The pre-rolled (S, S, C) tile T with
    ``blue_noise_image(h, w, index, row_offset=r0)[y, x] ==
    T[y % S, x % S]`` — the form Pallas kernels consume directly when
    their block rows align with the tile period (no per-pixel gather)."""
    if tile is None:
        tile = jnp.asarray(blue_noise_tile())
    size = tile.shape[0]
    index = jnp.asarray(index, jnp.uint32)
    seed = jnp.stack(
        [
            index,
            index * np.uint32(15843),
            index * np.uint32(31) + np.uint32(4566),
            index * np.uint32(2345) + np.uint32(58585),
        ],
        axis=-1,
    )
    s = pcg4d(seed)
    shift = s[..., :2] % np.uint32(0x0FFFFFFF)
    sx = jnp.mod(
        shift[0].astype(jnp.int32) + jnp.asarray(col_offset, jnp.int32), size
    )
    sy = jnp.mod(
        shift[1].astype(jnp.int32) + jnp.asarray(row_offset, jnp.int32), size
    )
    return jnp.roll(tile, shift=(-sy, -sx), axis=(0, 1))


def jax_broadcast_iota(height: int, width: int) -> jnp.ndarray:
    """(H, W, 2) integer pixel coordinates (x, y) as uint32."""
    xs = jnp.broadcast_to(jnp.arange(width, dtype=jnp.uint32)[None, :], (height, width))
    ys = jnp.broadcast_to(jnp.arange(height, dtype=jnp.uint32)[:, None], (height, width))
    return jnp.stack([xs, ys], axis=-1)


def vogel_disk(count: int, phi_offset: float = 0.0) -> np.ndarray:
    """Vogel spiral distribution on the unit disk, matching
    ``generateVogelDistribution`` exactly
    (`/root/reference/src/ssgi/utils/Utils.js:104-120`: radius
    sqrt(i/n), golden-angle spiral, first point at the origin)."""
    golden = np.pi * (3.0 - np.sqrt(5.0))
    i = np.arange(count, dtype=np.float64)
    r = np.sqrt(i / count)
    theta = i * golden + phi_offset
    return np.stack([r * np.cos(theta), r * np.sin(theta)], axis=-1).astype(np.float32)
