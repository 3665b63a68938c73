"""shard_map spatial pipeline: row-sharded framebuffers + halo exchange.

SURVEY.md §2.5's multi-chip mapping: the framebuffer is sharded by rows
across the device mesh (ICI ring); stencil kernels (Poisson taps,
neighborhood clamp, depth-normal stencils — all with bounded support)
exchange ``halo`` boundary rows with ring neighbors via
``jax.lax.ppermute`` before running the ordinary single-chip kernel on
the extended block. Gather-unbounded kernels (SSGI ray march,
reprojection) keep replicated read textures instead — rays traverse
arbitrary screen distance (`ssgi.frag:447-475`), so their source planes
ride an all-gather, which GSPMD inserts automatically in the jit path.

This module is the *explicit* shard_map formulation (collectives visible
in the program); the composer's jit path reaches the same layouts through
GSPMD sharding propagation (see ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.poisson_denoise import PoissonDenoiseConfig, poisson_denoise_pass
from .sharding import ROW_AXIS


def halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str = ROW_AXIS):
    """Extend a local row block with ``halo`` rows from ring neighbors.

    ``x``: the device-local (H_loc, W[, C]) block inside shard_map.
    Returns (H_loc + 2*halo, ...); at the global top/bottom edge the halo
    is edge-replicated (matching the single-chip clamp-to-edge stencils).
    Supports halos larger than the shard height via multiple ppermute
    hops (ceil(halo / H_loc) per side).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    h_loc = x.shape[0]
    hops = -(-halo // h_loc)

    # gather the 2*hops+1 neighboring blocks [idx-hops .. idx+hops]
    # (ring-wrapped; wrapped rows are replaced by edge clamping below)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    parts, prev, nxt = [x], x, x
    for _ in range(hops):
        prev = jax.lax.ppermute(prev, axis_name, fwd)
        parts.insert(0, prev)
        nxt = jax.lax.ppermute(nxt, axis_name, bwd)
        parts.append(nxt)
    ext_all = jnp.concatenate(parts, axis=0)

    # desired global rows, clamped to the image (global clamp-to-edge),
    # re-based onto ext_all whose first row is global (idx - hops) * h_loc
    g = idx * h_loc + jnp.arange(-halo, h_loc + halo)
    g = jnp.clip(g, 0, n * h_loc - 1)
    return ext_all[g - (idx - hops) * h_loc]


def _crop(x: jnp.ndarray, halo: int):
    return x[halo: x.shape[0] - halo]


@functools.lru_cache(maxsize=32)
def _poisson_sharded_fn(n_tex: int, gb_treedef, cfg: PoissonDenoiseConfig,
                        mesh: Mesh, resolution: tuple):
    """Build + jit the sharded Poisson program (cached per config/mesh).

    The jit wrapper matters: dispatching a shard_map eagerly compiles its
    gather-heavy body orders of magnitude slower on the CPU backend
    (~3 s *per gather op*, ~8 min for the full kernel) than compiling the
    identical program under jit (<1 s).
    """
    hg, wg = resolution
    # tap offsets rotate in global uv space (`poisson_denoise.frag:190`),
    # so the vertical pixel reach is bounded by radius * hypot(1, H/W);
    # +2 covers the bilinear footprint and rounding
    halo = int(np.ceil(cfg.radius * float(np.hypot(1.0, hg / wg)))) + 2
    n_passes = 2 * cfg.iterations
    n_gb = gb_treedef.num_leaves

    def local_fn(frame, *args):
        texs = list(args[:n_tex])
        gb = jax.tree_util.tree_unflatten(gb_treedef, args[n_tex:])
        h_loc = texs[0].shape[0]
        # global row of the extended block's first row (may be negative on
        # shard 0; blue_noise_image wraps it toroidally like any other row)
        row0 = jax.lax.axis_index(ROW_AXIS) * h_loc - halo

        gb_ext = jax.tree_util.tree_map(
            lambda p: halo_exchange_rows(p, halo), gb
        )
        for p in range(n_passes):
            ext = [halo_exchange_rows(t, halo) for t in texs]
            out = poisson_denoise_pass(
                ext, gb_ext, frame * n_passes + p, cfg,
                row_offset=row0, resolution=resolution,
            )
            texs = [_crop(t, halo) for t in out]
        return tuple(texs)

    return jax.jit(jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(),) + tuple([P(ROW_AXIS)] * (n_tex + n_gb)),
        out_specs=tuple([P(ROW_AXIS)] * n_tex),
    ))


def poisson_denoise_sharded(textures, gbuffer, frame, cfg: PoissonDenoiseConfig,
                            mesh: Mesh):
    """Row-sharded Poisson denoise with halo exchange.

    **Bit-identical** (up to f32 reassociation) to
    :func:`ops.poisson_denoise.poisson_denoise`: each of the
    ``2 * iterations`` ping-pong passes re-exchanges its halo rows (a
    later pass reads the *previous pass's* output in the halo, so one
    up-front exchange is not enough), the tap pattern is evaluated
    against the global resolution, and the blue-noise phase is evaluated
    at global pixel coordinates via ``row_offset`` so every shard
    reproduces the single-chip noise image.
    """
    gb_leaves, gb_treedef = jax.tree_util.tree_flatten(gbuffer)
    resolution = (int(textures[0].shape[0]), int(textures[0].shape[1]))
    fn = _poisson_sharded_fn(len(textures), gb_treedef, cfg, mesh, resolution)
    return list(fn(jnp.asarray(frame, jnp.int32), *textures, *gb_leaves))


def sharded_stencil(fn, mesh: Mesh, halo: int, num_outputs: int = 1):
    """Wrap an (H, W, ...)-wise stencil function for row-sharded inputs.

    ``fn`` takes and returns full-height arrays; the wrapper runs it per
    shard on halo-extended blocks and crops. All array arguments must be
    row-shardable (same leading H). The shard_map is dispatched under jit
    (eager shard_map compiles gather-heavy bodies pathologically slowly
    on the CPU backend).
    """
    def wrapped(*arrays):
        def local(*blocks):
            ext = [halo_exchange_rows(b, halo) for b in blocks]
            out = fn(*ext)
            if num_outputs == 1:
                return _crop(out, halo)
            return tuple(_crop(o, halo) for o in out)

        in_specs = tuple([P(ROW_AXIS)] * len(arrays))
        out_specs = (
            P(ROW_AXIS) if num_outputs == 1
            else tuple([P(ROW_AXIS)] * num_outputs)
        )
        return jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs
        ))(*arrays)

    return wrapped
