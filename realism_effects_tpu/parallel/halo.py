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

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.poisson_denoise import PoissonDenoiseConfig, poisson_denoise
from .sharding import ROW_AXIS


def halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str = ROW_AXIS):
    """Extend a local row block with ``halo`` rows from ring neighbors.

    ``x``: the device-local (H_loc, W[, C]) block inside shard_map.
    Returns (H_loc + 2*halo, ...); at the global top/bottom edge the halo
    is edge-replicated (matching the single-chip clamp-to-edge stencils).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # bottom rows of the previous device / top rows of the next
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(x[-halo:], axis_name, fwd)
    from_next = jax.lax.ppermute(x[:halo], axis_name, bwd)

    top_edge = jnp.broadcast_to(x[:1], (halo,) + x.shape[1:])
    bot_edge = jnp.broadcast_to(x[-1:], (halo,) + x.shape[1:])
    top = jnp.where(idx == 0, top_edge, from_prev)
    bot = jnp.where(idx == n - 1, bot_edge, from_next)
    return jnp.concatenate([top, x, bot], axis=0)


def _crop(x: jnp.ndarray, halo: int):
    return x[halo: x.shape[0] - halo]


def poisson_denoise_sharded(textures, gbuffer, frame, cfg: PoissonDenoiseConfig,
                            mesh: Mesh):
    """Row-sharded Poisson denoise with halo exchange.

    Equivalent to :func:`ops.poisson_denoise.poisson_denoise` (up to the
    shard-boundary pixels' blue-noise tile phase) but runs each ping-pong
    pass entirely shard-local after exchanging ``ceil(radius)+1`` rows.
    """
    halo = int(cfg.radius) + 2  # max tap offset + bilinear footprint

    # taps use uv offsets computed against the *extended* block height, so
    # the kernel itself is unchanged; only the blue-noise phase differs by
    # the halo offset (acceptable: it is a per-pixel random rotation).
    def local_fn(*args):
        texs = list(args[:len(textures)])
        gb_leaves = args[len(textures):]
        gb = jax.tree_util.tree_unflatten(gb_treedef, gb_leaves)

        texs = [halo_exchange_rows(t, halo) for t in texs]
        gb = jax.tree_util.tree_map(
            lambda p: halo_exchange_rows(p, halo), gb
        )
        out = poisson_denoise(texs, gb, frame, cfg)
        return tuple(_crop(t, halo) for t in out)

    gb_leaves, gb_treedef = jax.tree_util.tree_flatten(gbuffer)

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple([P(ROW_AXIS)] * (len(textures) + len(gb_leaves))),
        out_specs=tuple([P(ROW_AXIS)] * len(textures)),
    )
    return list(fn(*textures, *gb_leaves))


def sharded_stencil(fn, mesh: Mesh, halo: int, num_outputs: int = 1):
    """Wrap an (H, W, ...)-wise stencil function for row-sharded inputs.

    ``fn`` takes and returns full-height arrays; the wrapper runs it per
    shard on halo-extended blocks and crops. All array arguments must be
    row-shardable (same leading H).
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
        return jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs
        )(*arrays)

    return wrapped
