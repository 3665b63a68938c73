"""Multi-chip spatial sharding of the frame pipeline.

The reference has no distributed runtime (SURVEY.md §2.5) — its
parallelism is per-fragment SIMT. The TPU-native scaling story is
**spatial sharding of the framebuffer over ICI**: shard image rows across
a 1D device mesh, replicate scene/camera data, and let GSPMD insert the
halo exchanges/collectives that the stencil (neighborhood clamp, Poisson
taps) and gather (reprojection) patterns require.

Usage:
    mesh = make_mesh()                        # all local devices
    fn = shard_frame_fn(frame_fn, mesh)       # pjit with row sharding
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "rows"


def make_mesh(devices=None) -> Mesh:
    """1D mesh over the row axis (ICI ring on real hardware)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (ROW_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (H, W[, C]) arrays along H."""
    return NamedSharding(mesh, P(ROW_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for(x, mesh: Mesh):
    """Row-shard image-like arrays (first dim divisible by mesh size and
    >= 2D); replicate everything else (matrices, scalars, tables)."""
    n = mesh.devices.size
    if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] % n == 0 and x.shape[0] >= n:
        return row_sharding(mesh)
    return replicated(mesh)


def shard_pytree(tree, mesh: Mesh):
    """Place a pytree: images row-sharded, the rest replicated."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, _spec_for(x, mesh)), tree
    )


def shard_frame_fn(frame_fn, mesh: Mesh, donate_argnums=()):
    """jit ``frame_fn`` with row-sharded image outputs over ``mesh``.

    Every image-like output leaf (>= 2D, leading dim divisible by the
    mesh size) is constrained to :func:`row_sharding`; other leaves are
    constrained to replicated. Inputs keep whatever sharding the caller
    placed (use :func:`shard_pytree`); GSPMD propagates shardings through
    the body and inserts the collectives (all-gathers for cross-row
    gathers, halo exchange for stencils) automatically.
    """

    def constrained(*args, **kwargs):
        from .context import mesh_context

        # install the mesh for the duration of tracing so mesh-aware
        # kernels (Pallas window warps, sweep tracers) pick their
        # sharding-clean formulations (see parallel.context)
        with mesh_context(mesh):
            out = frame_fn(*args, **kwargs)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, _spec_for(x, mesh)
            ) if hasattr(x, "ndim") else x,
            out,
        )

    return jax.jit(constrained, donate_argnums=donate_argnums)


def constrain_rows(x, mesh: Mesh):
    """Force an intermediate to row sharding inside a jitted fn."""
    return jax.lax.with_sharding_constraint(x, row_sharding(mesh))
