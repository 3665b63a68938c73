"""Trace-time mesh context: lets kernels pick sharding-aware layouts.

The composer's multi-chip path (`composer._build_frame_fn(mesh=...)` →
:func:`parallel.sharding.shard_frame_fn`) jits ONE frame function and
lets GSPMD propagate row shardings through it. That works for fused
elementwise/stencil code, but two kernel families need to know a mesh
is active *while tracing*:

* the Pallas bounded-window kernels (`ops/pallas/warp.py`): their
  CPU/interpret lowering inlines thousands of small index ops that
  GSPMD would partition one by one (all-gathering the slab inputs —
  the round-4 dryrun compile blowup). Under a mesh they instead wrap
  themselves in ``jax.shard_map`` with an explicit ppermute halo
  exchange, so each device runs the ordinary single-chip kernel on its
  halo-extended block and the only collectives are the halo hops.
* the sweep tracers (`ops/ssgi_sweep.py`, `ops/motion_blur.py`): their
  per-step dynamic rolls over the full frame must read a *replicated*
  source plane (one all-gather total) instead of letting GSPMD re-shard
  every roll into permute chains.

``shard_frame_fn`` installs the mesh here for the duration of tracing;
kernels consult :func:`current_mesh` / :func:`row_mesh_for`.
"""

from __future__ import annotations

import contextlib
import contextvars

_ACTIVE_MESH = contextvars.ContextVar("re_tpu_active_mesh", default=None)


def current_mesh():
    """The mesh installed by the enclosing ``shard_frame_fn`` trace, or
    None on the single-chip path."""
    return _ACTIVE_MESH.get()


def row_mesh_for(height: int):
    """The active mesh if ``height`` rows divide evenly over it (the
    precondition for row-sharding / shard_map halo wrapping), else None."""
    mesh = _ACTIVE_MESH.get()
    if mesh is None:
        return None
    n = mesh.devices.size
    if height % n != 0 or height < n:
        return None
    return mesh


@contextlib.contextmanager
def mesh_context(mesh):
    token = _ACTIVE_MESH.set(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH.reset(token)


def replicate_for_rolls(*arrays):
    """Constrain roll-source planes to replicated under the active mesh.

    The sweep tracers roll a whole-frame plane by a *traced* shift every
    step; on a row-sharded operand GSPMD lowers each such roll to a
    collective-permute chain (hundreds of collectives, minutes of
    XLA:CPU compile). Replicating the source costs ONE all-gather per
    plane — the documented replicated-read design for gather-unbounded
    stages (SURVEY §2.5) — and makes every roll local. No-op without an
    active mesh. Returns the array (or tuple, matching the arity).
    """
    mesh = _ACTIVE_MESH.get()
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    out = tuple(
        None if a is None else jax.lax.with_sharding_constraint(a, rep)
        for a in arrays
    )
    return out if len(out) > 1 else out[0]
