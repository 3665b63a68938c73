"""Effect protocol: the TPU analog of ``postprocessing.Effect``.

The reference wires Effects into an ``EffectComposer`` which calls
``update(renderer, inputBuffer)`` imperatively per frame
(`readme.md:59-82` usage contract). Here an Effect is a *pure stage* in
one jit-compiled frame function: ``apply(ctx, color, state) -> (color,
state)``. Mutable-feeling options are split like the reference splits
uniforms vs defines (`SSGIEffect.js:157-268`):

- **static options** (defines): attributes read at trace time; changing
  them re-builds the frame function (recompile),
- **uniforms**: returned from :meth:`uniforms` each frame and routed in
  through the traced params pytree (no recompile).
"""

from __future__ import annotations


class Effect:
    name: str = "effect"
    #: effect wants the camera R2-jittered each frame (TRAA)
    needs_jitter: bool = False

    def init_state(self, height: int, width: int) -> dict:
        """Initial per-effect state pytree (history buffers etc.)."""
        return {}

    def uniforms(self) -> dict:
        """Traced per-frame scalars (uniform-like options)."""
        return {}

    def static_key(self) -> tuple:
        """Hashable key of define-like options; changing it retraces."""
        return ()

    def host_update(self, composer) -> None:
        """Host-side per-frame hook (before tracing); e.g. counters."""

    def apply(self, ctx, color, state: dict):
        """Pure stage: returns (new_color (H, W, 3), new_state)."""
        raise NotImplementedError
