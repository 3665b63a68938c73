"""History-snapshot helpers (CopyPass analog).

The reference's ``CopyPass`` (`/root/reference/src/ssgi/pass/CopyPass.js`)
and ``copyFramebufferToTexture`` calls exist to double-buffer history
textures in WebGL. In JAX the state pytree is double-buffered by
return-and-donate, so a "copy pass" is just identity bookkeeping; these
helpers exist for API parity and for snapshotting device buffers to host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def copy_textures(textures):
    """MRT copy (`CopyPass.js:16-57`): returns independent device copies."""
    return [jnp.array(t, copy=True) for t in textures]


def snapshot_to_host(tree):
    """Device pytree -> host numpy (readRenderTargetPixels analog)."""
    return jax.tree_util.tree_map(np.asarray, tree)
