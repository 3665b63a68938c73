"""Test configuration: force an 8-device virtual CPU mesh.

Sharding tests exercise multi-chip layouts without TPU hardware, per the
framework's parallel design (realism_effects_tpu.parallel).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (after XLA_FLAGS)

# The env var JAX_PLATFORMS is ignored when the axon TPU plugin is
# installed; the config update reliably forces the CPU backend.
jax.config.update("jax_platforms", "cpu")
