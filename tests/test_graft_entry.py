"""Driver-hook regression tests.

Round-1 failure mode: the driver ran ``dryrun_multichip(8)`` with no env
pre-setup and got ``AssertionError: need 8 devices, have 1``
(MULTICHIP_r01.json: ok=false, rc=1). The dry run must self-configure the
virtual CPU mesh (XLA_FLAGS device-count flag + jax_platforms=cpu) before
the JAX backend initializes — or re-exec itself in a subprocess when JAX
is already initialized on another platform.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    return {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }


def test_dryrun_multichip_self_configures():
    """Exactly the driver's call pattern: fresh process, no env preset."""
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(8); "
        "print('SELF_CONFIG_OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=_clean_env(), cwd=REPO,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "SELF_CONFIG_OK" in proc.stdout


def test_dryrun_multichip_subprocess_fallback():
    """When JAX is already initialized with too few devices, the dry run
    must re-exec in a correctly configured subprocess instead of failing."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1; "
        "import __graft_entry__ as g; g.dryrun_multichip(8); "
        "print('FALLBACK_OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=_clean_env(), cwd=REPO,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "FALLBACK_OK" in proc.stdout
