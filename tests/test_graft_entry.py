"""Driver entry-point regression: the exact invocation the judge's
driver performs must work in a fresh interpreter against the ambient
backend (a 1-device tunneled TPU in this image).

Round-1 failure mode (MULTICHIP_r01.json ok:false): dryrun_multichip
asserted on the ambient device count instead of provisioning the
virtual CPU mesh itself. These tests run the entry points in clean
subprocesses so conftest's own 8-device CPU forcing cannot mask it.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """Env as the driver sees it: no forced CPU mesh, ambient platform."""
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)  # let sitecustomize/ambient decide
    return env


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        cwd=REPO, env=_driver_env(), capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout


def test_entry_compiles_in_process():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    jax.jit(fn).lower(*args)  # compile-check only, matches the driver
