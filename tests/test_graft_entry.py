"""The driver's entry points must stay importable and runnable under the
driver's environment (virtual CPU devices)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("n_devices", [8])
def test_entry_and_dryrun_under_driver_env(n_devices):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
        capture_output=True,
        text=True,
        timeout=480,
        env={
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_devices}",
        },
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "entry ok" in proc.stdout
    assert f"dryrun_multichip({n_devices}) ok" in proc.stdout
