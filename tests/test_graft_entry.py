"""Driver-contract tests for __graft_entry__ (the multi-chip gate).

Round-1 verdict: the gate was red because ``dryrun_multichip`` asserted on
device count instead of bootstrapping a virtual CPU mesh. These tests pin
both paths: in-process when enough devices exist (the conftest's 8-device
CPU mesh), and the subprocess re-exec bootstrap when they don't.
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_dryrun_multichip_in_process():
    # conftest provides >= 8 CPU devices -> the direct path must run the
    # full sharded DP step and the (4, 2) dp x tp step without re-exec.
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_when_devices_missing():
    # A fresh process with a single CPU device must re-exec itself onto a
    # virtual 4-device mesh and succeed (this is exactly the driver's
    # 1-real-chip situation).
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env.pop("_GRAFT_DRYRUN_NO_REEXEC", None)
    code = (
        "import jax; assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(4)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(4)" in proc.stdout
