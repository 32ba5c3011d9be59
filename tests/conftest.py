"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initialises (SURVEY §4: multi-chip tests on
a single host via ``xla_force_host_platform_device_count``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# The environment's sitecustomize may have imported jax (and captured
# JAX_PLATFORMS=axon) before this conftest ran — force CPU through the live
# config, not just the env var.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite recompiles many small jitted fns;
# caching cuts repeat runs from minutes to seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) >= 8, "virtual 8-device mesh missing (XLA_FLAGS)"


def pytest_report_header(config):
    """Make the quick-gate default loud (advisor r3: targeted single-file
    runs silently deselect non-quick tests via pytest.ini addopts)."""
    if getattr(config.option, "markexpr", "") == "quick":
        lines = [
            "NOTE: pytest.ini addopts selects ONLY -m quick (the CI gate "
            "subset). Non-quick tests in this run are DESELECTED — use "
            'jobs/test_full.sh or `pytest -m ""` for the full suite.'
        ]
        # freshness stamp: when did the OFFLINE half last run green?
        # (jobs/test_full.sh writes it; the r4 full run caught 2 stale
        # tests the quick gate missed, so staleness is a real signal)
        import datetime
        import json

        stamp_path = os.path.join(
            os.path.dirname(__file__), ".full_suite_stamp.json"
        )
        try:
            with open(stamp_path) as f:
                stamp = json.load(f)
            age = (
                datetime.date.today()
                - datetime.date.fromisoformat(stamp["date"])
            ).days
            msg = (
                f"full suite last green: {stamp['date']} "
                f"({stamp['passed']} passed @ {stamp['commit']})"
            )
            if age > 1:
                msg += (
                    f" — {age} days STALE; run jobs/test_full.sh"
                )
            lines.append(msg)
        except Exception:
            lines.append(
                "full suite has NO freshness stamp — run "
                "jobs/test_full.sh for the offline half"
            )
        return lines
    return []


@pytest.fixture
def rng():
    return np.random.default_rng(0)
