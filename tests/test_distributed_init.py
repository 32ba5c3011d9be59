"""Multi-host init ordering: jax.distributed.initialize must be invoked
before the Trainer creates any jax array (round-1 verdict weak #2 / advisor
medium). jax.distributed.initialize() raises if called after the backend is
live, so build_dataset (which places device arrays) has to come second."""

import numpy as np
import pytest

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
from pose_estimation_amitai_tpu.parallel import mesh as mesh_mod
from pose_estimation_amitai_tpu.train import trainer as trainer_mod


def _cfg(tmp_path, **kw):
    base = dict(
        epochs=1, batch_size=4, batches_per_epoch=1, num_base_filters=8,
        base_output_path=str(tmp_path), val_fraction=0.5, seed=0,
    )
    base.update(kw)
    return Config(**base)


def test_distributed_init_before_dataset_arrays(tmp_path, monkeypatch):
    events = []
    monkeypatch.setattr(
        "jax.distributed.initialize", lambda *a, **k: events.append("dist")
    )
    real_build = trainer_mod.build_dataset

    def spy_build(cfg, arrays=None):
        events.append("build_dataset")
        return real_build(cfg, arrays)

    monkeypatch.setattr(trainer_mod, "build_dataset", spy_build)

    arrays = make_synthetic_arrays(num_frames=4, num_points=6, image_size=48,
                                   seed=0)
    trainer_mod.Trainer(_cfg(tmp_path, distributed=True), arrays=arrays)
    assert events[:2] == ["dist", "build_dataset"], events


def test_distributed_requested_but_failing_raises(tmp_path, monkeypatch):
    def boom(*a, **k):
        raise RuntimeError("no coordinator")

    monkeypatch.setattr("jax.distributed.initialize", boom)
    arrays = make_synthetic_arrays(num_frames=4, num_points=6, image_size=48,
                                   seed=0)
    with pytest.raises(RuntimeError, match="Config.distributed"):
        trainer_mod.Trainer(_cfg(tmp_path, distributed=True), arrays=arrays)


def test_env_var_opportunistic_init_falls_back(monkeypatch):
    # Coordinator env var present but init fails -> no raise, returns False.
    def boom(*a, **k):
        raise RuntimeError("unreachable")

    monkeypatch.setattr("jax.distributed.initialize", boom)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1234")
    assert mesh_mod.maybe_initialize_distributed(Config()) is False
