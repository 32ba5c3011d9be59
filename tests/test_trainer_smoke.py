"""End-to-end training smoke on synthetic data: artifacts, checkpoints, resume.

The debug-mode equivalent of the reference's QA practice (SURVEY §4), plus
the resume capability the reference lacks (SURVEY §5 checkpoint row)."""

import os

import numpy as np
import pytest

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
from pose_estimation_amitai_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def arrays():
    return make_synthetic_arrays(num_frames=6, num_points=8, image_size=48,
                                 seed=0)


def _cfg(tmp_path, **kw):
    base = dict(
        epochs=2, batch_size=4, batches_per_epoch=2, accumulation_steps=1,
        num_base_filters=8, base_output_path=str(tmp_path),
        do_augmentations=True, rotation_range=10.0, xy_shifts=2.0,
        val_fraction=0.5, seed=0,
    )
    base.update(kw)
    return Config(**base)


def test_train_artifacts_and_resume(tmp_path, arrays):
    trainer = Trainer(_cfg(tmp_path), arrays=arrays)
    history = trainer.train()
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in history["train_loss"])

    rp = trainer.run_path
    for artifact in (
        "configuration.json", "losses.csv", "history.csv", "loss_graph.png",
        "checkpoint.msgpack", "checkpoint_meta.json", "best_model.msgpack",
        "initial_model.msgpack", "final_confmaps_model.msgpack",
    ):
        assert os.path.exists(os.path.join(rp, artifact)), artifact
    assert os.path.isdir(os.path.join(rp, "training code"))
    assert os.listdir(os.path.join(rp, "l2_histograms"))
    assert os.listdir(os.path.join(rp, "viz_pred"))

    # losses.csv has the reference's column contract
    with open(os.path.join(rp, "losses.csv")) as f:
        header = f.readline().strip().split(",")
    assert header == ["Epoch", "Train Loss", "Val Loss", "L2 Loss", "L2 Std",
                      "L2 Max Outlier", "Epoch Seconds"]

    # -- true resume: continue 2 more epochs from the checkpoint ----------
    cfg2 = _cfg(tmp_path, epochs=4, resume_from=rp)
    trainer2 = Trainer(cfg2, arrays=arrays)
    assert trainer2.start_epoch == 2
    step_before = int(trainer2.state.step)
    assert step_before > 0  # optimiser state restored, not re-initialised
    history2 = trainer2.train()
    assert len(history2["train_loss"]) == 2  # epochs 3 and 4 only


def test_sharded_trainer_on_mesh(tmp_path, arrays):
    """batch_size divisible by the 8-device mesh -> the DP path engages."""
    trainer = Trainer(
        _cfg(tmp_path, epochs=1, batch_size=8, batches_per_epoch=2),
        arrays=arrays,
    )
    assert trainer.mesh is not None
    history = trainer.train()
    assert np.isfinite(history["train_loss"][0])


def test_sharded_resume_repins_state_to_mesh(tmp_path, arrays):
    """Resume on the DP/TP path re-pins restored host arrays to the mesh
    placement (the PP path always re-staged; this guards the non-PP twin)."""
    from jax.sharding import NamedSharding

    trainer = Trainer(
        _cfg(tmp_path, epochs=1, batch_size=8, batches_per_epoch=2),
        arrays=arrays,
    )
    assert trainer.mesh is not None
    trainer.train()

    cfg2 = _cfg(tmp_path, epochs=2, batch_size=8, batches_per_epoch=2,
                resume_from=trainer.run_path)
    trainer2 = Trainer(cfg2, arrays=arrays)
    assert trainer2.start_epoch == 1
    import jax

    for leaf in jax.tree_util.tree_leaves(trainer2.state.params):
        assert isinstance(leaf.sharding, NamedSharding)
        assert leaf.sharding.mesh.shape == trainer2.mesh.shape
    history = trainer2.train()
    assert np.isfinite(history["train_loss"][0])


def test_save_every_epoch_weights(tmp_path, arrays):
    """Per-epoch weight snapshots (CallBacks.py:122-128 weights.{epoch}-{loss})."""
    trainer = Trainer(
        _cfg(tmp_path, epochs=2, save_every_epoch=True), arrays=arrays
    )
    trainer.train()
    weights = sorted(os.listdir(os.path.join(trainer.run_path, "weights")))
    assert len(weights) == 2
    assert weights[0].startswith("weights.001-")


def test_accumulation_steps_run(tmp_path, arrays):
    trainer = Trainer(
        _cfg(tmp_path, epochs=1, accumulation_steps=2, batches_per_epoch=2),
        arrays=arrays,
    )
    history = trainer.train()
    assert np.isfinite(history["train_loss"][0])


def test_trainer_with_host_resident_dataset(tmp_path):
    """End-to-end Trainer run on the streaming HostDataset feed
    (host_resident_data=1): trains, writes artifacts, loss finite."""
    import json

    from pose_estimation_amitai_tpu.data.pipeline import HostDataset
    from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
    from pose_estimation_amitai_tpu.train.trainer import Trainer

    arrays = make_synthetic_arrays(num_frames=6, num_points=6, image_size=48,
                                   seed=2)
    cfg = {
        "model type": "MODEL_18_POINTS_PER_WING",
        "batch_size": 4, "epochs": 2, "batches per epoch": 2,
        "val_fraction": 0.5, "learning rate": 0.001,
        "number of base filters": 8, "dropout ratio": 0.0,
        "base output path": str(tmp_path), "host_resident_data": 1,
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    tr = Trainer(str(p), arrays=arrays)
    assert type(tr.dataset) is HostDataset
    hist = tr.train()
    assert np.isfinite(hist["val_loss"]).all()
    run = tr.run_path
    assert os.path.exists(os.path.join(run, "losses.csv"))


def test_checkpoint_every_and_viz_gating(tmp_path, arrays):
    """checkpoint_every throttles the resume checkpoint; viz_every <= 0
    writes heavy PNGs on the final epoch only (CSV/MAT stay per-epoch)."""
    trainer = Trainer(
        _cfg(tmp_path, epochs=3, batches_per_epoch=1, checkpoint_every=2,
             viz_every=0),
        arrays=arrays,
    )
    import unittest.mock as mock

    from pose_estimation_amitai_tpu.train import checkpoint as ckpt

    calls = []
    real = ckpt.save_checkpoint

    def spy(run_path, state, epoch, val_loss, scheduler_state=None,
            best=False, **kw):
        calls.append((epoch, best))
        return real(run_path, state, epoch, val_loss,
                    scheduler_state=scheduler_state, best=best, **kw)

    with mock.patch.object(
        __import__("pose_estimation_amitai_tpu.train.trainer",
                   fromlist=["ckpt"]).ckpt,
        "save_checkpoint", spy,
    ):
        trainer.train()
    # resume checkpoints only after epochs 2 (epoch idx 1): (1, False);
    # epoch 3 is odd -> skipped
    resume_epochs = [e for e, best in calls if not best]
    assert resume_epochs == [1], calls
    rp = trainer.run_path
    # heavy PNGs exist only for the final epoch
    hists = os.listdir(os.path.join(rp, "l2_histograms"))
    assert hists == ["validation_epoch_3.png"], hists
    # per-epoch CSV rows all present
    with open(os.path.join(rp, "losses.csv")) as f:
        assert len(f.readlines()) == 4  # header + 3 epochs


def test_best_min_rel_delta_gates_best_writes(tmp_path, arrays, monkeypatch):
    """best_min_rel_delta=0.99 writes best_model once (the first finite
    improvement); the in-memory best marker still tracks every epoch."""
    import unittest.mock as mock

    from pose_estimation_amitai_tpu.train import checkpoint as ckpt

    trainer = Trainer(
        _cfg(tmp_path, epochs=3, batches_per_epoch=1,
             best_min_rel_delta=0.99),
        arrays=arrays,
    )
    calls = []
    real = ckpt.save_checkpoint

    def spy(run_path, state, epoch, val_loss, scheduler_state=None,
            best=False, **kw):
        calls.append((epoch, best))
        return real(run_path, state, epoch, val_loss,
                    scheduler_state=scheduler_state, best=best, **kw)

    with mock.patch.object(
        __import__("pose_estimation_amitai_tpu.train.trainer",
                   fromlist=["ckpt"]).ckpt,
        "save_checkpoint", spy,
    ):
        history = trainer.train()
    best_writes = [e for e, best in calls if best]
    # inf -> first val loss always crosses a 99% threshold; later epochs
    # cannot improve 99% on a finite loss
    assert best_writes == [0], calls
    assert trainer.best_loss == min(history["val_loss"])


@pytest.mark.quick
def test_graft_tree_validation():
    """advisor r4: pretrained/coarse grafts must name missing/extra keys
    (equal-leaf-count trees with different key sets used to misalign the
    zip) and every shape mismatch, before any cast happens."""
    import jax.numpy as jnp

    from pose_estimation_amitai_tpu.train.trainer import _graft_tree

    tgt = {"a": jnp.zeros((2, 3)), "b": {"w": jnp.zeros((4,))}}

    # happy path casts into the template dtype
    out = _graft_tree(
        tgt, {"a": np.ones((2, 3), np.float64), "b": {"w": np.ones(4)}},
        "coarse model",
    )
    assert out["a"].dtype == tgt["a"].dtype
    np.testing.assert_array_equal(np.asarray(out["b"]["w"]), np.ones(4))

    # same leaf count, different key set: names the keys, no bogus shapes
    with pytest.raises(ValueError, match=r"missing .*'b'.*'w'"):
        _graft_tree(
            tgt, {"a": np.ones((2, 3)), "c": {"w": np.ones(4)}},
            "pretrained encoder",
        )

    # shape mismatch: named per-leaf before any cast
    with pytest.raises(ValueError, match=r"\(2, 3\) vs \(3, 2\)"):
        _graft_tree(
            tgt, {"a": np.ones((3, 2)), "b": {"w": np.ones(4)}},
            "coarse model",
        )
