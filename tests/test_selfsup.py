"""Self-supervised inpainting pretraining (reference:
pytorch/self supervision/train_self_supervision.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.train.selfsup import (
    SelfSupTrainer,
    create_holes,
    select_wing_channel,
)

HW = 48


def _crops(n=12, hw=HW, seed=0):
    """(N, hw, hw, 5) synthetic crops: 3 blobby time channels + 2 masks."""
    rng = np.random.default_rng(seed)
    crops = np.zeros((n, hw, hw, 5), np.float32)
    ys, xs = np.mgrid[0:hw, 0:hw]
    for i in range(n):
        cy, cx = rng.integers(16, hw - 16, 2)
        blob = np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * 8.0**2))
        crops[i, ..., :3] = blob[..., None]
        crops[i, ..., 3] = ((np.abs(ys - cy) < 10) & (xs < cx)).astype(np.float32)
        crops[i, ..., 4] = ((np.abs(ys - cy) < 10) & (xs >= cx)).astype(np.float32)
    return crops


def test_select_wing_channel_shapes_and_content():
    crops = jnp.asarray(_crops(8))
    out = select_wing_channel(jax.random.key(0), crops)
    assert out.shape == (8, HW, HW, 4)
    np.testing.assert_allclose(out[..., :3], crops[..., :3])
    # each sample's mask channel equals one of the two input masks
    for i in range(8):
        m = np.asarray(out[i, ..., 3])
        a = np.asarray(crops[i, ..., 3])
        b = np.asarray(crops[i, ..., 4])
        assert np.array_equal(m, a) or np.array_equal(m, b)


def test_create_holes_zeroes_pixels_only():
    crops = _crops(6)
    imgs = jnp.asarray(
        np.concatenate([crops[..., :3], crops[..., 3:4]], axis=-1)
    )
    holed = np.asarray(create_holes(jax.random.key(1), imgs))
    orig = np.asarray(imgs)
    # holed is orig with some pixels zeroed — never altered otherwise
    changed = holed != orig
    assert np.all(holed[changed] == 0.0)
    # at least one hole actually landed on nonzero content per sample
    for i in range(6):
        assert changed[i].any(), "no hole punched"
    # all channels zeroed together at hole pixels
    hole_px = changed.any(axis=-1)
    assert np.all(holed[hole_px] == 0.0)


def test_pretrain_then_finetune_loads_encoder(tmp_path):
    """Self-supervised weights re-head a supervised model via
    pretrained_encoder_path (PretrainedLEAP parity, NNs.py:38-62)."""
    import numpy as np

    from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
    from pose_estimation_amitai_tpu.train.trainer import Trainer

    cfg = Config(
        epochs=1, batch_size=4, batches_per_epoch=1, num_base_filters=8,
        base_output_path=str(tmp_path), do_augmentations=False, seed=0,
    )
    pre = SelfSupTrainer(cfg, _crops(8))
    pre.train()
    ckpt = pre.run_path  # directory containing best_model.msgpack

    arrays = make_synthetic_arrays(num_frames=4, num_points=8, image_size=48)
    ft_cfg = cfg.replace(
        pretrained_encoder_path=ckpt, epochs=1, batches_per_epoch=1,
        val_fraction=0.5,
    )
    trainer = Trainer(ft_cfg, arrays=arrays)
    # the fine-tuned model's encoder == the pretrained encoder weights
    pre_enc = pre.state.params["encoder"]
    ft_enc = trainer.state.params["encoder"]
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(ft_enc)[0]),
        np.asarray(jax.tree_util.tree_leaves(pre_enc)[0]),
    )
    history = trainer.train()
    assert np.isfinite(history["train_loss"][0])


def test_pretrain_smoke_and_checkpoint(tmp_path):
    cfg = Config(
        epochs=2, batch_size=4, batches_per_epoch=2, num_base_filters=8,
        base_output_path=str(tmp_path), do_augmentations=True,
        rotation_range=10.0, xy_shifts=2.0, seed=0,
    )
    trainer = SelfSupTrainer(cfg, _crops(10))
    history = trainer.train()
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in history["train_loss"])
    run = trainer.run_path
    import os

    assert os.path.exists(os.path.join(run, "checkpoint.msgpack"))
    assert os.path.exists(os.path.join(run, "configuration.json"))


def test_main_h5_path_normalizes_uint8(tmp_path, monkeypatch):
    """The CLI's H5 source must land in the supervised input scale ([0, 1]);
    raw uint8 boxes would pretrain an encoder on a 255x-off scale."""
    import json

    import h5py

    from pose_estimation_amitai_tpu.train import selfsup

    h5 = str(tmp_path / "crops.h5")
    with h5py.File(h5, "w") as f:
        f["box"] = (np.random.default_rng(0)
                    .integers(0, 256, (3, 2, 16, 16, 5)).astype(np.uint8))
    cfg_path = str(tmp_path / "cfg.json")
    json.dump({"epochs": 1, "batch_size": 2,
               "base output path": str(tmp_path)}, open(cfg_path, "w"))

    seen = {}

    class FakeTrainer:
        def __init__(self, cfg, crops):
            seen["crops"] = crops

        def train(self):
            return {}

    monkeypatch.setattr(selfsup, "SelfSupTrainer", FakeTrainer)
    selfsup.main([cfg_path, h5])
    crops = seen["crops"]
    assert crops.shape == (6, 16, 16, 5)  # cameras flattened
    assert crops.dtype == np.float32 and crops.max() <= 1.0
