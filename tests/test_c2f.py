"""Coarse-to-fine stacking: train coarse, freeze into C2F, fine-tune.

Reference: tensorflow/Network.py:147-198 — a pre-trained coarse model is
loaded and frozen; its heatmaps concatenate onto the fine stage's input."""

import numpy as np

import jax

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
from pose_estimation_amitai_tpu.train.trainer import Trainer


def test_c2f_loads_frozen_coarse(tmp_path):
    arrays = make_synthetic_arrays(num_frames=4, num_points=8, image_size=48)
    base = dict(
        epochs=1, batch_size=4, batches_per_epoch=1, num_base_filters=8,
        base_output_path=str(tmp_path), do_augmentations=False,
        val_fraction=0.5, seed=0, arch_flavor="tf",
    )
    coarse = Trainer(
        Config(model_type=C.COARSE_PER_WING, **base),
        arrays={k: v.copy() for k, v in arrays.items()},
    )
    coarse.train()

    cfg = Config(
        model_type=C.C2F_PER_WING, coarse_model_path=coarse.run_path, **base
    )
    c2f = Trainer(cfg, arrays={k: v.copy() for k, v in arrays.items()})
    # the frozen coarse submodule carries the pretrained weights
    leaf_c2f = jax.tree_util.tree_leaves(c2f.state.params["coarse"])[0]
    leaf_coarse = jax.tree_util.tree_leaves(coarse.state.params)[0]
    np.testing.assert_allclose(np.asarray(leaf_c2f), np.asarray(leaf_coarse))
    history = c2f.train()
    assert np.isfinite(history["train_loss"][0])
    # stop_gradient keeps the coarse stage frozen through training
    after_leaf = jax.tree_util.tree_leaves(c2f.state.params["coarse"])[0]
    np.testing.assert_allclose(
        np.asarray(after_leaf), np.asarray(leaf_coarse)
    )
