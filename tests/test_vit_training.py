"""ViT model-family training smoke (reference: pytorch/VITs.py:197-229
VIT_encoder_CNN_decoder path)."""

import numpy as np
import pytest

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
from pose_estimation_amitai_tpu.train.trainer import Trainer


def test_vit_training_smoke(tmp_path):
    arrays = make_synthetic_arrays(num_frames=4, num_points=8, image_size=48)
    cfg = Config(
        model_type=C.MODEL_18_POINTS_PER_WING_VIT,
        epochs=1, batch_size=4, batches_per_epoch=1,
        patch_size=16, projection_dim=32, transformer_layers=1, num_heads=2,
        fully_connected_expand=2, dim_head=0,
        base_output_path=str(tmp_path), do_augmentations=False,
        val_fraction=0.5, seed=0,
    )
    trainer = Trainer(cfg, arrays=arrays)
    history = trainer.train()
    assert np.isfinite(history["train_loss"][0])
    assert np.isfinite(history["val_loss"][0])
