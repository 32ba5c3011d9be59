"""Camera-geometry (FTL) disentangled model: data path + training smoke.

Reference: pytorch/CNNs.py:240-352 (FourCamerasDisentanglement) fed by
CameraMatrixGenerator (pytorch/Datagenerators.py:242-270)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.pipeline import build_dataset
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
from pose_estimation_amitai_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def arrays():
    return make_synthetic_arrays(num_frames=4, num_points=8, image_size=48)


def test_disentangled_dataset_carries_cameras(arrays):
    cfg = Config(model_type=C.ALL_CAMS_DISENTANGLED_PER_WING_CNN,
                 batch_size=2)
    ds, pre = build_dataset(cfg, {k: v.copy() for k, v in arrays.items()})
    assert "P" in ds.data and "P_inv" in ds.data
    box = np.asarray(ds.data["box"])
    P = np.asarray(ds.data["P"])
    # two wing-samples per frame, 4 cams on channels ([t0 t1 t2 mask] each)
    assert box.shape == (2 * 4, 48, 48, 16)
    assert P.shape == (2 * 4, 4, 3, 4)
    assert np.asarray(ds.data["P_inv"]).shape == (2 * 4, 4, 4, 3)
    # P_inv is the Frobenius-normalised pseudo-inverse (reference parity,
    # pytorch/Datagenerators.py:396-401): P @ P_inv must be ~ s * I3
    P_inv = np.asarray(ds.data["P_inv"])
    for s in (0, 5):
        for c in range(4):
            M = P[s, c] @ P_inv[s, c]
            scale = np.trace(M) / 3.0
            np.testing.assert_allclose(
                M / scale, np.eye(3), atol=5e-3
            )


def test_disentangled_training_smoke(tmp_path, arrays):
    cfg = Config(
        model_type=C.ALL_CAMS_DISENTANGLED_PER_WING_CNN,
        epochs=1, batch_size=4, batches_per_epoch=1, num_base_filters=8,
        base_output_path=str(tmp_path), do_augmentations=False,
        val_fraction=0.5, seed=0,
    )
    trainer = Trainer(cfg, arrays={k: v.copy() for k, v in arrays.items()})
    history = trainer.train()
    assert np.isfinite(history["train_loss"][0])
    assert np.isfinite(history["val_loss"][0])
