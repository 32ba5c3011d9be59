"""Config ingestion: the reference JSON dialect must load unmodified.

Covers the dialect quirks catalogued in SURVEY §5 (config row): pseudo-comment
keys ``"// ... //"``, 0/1 integer booleans, key-name drift between the TF and
PyTorch stacks (``patch size`` vs ``patch_size``), reference:
tensorflow/train_config.json, pytorch/train_config.json.
"""

import pytest
import json

from pose_estimation_amitai_tpu.config import Config

pytestmark = pytest.mark.quick  # gate-style subset: python -m pytest -m quick

REFERENCE_DIALECT = {
    "// training //": 0,
    "debug mode": 1,
    "batch_size": 16,
    "epochs": 300,
    "batches per epoch": 30,
    "do curriculum learning": 0,
    "loss_function": "mean_squared_error",
    "val_fraction": 0.5,
    "learning rate": 0.0005,
    "accumulation_steps": 4,
    "// network //": 0,
    "dropout ratio": 0.3,
    "dilation rate": 2,
    "optimizer": "adam",
    "number of base filters": 32,
    "number of encoder decoder blocks": 3,
    "convolution kernel size": 5,
    "patch size": 8,
    "projection dim": 128,
    "num heads": 4,
    "dim head": 0,
    "transformer layers": 6,
    "model type": "MODEL_18_POINTS_PER_WING",
    "data_path": "trainset.h5",
    "mask dilation": 2,
    "do augmentations": 1,
    "horizontal flip": 0,
    "rotation range": 15,
    "zoom range": [0.9, 1.1],
    "base output path": "out",
}


def test_reference_dialect_roundtrip(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(REFERENCE_DIALECT))
    cfg = Config.from_json(str(p))
    assert cfg.debug_mode is True
    assert cfg.batch_size == 16
    assert cfg.batches_per_epoch == 30
    assert cfg.learning_rate == 0.0005
    assert cfg.accumulation_steps == 4
    assert cfg.num_base_filters == 32
    assert cfg.num_blocks == 3
    assert cfg.kernel_size == 5
    assert cfg.patch_size == 8
    assert cfg.projection_dim == 128
    assert cfg.dim_head == 0
    assert cfg.horizontal_flip is False
    assert cfg.do_augmentations is True
    assert cfg.zoom_range == (0.9, 1.1)
    assert cfg.model_type == "MODEL_18_POINTS_PER_WING"
    # comment keys are dropped, raw snapshot keeps the originals
    assert "// training //" not in cfg.to_dict()
    assert cfg.raw["batch_size"] == 16


def test_defaults_and_replace():
    cfg = Config()
    assert cfg.sigma == 3.0
    assert cfg.compute_dtype == "bfloat16"
    cfg2 = cfg.replace(epochs=7)
    assert cfg2.epochs == 7
    assert cfg.epochs == 50  # frozen original untouched


def test_shipped_config_files_load():
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = Config.from_json(os.path.join(root, "train_config.json"))
    assert cfg.model_type == "MODEL_18_POINTS_PER_WING"
    assert cfg.num_base_filters == 64
    assert cfg.rotation_range == 180.0
    cfg2 = Config.from_json(os.path.join(root, "selfsup_config.json"))
    assert cfg2.batch_size == 10


def test_underscore_spellings():
    cfg = Config.from_dict({"batch size": 3, "patch_size": 4, "learning_rate": 0.1})
    assert cfg.batch_size == 3
    assert cfg.patch_size == 4
    assert cfg.learning_rate == 0.1
