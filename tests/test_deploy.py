"""Serving-artifact export: StableHLO + weights, loadable without model code.

The TPU-native analog of the reference's TorchScript ``best_model.pth``
deployable (pytorch/train_pytorch.py:177-181) — see deploy.py.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.deploy import (
    export_predictor,
    load_exported,
)
from pose_estimation_amitai_tpu.infer import Predictor
from pose_estimation_amitai_tpu.models import build_model

pytestmark = pytest.mark.quick

HW, IN_CH, OUT_CH, CHUNK = 48, 4, 6, 8


@pytest.fixture(scope="module")
def cfg_params():
    cfg = Config(num_base_filters=8, dropout_ratio=0.0)
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, IN_CH), jnp.float32), train=False,
    )["params"]
    return cfg, params


def test_export_round_trip_matches_predictor(tmp_path, cfg_params):
    cfg, params = cfg_params
    predictor = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH,
                          chunk_size=CHUNK, decode="refined")
    path = os.path.join(str(tmp_path), "model.pexp")
    header = export_predictor(predictor, path)
    assert header["chunk_size"] == CHUNK
    assert header["image_shape"] == [HW, HW, IN_CH]

    loaded = load_exported(path)
    rng = np.random.default_rng(0)
    frames = rng.random((2 * CHUNK + 3, HW, HW, IN_CH)).astype(np.float32)
    got = loaded(frames)  # exercises the padded tail chunk
    want = predictor(frames)
    assert got.shape == want.shape == (2 * CHUNK + 3, 3, OUT_CH)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_quantized_program(tmp_path, cfg_params):
    cfg, params = cfg_params
    rng = np.random.default_rng(1)
    calib = rng.random((16, HW, HW, IN_CH)).astype(np.float32)
    predictor = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH,
                          chunk_size=CHUNK, use_quantized=True,
                          calibration_frames=calib)
    path = os.path.join(str(tmp_path), "model_int8.pexp")
    export_predictor(predictor, path)
    loaded = load_exported(path)
    frames = rng.random((CHUNK, HW, HW, IN_CH)).astype(np.float32)
    np.testing.assert_allclose(
        loaded(frames), predictor(frames), rtol=1e-4, atol=1e-4
    )


def test_bad_magic_rejected(tmp_path):
    path = os.path.join(str(tmp_path), "junk.pexp")
    with open(path, "wb") as f:
        f.write(b"NOTANEXPORT")
    with pytest.raises(ValueError, match="not an exported-predictor"):
        load_exported(path)


def test_cli_export_end_to_end(tmp_path, cfg_params):
    from pose_estimation_amitai_tpu import cli
    from pose_estimation_amitai_tpu.train import checkpoint as ckpt

    cfg, params = cfg_params
    ckpt_path = os.path.join(str(tmp_path), "weights.msgpack")
    ckpt.save_params(ckpt_path, params)
    cfg_path = os.path.join(str(tmp_path), "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump({"number of base filters": 8, "dropout ratio": 0.0}, f)
    out_path = os.path.join(str(tmp_path), "m.pexp")
    rc = cli.main([
        "export", cfg_path, ckpt_path, out_path,
        "--chunk-size", str(CHUNK), "--image-shape", str(HW), str(HW),
        str(IN_CH), "--out-channels", str(OUT_CH),
    ])
    assert rc == 0 and os.path.exists(out_path)
    loaded = load_exported(out_path)
    frames = np.zeros((3, HW, HW, IN_CH), np.float32)
    assert loaded(frames).shape == (3, 3, OUT_CH)


def test_export_camera_matrix_family_rejected(tmp_path):
    """FTL camera-matrix models need (x, P, P_inv) — export refuses with a
    clear error instead of an opaque trace failure."""
    import pose_estimation_amitai_tpu.constants as C

    cfg = Config(model_type=C.ALL_CAMS_DISENTANGLED_PER_WING_CNN,
                 num_base_filters=8, dropout_ratio=0.0)
    model = build_model(cfg, (HW, HW, 16), OUT_CH * 4)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, 16), jnp.float32),
        jnp.zeros((1, 4, 3, 4), jnp.float32),
        jnp.zeros((1, 4, 4, 3), jnp.float32),
        train=False,
    )["params"]
    cams = (np.zeros((4, 4, 3, 4), np.float32),
            np.zeros((4, 4, 4, 3), np.float32))
    pred = Predictor(cfg, params, (HW, HW, 16), OUT_CH * 4,
                     chunk_size=CHUNK, cameras=cams)
    with pytest.raises(ValueError, match="camera matrices"):
        export_predictor(pred, os.path.join(tmp_path, "m.pexp"))
