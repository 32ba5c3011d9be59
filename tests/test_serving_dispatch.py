"""Serving-dispatch cross-check (round-2 verdict #10).

The eighth-round preprocess sweep found mis-routed model types that every
earlier review missed; this file runs the same style of cross-check against
the SERVING dispatch: ``infer.Predictor`` x every model family x
bf16/quantized, pinning (a) which serving route each combination takes
(``Predictor.serving_path``) and (b) that the decoded output contract holds
((N, 3, K), finite, peaks inside the image).

Reference surface: the reference serves every family identically —
float ``model.predict`` + argmax (tensorflow/preprocessor.py:657-689,
SURVEY §3.5); the quantized routes are rebuild-added capability whose
routing must stay deliberate, not accidental.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.infer import Predictor
from pose_estimation_amitai_tpu.models import build_model, needs_camera_matrices

# the full matrix compiles ~20 programs (minutes of XLA) — full-suite only;
# a single quick canary below keeps the routing surface in the gate
pytestmark = pytest.mark.slow

HW = 48

# family key -> (model_type, cfg overrides, in_ch, out_ch)
FAMILIES = {
    "flagship": (C.MODEL_18_POINTS_PER_WING, {}, 4, 6),
    "flagship_tf": (C.MODEL_18_POINTS_PER_WING, {"arch_flavor": "tf"}, 4, 6),
    "head_tail": (C.HEAD_TAIL, {}, 3, 2),
    "two_wings": (C.TWO_WINGS_TOGATHER, {"arch_flavor": "tf"}, 5, 8),
    "c2f": (C.C2F_PER_WING, {"arch_flavor": "tf"}, 4, 6),
    "vit": (
        C.MODEL_18_POINTS_PER_WING_VIT,
        {"projection_dim": 24, "num_heads": 2, "transformer_layers": 1,
         "patch_size": 16},
        4, 6,
    ),
    "multicam": (C.ALL_CAMS_18_POINTS, {}, 16, 8),
    "vit4cam": (
        C.ALL_CAMS_18_POINTS_VIT,
        {"projection_dim": 24, "num_heads": 2, "transformer_layers": 1,
         "patch_size": 16},
        16, 8,
    ),
    "disentangled": (C.ALL_CAMS_DISENTANGLED_PER_WING_CNN, {}, 16, 8),
    "resnet": (C.RESNET_18_POINTS_PER_WING, {}, 4, 6),
    "gptnet": (C.GPTNET, {}, 4, 6),
}

# families whose hand-scheduled int8 path exists (flagship BasicNet, torch
# flavour, kernel 3 / dilation 2 — infer.Predictor ``is_basic``); HEAD_TAIL
# builds the same BasicNet so it rides the same path
RESIDENT_INT8 = {"flagship", "head_tail"}


def _build(key):
    model_type, overrides, in_ch, out_ch = FAMILIES[key]
    cfg = Config(model_type=model_type, num_base_filters=8, **overrides)
    model = build_model(cfg, (HW, HW, in_ch), out_ch)
    rng = np.random.default_rng(0)
    frames = rng.random((4, HW, HW, in_ch)).astype(np.float32)
    init_args = [jnp.zeros((1, HW, HW, in_ch), jnp.float32)]
    cameras = None
    if needs_camera_matrices(model_type):
        P = rng.random((4, 4, 3, 4)).astype(np.float32)
        P /= np.linalg.norm(P, axis=(-2, -1), keepdims=True)
        P_inv = np.linalg.pinv(P)
        P_inv /= np.linalg.norm(P_inv, axis=(-2, -1), keepdims=True)
        cameras = (P, P_inv)
        init_args += [jnp.zeros((1, 4, 3, 4), jnp.float32),
                      jnp.zeros((1, 4, 4, 3), jnp.float32)]
    variables = model.init({"params": jax.random.key(0)}, *init_args,
                           train=False)
    return cfg, variables, frames, cameras, out_ch


def _check_points(pts, n, out_ch):
    assert pts.shape == (n, 3, out_ch), pts.shape
    assert np.isfinite(pts).all()
    assert (pts[:, 0] >= 0).all() and (pts[:, 0] < HW).all()
    assert (pts[:, 1] >= 0).all() and (pts[:, 1] < HW).all()


@pytest.mark.parametrize("key", list(FAMILIES))
def test_bf16_serving_routes_and_contract(key):
    cfg, variables, frames, cameras, out_ch = _build(key)
    pred = Predictor(
        cfg, variables["params"], frames.shape[1:], out_ch, chunk_size=4,
        batch_stats=variables.get("batch_stats") or None, cameras=cameras,
    )
    assert pred.serving_path == "flax", (key, pred.serving_path)
    _check_points(np.asarray(pred(frames)), len(frames), out_ch)


@pytest.mark.parametrize("key", list(FAMILIES))
def test_quantized_serving_routes_and_contract(key):
    cfg, variables, frames, cameras, out_ch = _build(key)
    pred = Predictor(
        cfg, variables["params"], frames.shape[1:], out_ch, chunk_size=4,
        batch_stats=variables.get("batch_stats") or None, cameras=cameras,
        use_quantized=True, calibration_frames=frames,
    )
    expected = "int8_resident" if key in RESIDENT_INT8 else "int8_generic"
    assert pred.serving_path == expected, (key, pred.serving_path)
    _check_points(np.asarray(pred(frames)), len(frames), out_ch)


@pytest.mark.quick
def test_routing_canary_flagship():
    """Gate-sized routing canary: the flagship takes the flax route in
    bf16 and the hand-scheduled int8-resident route when quantized."""
    cfg, variables, frames, _, out_ch = _build("flagship")
    pred = Predictor(cfg, variables["params"], frames.shape[1:], out_ch,
                     chunk_size=4)
    assert pred.serving_path == "flax"
    predq = Predictor(cfg, variables["params"], frames.shape[1:], out_ch,
                      chunk_size=4, use_quantized=True,
                      calibration_frames=frames)
    assert predq.serving_path == "int8_resident"


def test_tf_flavor_flagship_never_takes_resident_path():
    """The hand-scheduled int8 path encodes the TORCH decoder semantics; a
    TF-flavour BasicNet routed there would silently serve wrong math."""
    cfg, variables, frames, cameras, out_ch = _build("flagship_tf")
    pred = Predictor(
        cfg, variables["params"], frames.shape[1:], out_ch, chunk_size=4,
        use_quantized=True, calibration_frames=frames,
    )
    assert pred.serving_path == "int8_generic"


def test_vit_conv_only_mixed_precision_route():
    cfg, variables, frames, cameras, out_ch = _build("vit")
    pred = Predictor(
        cfg, variables["params"], frames.shape[1:], out_ch, chunk_size=4,
        use_quantized=True, calibration_frames=frames,
        quantized_layers="conv_only",
    )
    assert pred.serving_path == "int8_generic"
    _check_points(np.asarray(pred(frames)), len(frames), out_ch)
