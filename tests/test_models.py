"""Shape-contract tests for every model type in the registry.

The reference's only model QA is ``__main__`` smoke blocks pushing random
tensors through each net (SURVEY §4); this is the systematic equivalent: for
each dispatchable model-type string, build via the registry and check the
(B, H, W, C_out) heatmap contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.models import build_model, needs_camera_matrices

pytestmark = pytest.mark.quick  # gate-style subset: python -m pytest -m quick

HW = 48
SMALL = dict(num_base_filters=8, projection_dim=32, transformer_layers=1,
             num_heads=2, patch_size=16, fully_connected_expand=2)

# (model_type, in_channels, out_channels)
CASES = [
    (C.MODEL_18_POINTS_PER_WING, 4, 9),
    (C.TWO_WINGS_TOGATHER, 5, 8),
    (C.ALL_CAMS_18_POINTS, 16, 12),
    (C.HEAD_TAIL_ALL_CAMS, 16, 8),
    (C.ALL_CAMS_AND_3_GOOD_CAMS, 12, 9),
    (C.COARSE_PER_WING, 4, 7),
    (C.C2F_PER_WING, 4, 9),
    (C.MODEL_18_POINTS_PER_WING_VIT, 4, 9),
    (C.ALL_CAMS_18_POINTS_VIT, 16, 12),
    (C.ALL_CAMS_DISENTANGLED_PER_WING_CNN, 16, 12),
]


def _build_and_run(model_type, in_ch, out_ch, flavor="torch", hw=HW):
    cfg = Config(model_type=model_type, arch_flavor=flavor, **SMALL)
    model = build_model(cfg, (hw, hw, in_ch), out_ch)
    x = jnp.zeros((2, hw, hw, in_ch), jnp.float32)
    args = (x,)
    if needs_camera_matrices(model_type):
        P = jnp.tile(jnp.eye(3, 4), (2, 4, 1, 1))
        P_inv = jnp.transpose(P, (0, 1, 3, 2))
        args = (x, P, P_inv)
    variables = model.init({"params": jax.random.key(0)}, *args, train=False)
    out = model.apply(variables, *args, train=False)
    return out


@pytest.mark.parametrize("model_type,in_ch,out_ch", CASES)
def test_model_output_contract(model_type, in_ch, out_ch):
    out = _build_and_run(model_type, in_ch, out_ch)
    assert out.shape == (2, HW, HW, out_ch)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_unknown_model_type_falls_back_to_basic():
    # tensorflow/Network.py:59-60 else-branch behaviour
    out = _build_and_run("SOME_FUTURE_MODEL", 4, 5)
    assert out.shape == (2, HW, HW, 5)


def test_tf_flavor_basic():
    out = _build_and_run(C.MODEL_18_POINTS_PER_WING, 4, 9, flavor="tf")
    assert out.shape == (2, HW, HW, 9)


def test_resnet_contract():
    # ResNet50 needs /32-divisible inputs; use 64px
    out = _build_and_run(C.RESNET_18_POINTS_PER_WING, 4, 9, hw=64)
    assert out.shape == (2, 64, 64, 9)
