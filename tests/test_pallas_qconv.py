"""Fused int8 encoder stages vs the XLA int8 path (interpret mode).

Same scales and skip precision -> outputs agree to a couple of int8 quanta
(bf16 rounding-order noise)."""

import numpy as np

import jax
import jax.numpy as jnp

from pose_estimation_amitai_tpu.models.cnn import BasicNet
from pose_estimation_amitai_tpu.models.quantized import (
    calibrate,
    make_quantized_forward,
    make_quantized_fused_forward,
)


def test_fused_int8_matches_xla_int8():
    model = BasicNet(out_channels=6, filters=32, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 48, 48, 4)), jnp.float32
    )
    params = model.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]
    scales = calibrate(params, np.asarray(x), batch=2)
    ref = np.asarray(make_quantized_forward(model, params, scales)(x))
    got = np.asarray(
        make_quantized_fused_forward(model, params, scales, interpret=True)(x)
    )
    # couple-of-quanta agreement: differences are bf16 rounding order only
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 0.05, np.abs(got - ref).max()
    # and well-correlated overall
    c = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert c > 0.999, c
