"""Fused Pallas encoder stages vs the flax reference (interpret mode on CPU).

The kernel must reproduce ``EncoderAtrous``'s torch flavour exactly
(pytorch/CNNs.py:73-88 semantics): SAME dilated convs, residual skips,
maxpool + LeakyReLU, border-zero padding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_estimation_amitai_tpu.models.cnn import BasicNet
from pose_estimation_amitai_tpu.models.fast_infer import (
    basicnet_apply_fused,
    encoder_stage_params,
)
from pose_estimation_amitai_tpu.ops.pallas_conv import encoder_forward_fused


@pytest.mark.parametrize("filters", [8, 48])  # 48 -> 192-ch stage3 (2 chunks)
def test_fused_basicnet_matches_flax(filters):
    model = BasicNet(out_channels=6, filters=filters, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 48, 48, 4)), jnp.float32
    )
    params = model.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]
    ref = np.asarray(model.apply({"params": params}, x, train=False))
    fused = np.asarray(basicnet_apply_fused(model, params, x, interpret=True))
    np.testing.assert_allclose(fused, ref, atol=1e-5)


def test_fused_encoder_batch_chunking():
    """Batch 6 -> chunk 2 via lax.map must equal direct per-chunk calls."""
    model = BasicNet(out_channels=6, filters=8, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(1).random((6, 48, 48, 4)), jnp.float32
    )
    params = model.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]
    full = np.asarray(basicnet_apply_fused(model, params, x, interpret=True))
    per2 = np.concatenate(
        [
            np.asarray(
                basicnet_apply_fused(
                    model, params, x[i : i + 2], interpret=True
                )
            )
            for i in range(0, 6, 2)
        ]
    )
    np.testing.assert_allclose(full, per2, atol=1e-5)


def test_fused_encoder_direct():
    """encoder_forward_fused output matches the flax encoder submodule."""
    from pose_estimation_amitai_tpu.models.layers import EncoderAtrous

    model = BasicNet(out_channels=6, filters=8, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(2).random((2, 48, 48, 4)), jnp.float32
    )
    params = model.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]
    enc = EncoderAtrous(filters=8, dtype=jnp.float32)
    ref = np.asarray(
        enc.apply({"params": params["encoder"]}, x, train=False)
    )
    got = np.asarray(
        encoder_forward_fused(x, encoder_stage_params(params), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)
