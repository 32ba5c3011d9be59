"""Fused parity-planar decoder kernel vs flax DecoderUp (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_estimation_amitai_tpu.models.cnn import BasicNet
from pose_estimation_amitai_tpu.models.fast_infer import basicnet_apply_fused
from pose_estimation_amitai_tpu.models.layers import DecoderUp
from pose_estimation_amitai_tpu.ops.pallas_deconv import fused_decoder


def _decoder_args(params):
    d = params
    return sum(
        ([d[f"deconv{i}"]["kernel"], d[f"deconv{i}"]["bias"]]
         for i in (1, 2, 3, 4)),
        [],
    )


@pytest.mark.parametrize("out_ch", [6, 18])
def test_fused_decoder_matches_flax(out_ch):
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.random((2, 12, 12, 128)), jnp.float32)
    dec = DecoderUp(out_ch, filters=8, dtype=jnp.float32)
    params = dec.init(jax.random.key(0), lat)["params"]
    ref = dec.apply({"params": params}, lat)
    got = fused_decoder(lat, *_decoder_args(params), interpret=True)
    assert got.shape == ref.shape == (2, 48, 48, out_ch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fully_fused_basicnet():
    """Encoder + decoder kernels end to end (latent 128 -> fused decoder)."""
    model = BasicNet(out_channels=6, filters=32, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(1).random((2, 48, 48, 4)), jnp.float32
    )
    params = model.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]
    ref = np.asarray(model.apply({"params": params}, x, train=False))
    got = np.asarray(basicnet_apply_fused(model, params, x, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)
