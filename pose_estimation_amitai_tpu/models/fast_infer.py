"""Inference fast path: Pallas-fused encoder + flax decoder.

Runs the flagship ``BasicNet`` (torch flavour) forward with the fused
encoder-stage kernels of :mod:`..ops.pallas_conv` — numerically the same
network (same flax parameter tree), restructured for VMEM residency. Used by
bench.py and the Predictor when enabled; training and non-flagship models
keep the pure-flax path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pallas_conv import encoder_forward_fused
from .cnn import BasicNet
from .layers import TORCH_ALPHA, DecoderUp


def chunked_batch_map(fn, x: jnp.ndarray, max_chunk: int = 8) -> jnp.ndarray:
    """Apply ``fn`` over batch chunks of <= ``max_chunk`` via ``lax.map``.

    Mosaic layout assignment crashes on pallas operands with sub-8-lane
    minors once the array exceeds a few MB (batch >= ~8 at 192px), so the
    pallas-backed forwards map over small batch chunks; chunks run
    back-to-back on device with no host sync. Shared by this module and
    models/quantized.py so the workaround lives in one place.
    """
    b = x.shape[0]
    chunk = next(
        c for c in (max_chunk, max_chunk // 2, 2, 1) if c >= 1 and b % c == 0
    )
    if b == chunk:
        return fn(x)
    xr = x.reshape(b // chunk, chunk, *x.shape[1:])
    out = jax.lax.map(fn, xr)
    return out.reshape(b, *out.shape[2:])


def encoder_stage_params(params: dict) -> list[dict]:
    """flax BasicNet params -> per-stage HWIO weight dicts for the kernel.

    The torch-flavour encoder names its convs conv1..conv9, three per stage
    (models/layers.py:77-85).
    """
    enc = params["encoder"]
    stages = []
    for k in range(3):
        stages.append(
            {
                "w1": enc[f"conv{3 * k + 1}"]["kernel"],
                "b1": enc[f"conv{3 * k + 1}"]["bias"],
                "w2": enc[f"conv{3 * k + 2}"]["kernel"],
                "b2": enc[f"conv{3 * k + 2}"]["bias"],
                "w3": enc[f"conv{3 * k + 3}"]["kernel"],
                "b3": enc[f"conv{3 * k + 3}"]["bias"],
            }
        )
    return stages


def basicnet_apply_fused(
    model: BasicNet, params: dict, x: jax.Array, *, interpret: bool = False,
    fuse_decoder: bool = True,
) -> jax.Array:
    """Forward ``BasicNet`` with the fused encoder (and, when the latent
    width allows, the fused decoder) kernels — inference only.

    Equivalent to ``model.apply({'params': params}, x, train=False)`` for
    torch-flavour models; asserts on unsupported flavours.
    """
    assert model.flavor == "torch", "fused path covers the torch flavour"
    dtype = model.dtype
    stages = [
        {k: v.astype(dtype) if v.ndim == 4 else v for k, v in s.items()}
        for s in encoder_stage_params(params)
    ]

    def encode(xc):
        return encoder_forward_fused(
            xc, stages,
            dilation=model.dilation, alpha=TORCH_ALPHA, interpret=interpret,
        )

    # Mosaic layout assignment crashes on pallas operands with sub-8-lane
    # minors once the array exceeds a few MB (batch >= ~8 at 192px), so the
    # encoder maps over batch chunks of <= 8 frames; chunks run
    # back-to-back on device with no host sync.
    # the pallas fused decoder asserts cin <= 2*LANE and cin//2 <= LANE
    # (ops/pallas_deconv.py), i.e. exactly 128 or 256 latent channels —
    # other multiples of 128 (e.g. 384 at filters=96) would crash instead
    # of falling back to the flax decoder
    latent_ch = 4 * model.filters
    use_fused_dec = fuse_decoder and latent_ch in (128, 256)

    def run_chunk(xc):
        lat = encode(xc)
        if use_fused_dec:
            from ..ops.pallas_deconv import fused_decoder

            d = params["decoder"]
            return fused_decoder(
                lat,
                *(jnp.asarray(d[f"deconv{i}"][k]).astype(
                    dtype if k == "kernel" else jnp.float32
                ) for i in (1, 2, 3, 4) for k in ("kernel", "bias")),
                alpha=TORCH_ALPHA, interpret=interpret,
            )
        decoder = DecoderUp(
            model.out_channels, model.filters, model.kernel_size,
            model.num_blocks, model.flavor, model.dtype,
        )
        return decoder.apply({"params": params["decoder"]}, lat)

    out = chunked_batch_map(run_chunk, x.astype(dtype))
    return out.astype(jnp.float32)
