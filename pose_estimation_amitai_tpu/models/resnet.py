"""ResNet50 encoder + shallow transposed-conv decoder.

Re-design of ``resnet50_encoder_shallow_decoder``
(reference: tensorflow/Network.py:377-414 — a Keras ResNet50 with
``weights=None`` feeding 5 stride-2 deconvs) and the hand-written residual
encoder-decoder in the NNs warehouse (reference: pytorch/NNs warehouse/
NNs.py:70-136). The reference never uses pretrained weights (weights=None),
so a from-scratch flax ResNet50 is full parity.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import TF_ALPHA, leaky

Dtype = Any


class BottleneckBlock(nn.Module):
    """Standard ResNet v1 bottleneck (1x1 -> 3x3 -> 1x1, 4x expansion)."""

    features: int
    strides: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       dtype=jnp.float32, name=name)
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        residual = x
        y = nn.relu(bn("bn1")(conv(self.features, 1, 1, "conv1")(x)))
        y = nn.relu(bn("bn2")(conv(self.features, 3, self.strides, "conv2")(y.astype(self.dtype))))
        y = bn("bn3")(conv(self.features * 4, 1, 1, "conv3")(y.astype(self.dtype)))
        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = bn("bn_proj")(
                conv(self.features * 4, 1, self.strides, "conv_proj")(x)
            )
        return nn.relu(y + residual)


class ResNet50Encoder(nn.Module):
    """ResNet50 backbone, output stride 32 (192 -> 6x6x2048)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem")(
            x.astype(self.dtype)
        )
        x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 dtype=jnp.float32, name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage, blocks in enumerate(self.stage_sizes):
            for block in range(blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BottleneckBlock(
                    64 * (2**stage), strides, self.dtype,
                    name=f"stage{stage}_block{block}",
                )(x.astype(self.dtype), train=train)
        return x


class ResNetHeatmapNet(nn.Module):
    """ResNet50 encoder + 5 channel-halving stride-2 deconvs to heatmaps.

    Reference: tensorflow/Network.py:377-414 (LeakyReLU(0.01) heads,
    5 deconvs restoring /32 -> full resolution).
    """

    out_channels: int
    kernel_size: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        y = ResNet50Encoder(dtype=self.dtype, name="encoder")(x, train=train)
        feat = y.shape[-1]
        for i in range(4):
            feat = feat // 2
            y = nn.ConvTranspose(
                feat, (self.kernel_size, self.kernel_size), strides=(2, 2),
                padding="SAME", dtype=self.dtype, param_dtype=jnp.float32,
                name=f"deconv{i + 1}",
            )(y)
            y = leaky(y, TF_ALPHA)
        y = nn.ConvTranspose(
            self.out_channels, (self.kernel_size, self.kernel_size),
            strides=(2, 2), padding="SAME", dtype=self.dtype,
            param_dtype=jnp.float32, name="head",
        )(y)
        return leaky(y, TF_ALPHA).astype(jnp.float32)
