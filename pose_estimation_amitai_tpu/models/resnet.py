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


class BasicResBlock(nn.Module):
    """Basic (non-bottleneck) residual block: 3x3 BN ReLU 3x3 BN + skip.

    Twin of ``ResidualBlock`` (reference: pytorch/NNs warehouse/
    NNs.py:140-160) with the 1x1+BN projection shortcut when shape changes.
    """

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
        y = nn.relu(bn("bn1")(conv(self.features, 3, self.strides, "conv1")(x)))
        y = bn("bn2")(conv(self.features, 3, 1, "conv2")(y.astype(self.dtype)))
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = bn("bn_proj")(
                conv(self.features, 1, self.strides, "conv_proj")(x)
            )
        return nn.relu(y + residual)


class GPTResNet(nn.Module):
    """Hand-written residual encoder-decoder with skip additions.

    TPU twin of ``GPTResNetEncoderDecoder`` (reference: pytorch/NNs
    warehouse/NNs.py:70-136, dispatched by ``GPTNET`` at
    pytorch/Network.py:15-26): 7x7/2 stem + 3x3/2 maxpool, four basic-block
    encoder stages (64/128/256/512, 2 blocks each), four 2x2/2 deconv
    decoder stages with encoder skip ADDITIONS and 2 residual blocks each,
    a 1x1 head, and a final bicubic resize to the input resolution (the
    reference hard-codes 192 — resolved to use the true shape).
    """

    out_channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h, w = x.shape[1:3]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem")(x.astype(self.dtype))
        y = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 dtype=jnp.float32, name="stem_bn")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")

        def stage(z, feat, strides, name):
            z = BasicResBlock(feat, strides, self.dtype,
                              name=f"{name}_block0")(z, train=train)
            return BasicResBlock(feat, 1, self.dtype,
                                 name=f"{name}_block1")(z, train=train)

        skip1 = y = stage(y, 64, 1, "enc1")
        skip2 = y = stage(y, 128, 2, "enc2")
        skip3 = y = stage(y, 256, 2, "enc3")
        y = stage(y, 512, 2, "enc4")

        def up(z, feat, name, like=None):
            z = nn.ConvTranspose(
                feat, (2, 2), strides=(2, 2), padding="VALID",
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )(z)
            if like is not None:
                # odd encoder sizes (non-192 inputs) round up under 2x
                # deconv; crop to the skip's dims before the addition
                z = z[:, : like.shape[1], : like.shape[2], :]
            return z

        y = stage(up(y, 256, "up4", skip3) + skip3, 256, 1, "dec4")
        y = stage(up(y, 128, "up3", skip2) + skip2, 128, 1, "dec3")
        y = stage(up(y, 64, "up2", skip1) + skip1, 64, 1, "dec2")
        y = up(y, 64, "up1")
        y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="head")(y)
        # F.interpolate(..., mode='bicubic') twin; /4 stem+pool vs /8 of
        # deconvs means the head is at half resolution here
        import jax

        y = jax.image.resize(
            y.astype(jnp.float32),
            (y.shape[0], h, w, self.out_channels), method="cubic",
        )
        return y


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
        h, w = x.shape[1:3]
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
        # input sizes not divisible by 32 ceil-divide through the encoder,
        # so the 5 stride-2 deconvs overshoot; crop back to the input dims
        # (always >=, e.g. 48 -> 2x2 latent -> 64)
        y = y[:, :h, :w, :]
        return leaky(y, TF_ALPHA).astype(jnp.float32)
