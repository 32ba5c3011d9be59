"""ResNet50 encoder + shallow transposed-conv decoder.

Re-design of ``resnet50_encoder_shallow_decoder``
(reference: tensorflow/Network.py:377-414 — a Keras ResNet50 with
``weights=None`` feeding 5 stride-2 deconvs) and the hand-written residual
encoder-decoder in the NNs warehouse (reference: pytorch/NNs warehouse/
NNs.py:70-136). The TF variant trains from scratch (weights=None); the
torch warehouse ResNet uses ``models.resnet50(pretrained=True)``
(NNs.py:20) — that ImageNet init is supported here by importing a
torchvision ``state_dict`` as encoder init (importers
``import_torch_checkpoint`` + config ``pretrained_encoder_path``) into the
``flavor='torch'`` trunk.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import TF_ALPHA, leaky

Dtype = Any


class BottleneckBlock(nn.Module):
    """Standard ResNet v1.5 bottleneck (1x1 -> 3x3-with-stride -> 1x1, 4x
    expansion — the torchvision layout, pytorch/NNs warehouse/NNs.py:20).

    ``flavor='torch'`` pins torchvision's explicit (1,1) padding on the
    stride-2 3x3 conv (XLA's SAME places the asymmetric pad on the other
    side), so ImageNet-pretrained torchvision weights reproduce the torch
    trunk bit-for-bit; default 'tpu' keeps SAME (the shape contract is
    identical — only the stride-2 pixel phase differs).
    """

    features: int
    strides: int = 1
    dtype: Dtype = jnp.bfloat16
    flavor: str = "tpu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       dtype=jnp.float32, name=name)
        conv = lambda f, k, s, name, pad="SAME": nn.Conv(
            f, (k, k), strides=(s, s), padding=pad, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        pad3 = ((1, 1), (1, 1)) if self.flavor == "torch" else "SAME"
        residual = x
        y = nn.relu(bn("bn1")(conv(self.features, 1, 1, "conv1")(x)))
        y = nn.relu(bn("bn2")(conv(self.features, 3, self.strides, "conv2",
                                   pad3)(y.astype(self.dtype))))
        y = bn("bn3")(conv(self.features * 4, 1, 1, "conv3")(y.astype(self.dtype)))
        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = bn("bn_proj")(
                conv(self.features * 4, 1, self.strides, "conv_proj")(x)
            )
        return nn.relu(y + residual)


class ResNet50Encoder(nn.Module):
    """ResNet50 backbone, output stride 32 (192 -> 6x6x2048).

    ``flavor='torch'`` = torchvision-exact stem/pool padding ((3,3) conv
    pad, (1,1) pool pad — torchvision places asymmetric stride-2 pads
    opposite to XLA SAME) so a torchvision ``resnet50`` ``state_dict``
    imported via :func:`..importers.import_torch_checkpoint` reproduces
    the ImageNet trunk exactly (pytorch/NNs warehouse/NNs.py:20
    ``models.resnet50(pretrained=True)``).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.bfloat16
    flavor: str = "tpu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        torch_pads = self.flavor == "torch"
        x = nn.Conv(64, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)) if torch_pads else "SAME",
                    use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem")(
            x.astype(self.dtype)
        )
        x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 dtype=jnp.float32, name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)) if torch_pads else "SAME")
        for stage, blocks in enumerate(self.stage_sizes):
            for block in range(blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BottleneckBlock(
                    64 * (2**stage), strides, self.dtype, self.flavor,
                    name=f"stage{stage}_block{block}",
                )(x.astype(self.dtype), train=train)
        return x


class KerasResNet50Encoder(nn.Module):
    """keras-applications-exact ResNet50 v1 backbone.

    The reference's TF family wraps ``tf.keras.applications.ResNet50``
    (tensorflow/Network.py:382-383), which differs from the torchvision/
    v1.5 trunk in ways that matter for checkpoint fidelity: biased convs,
    BN epsilon 1.001e-5, the downsampling stride on the FIRST 1x1 conv of
    each stage's block1 (v1), explicit (3,3)/(1,1) stem/pool zero-pads,
    and stage conv2 running at stride 1 (the pool already downsampled).
    Params/batch_stats are keyed by the keras layer names
    (``conv1_conv``, ``conv{s}_block{b}_{j}_conv``/``_bn``) so
    :func:`..importers.import_keras_h5` maps a reference ``.h5`` straight
    through. Widths are ``stem_features * 2^stage`` with 4x expansion —
    keras's 64 base, parametrised so fabricated-oracle tests stay small.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stem_features: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        eps = 1.001e-5  # keras applications resnet BN epsilon
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       epsilon=eps, dtype=jnp.float32,
                                       name=name)
        conv = lambda f, k, s, pad, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=pad, use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        x = conv(self.stem_features, 7, 2, ((3, 3), (3, 3)),
                 "conv1_conv")(x.astype(self.dtype))
        x = nn.relu(bn("conv1_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for stage, blocks in enumerate(self.stage_sizes):
            filters = self.stem_features * (2**stage)
            for b in range(1, blocks + 1):
                name = f"conv{stage + 2}_block{b}"
                stride = 2 if (stage > 0 and b == 1) else 1
                xin = x.astype(self.dtype)
                if b == 1:
                    shortcut = bn(f"{name}_0_bn")(
                        conv(4 * filters, 1, stride, "VALID",
                             f"{name}_0_conv")(xin))
                else:
                    shortcut = x
                y = nn.relu(bn(f"{name}_1_bn")(
                    conv(filters, 1, stride, "VALID", f"{name}_1_conv")(xin)))
                y = nn.relu(bn(f"{name}_2_bn")(
                    conv(filters, 3, 1, "SAME",
                         f"{name}_2_conv")(y.astype(self.dtype))))
                y = bn(f"{name}_3_bn")(
                    conv(4 * filters, 1, 1, "VALID",
                         f"{name}_3_conv")(y.astype(self.dtype)))
                x = nn.relu(y + shortcut)
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

    ``flavor``: 'tpu' (default — XLA-SAME trunk, the benched serving
    path), 'torch' (torchvision-exact padding, for ImageNet-pretrained
    encoder init), or 'tf' (keras-applications-exact v1 trunk, for
    imported reference ``.h5`` saves — :class:`KerasResNet50Encoder`).
    """

    out_channels: int
    kernel_size: int = 3
    flavor: str = "tpu"
    stem_features: int = 64
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h, w = x.shape[1:3]
        if self.flavor == "tf":
            y = KerasResNet50Encoder(
                stage_sizes=tuple(self.stage_sizes),
                stem_features=self.stem_features, dtype=self.dtype,
                name="encoder",
            )(x, train=train)
        else:
            y = ResNet50Encoder(
                stage_sizes=tuple(self.stage_sizes), dtype=self.dtype,
                flavor=self.flavor, name="encoder",
            )(x, train=train)
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
