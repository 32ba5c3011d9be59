"""Shared building blocks: atrous CNN encoder / transposed-conv decoder.

Re-designs of the reference's two (subtly different) encoder/decoder stacks:

* PyTorch flavour — ``Encoder2DAtrous``/``Decoder2d`` with residual skips
  between consecutive convs and LeakyReLU(0.1)
  (reference: pytorch/CNNs.py:9-157)
* TF flavour — ``encoder2d_atrous``/``decoder2d`` with no skips,
  LeakyReLU(0.01), a linear conv + maxpool + ReLU block tail, and a
  ``num_blocks``-deep pyramid (reference: tensorflow/Network.py:416-474)

Both produce the same contract: (H, W, C_in) -> (H/4, W/4, 4*filters) latent
-> (H, W, C_out) heatmaps (pytorch/CNNs.py:51-54). The flavour is pinned per
model via config ``arch_flavor`` (SURVEY §7 hard part 2: alpha/skip/activation
differences must be chosen consciously for checkpoint fidelity).

TPU notes: NHWC layout; convs run on the MXU in bf16 with f32 params; dropout
uses flax's rng collection (PRNG-keyed, SURVEY §7 hard part 5).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

TF_ALPHA = 0.01  # tensorflow/Network.py:11
TORCH_ALPHA = 0.1  # pytorch/CNNs.py:21


def leaky(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=alpha)


class EncoderAtrous(nn.Module):
    """Dilated-conv encoder, fixed /4 downsample.

    flavor='torch': 3 stages of 3 dilated convs with residual skips between
    consecutive convs, maxpool after stages 1-2, dropout per stage
    (pytorch/CNNs.py:73-88). flavor='tf': ``num_blocks`` stages of
    [conv, conv, linear-conv, maxpool, relu, dropout] then a 3-conv
    bottleneck (tensorflow/Network.py:416-447).
    """

    filters: int = 64
    kernel_size: int = 3
    dilation: int = 2
    dropout: float = 0.5
    num_blocks: int = 2
    flavor: str = "torch"
    dtype: Dtype = jnp.bfloat16

    def _conv(self, features: int, name: str) -> nn.Conv:
        return nn.Conv(
            features,
            (self.kernel_size, self.kernel_size),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        drop = nn.Dropout(self.dropout, deterministic=not train)
        pool = lambda v: nn.max_pool(v, (2, 2), strides=(2, 2), padding="SAME")

        if self.flavor == "torch":
            alpha = TORCH_ALPHA
            # Three stages at filters, 2*filters, 4*filters; pools after the
            # first two stages only (output /4) — pytorch/CNNs.py:73-88.
            for stage, mult in enumerate((1, 2, 4)):
                f = self.filters * mult
                x1 = leaky(self._conv(f, f"conv{3 * stage + 1}")(x), alpha)
                x2 = leaky(self._conv(f, f"conv{3 * stage + 2}")(x1), alpha) + x1
                x3 = leaky(self._conv(f, f"conv{3 * stage + 3}")(x2), alpha) + x2
                if stage < 2:
                    x = drop(leaky(pool(x3), alpha))
                else:
                    x = drop(x3)
            return x

        # TF flavour — tensorflow/Network.py:416-447.
        alpha = TF_ALPHA
        for block in range(self.num_blocks):
            f = self.filters * (2**block)
            x = leaky(self._conv(f, f"block{block}_conv1")(x), alpha)
            x = leaky(self._conv(f, f"block{block}_conv2")(x), alpha)
            x = self._conv(f, f"block{block}_conv3")(x)  # linear
            x = nn.relu(pool(x))
            x = drop(x)
        f = self.filters * (2**self.num_blocks)
        for i in range(3):
            x = leaky(self._conv(f, f"bottleneck_conv{i + 1}")(x), alpha)
        return drop(x)

    def output_channels(self) -> int:
        if self.flavor == "torch":
            return self.filters * 4
        return self.filters * (2**self.num_blocks)


class DecoderUp(nn.Module):
    """Transposed-conv decoder: latent (h, w, C) -> (4h, 4w, out_channels).

    flavor='torch': deconv/2x -> two same-size deconvs with skips -> final
    deconv/2x; LeakyReLU(0.1) on every layer incl. the head
    (pytorch/CNNs.py:151-157). flavor='tf': per block deconv/2x + 2 convs
    (LeakyReLU 0.01), linear deconv/2x head (tensorflow/Network.py:449-474).
    """

    out_channels: int
    filters: int = 64
    kernel_size: int = 3
    num_blocks: int = 2
    flavor: str = "torch"
    dtype: Dtype = jnp.bfloat16

    def _deconv(self, features: int, stride: int, name: str) -> nn.ConvTranspose:
        # torch flavour, stride 2: the reference's ConvTranspose2d(k=3, s=2,
        # padding=1, output_padding=1) crops one row/col from the TOP/LEFT
        # of the full transposed output; flax "SAME" crops bottom/right (the
        # TF convention). Explicit (low=k-2, high=k-1) padding reproduces
        # the torch crop exactly (verified numerically vs torch;
        # pytorch/CNNs.py:108-129) — without it every imported torch
        # checkpoint would be off by one pixel after each stride-2 deconv.
        if self.flavor == "torch" and stride == 2:
            k = self.kernel_size
            padding = ((k - 2, k - 1), (k - 2, k - 1))
        else:
            padding = "SAME"
        return nn.ConvTranspose(
            features,
            (self.kernel_size, self.kernel_size),
            strides=(stride, stride),
            padding=padding,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )

    def _conv(self, features: int, name: str) -> nn.Conv:
        return nn.Conv(
            features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        if self.flavor == "torch":
            alpha = TORCH_ALPHA
            half = x.shape[-1] // 2
            x1 = leaky(self._deconv(half, 2, "deconv1")(x), alpha)
            x2 = leaky(self._deconv(half, 1, "deconv2")(x1), alpha) + x1
            x3 = leaky(self._deconv(half, 1, "deconv3")(x2), alpha) + x2
            return leaky(self._deconv(self.out_channels, 2, "deconv4")(x3), alpha)

        alpha = TF_ALPHA
        for block in range(self.num_blocks - 1, 0, -1):
            f = self.filters * (2**block)
            x = leaky(self._deconv(f, 2, f"block{block}_deconv")(x), alpha)
            x = leaky(self._conv(f, f"block{block}_conv1")(x), alpha)
            x = leaky(self._conv(f, f"block{block}_conv2")(x), alpha)
        # linear output head — tensorflow/Network.py:470-472
        return self._deconv(self.out_channels, 2, "head_deconv")(x)
