"""CNN heatmap models: BasicNet, coarse/C2F stacks, two-wings net.

Re-designs of the reference CNN family (reference: pytorch/CNNs.py:160-186
``BasicNet``; tensorflow/Network.py:127-198 ``basic_nn``/``coarse_per_wing``/
``C2F_per_wing``; tensorflow/Network.py:200-243 ``two_wings_net``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import DecoderUp, EncoderAtrous

Dtype = Any


class BasicNet(nn.Module):
    """Single encoder-decoder heatmap regressor — the flagship per-wing model.

    Reference: pytorch/CNNs.py:160-186 (``MODEL_18_POINTS_PER_WING`` path,
    pytorch/Network.py:15-26); tensorflow/Network.py:127-145.
    """

    out_channels: int
    filters: int = 64
    kernel_size: int = 3
    dilation: int = 2
    dropout: float = 0.5
    num_blocks: int = 2
    flavor: str = "torch"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        enc = EncoderAtrous(
            self.filters, self.kernel_size, self.dilation, self.dropout,
            self.num_blocks, self.flavor, self.dtype, name="encoder",
        )
        dec = DecoderUp(
            self.out_channels, self.filters, self.kernel_size,
            self.num_blocks, self.flavor, self.dtype, name="decoder",
        )
        return dec(enc(x, train=train)).astype(jnp.float32)


class CoarsePerWing(BasicNet):
    """Coarse stage: BasicNet forced to a 3-block (8x) pyramid.

    Reference: tensorflow/Network.py:147-167 (``num_blocks = 3  # important!``).
    Only meaningful with the TF flavour (the torch encoder is fixed-depth).
    """

    num_blocks: int = 3
    flavor: str = "tf"


class C2FPerWing(nn.Module):
    """Coarse-to-fine stack: frozen coarse model + fine enc-dec on concat.

    Reference: tensorflow/Network.py:169-198 — a pre-trained coarse model is
    loaded, frozen, and its sigma-6 heatmaps are concatenated onto the input
    of a second encoder-decoder. Here the coarse submodule's params live in
    this module's tree (loaded from checkpoint by the trainer,
    ``coarse_model_path``); freezing = ``stop_gradient`` on its output plus a
    zero-grad subtree, so Adam never moves them.
    """

    out_channels: int
    coarse_out_channels: int = 7
    filters: int = 64
    kernel_size: int = 3
    dilation: int = 2
    dropout: float = 0.5
    num_blocks: int = 2
    # The frozen coarse stage was trained separately (its .h5 rides inside
    # the reference C2F save), so its width/depth may differ from the fine
    # stack's: None/0 = same filters as the fine stage; the reference pins
    # the coarse pyramid at 3 blocks (tensorflow/Network.py:147 "important!").
    coarse_filters: int | None = None
    coarse_num_blocks: int = 3
    flavor: str = "tf"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        coarse = CoarsePerWing(
            out_channels=self.coarse_out_channels,
            filters=self.coarse_filters or self.filters,
            kernel_size=self.kernel_size,
            dilation=self.dilation, dropout=self.dropout,
            num_blocks=self.coarse_num_blocks,
            dtype=self.dtype, name="coarse",
        )
        coarse_maps = jax.lax.stop_gradient(coarse(x, train=False))
        x2 = jnp.concatenate([x, coarse_maps.astype(x.dtype)], axis=-1)
        fine = BasicNet(
            out_channels=self.out_channels, filters=self.filters,
            kernel_size=self.kernel_size, dilation=self.dilation,
            dropout=self.dropout, num_blocks=self.num_blocks,
            flavor=self.flavor, dtype=self.dtype, name="fine",
        )
        return fine(x2, train=train)


class TwoWingsNet(nn.Module):
    """Shared encoder over two wing views, cross-wing concat decoder.

    Reference: tensorflow/Network.py:200-243. Input is (H, W, T+2) with T time
    channels and one mask channel per wing; wing view i sees the time channels
    plus its own mask (channels [0..T-1, T+i]). The decoder for wing i gets
    concat(enc_i, enc_j); outputs are concatenated.
    """

    out_channels: int  # total (both wings)
    filters: int = 64
    kernel_size: int = 3
    dilation: int = 2
    dropout: float = 0.5
    num_blocks: int = 2
    flavor: str = "tf"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        t = x.shape[-1] - 2
        wing1 = x[..., list(range(t)) + [t]]
        wing2 = x[..., list(range(t)) + [t + 1]]
        enc = EncoderAtrous(
            self.filters, self.kernel_size, self.dilation, self.dropout,
            self.num_blocks, self.flavor, self.dtype, name="shared_encoder",
        )
        dec = DecoderUp(
            self.out_channels // 2, self.filters, self.kernel_size,
            self.num_blocks, self.flavor, self.dtype, name="shared_decoder",
        )
        code1 = enc(wing1, train=train)
        code2 = enc(wing2, train=train)
        map1 = dec(jnp.concatenate([code1, code2], axis=-1))
        map2 = dec(jnp.concatenate([code2, code1], axis=-1))
        return jnp.concatenate([map1, map2], axis=-1).astype(jnp.float32)
