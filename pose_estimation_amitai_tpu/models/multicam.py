"""Multi-camera CNN fusion models.

Re-designs of the reference's shared-encoder camera-fusion family:

* ``FourCamerasBaseLine`` — shared encoder per view, 1x1-conv fused latent
  with residual, shared decoder per view (reference: pytorch/CNNs.py:189-237)
* TF ``all_4_cams`` / ``all_3_cams`` / ``head_tail_all_cams`` — shared
  encoder, latent concat (optionally through a self-attention fusion layer),
  shared decoder on concat(enc_i, merged)
  (reference: tensorflow/Network.py:74-125, 245-305, 321-375; the attention
  fusion layer at :307-319)

One module covers the whole family: ``num_cams`` views of ``C/num_cams``
channels each, with flavour-dependent fusion.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import DecoderUp, EncoderAtrous

Dtype = Any


class LatentSelfAttention(nn.Module):
    """Self-attention over flattened latent pixels with residual.

    Reference: tensorflow/Network.py:307-319 (``self_attention_layer``):
    reshape (h, w, c) -> (h*w, c), MHA, reshape back, add.
    """

    num_heads: int = 8
    key_dim: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.num_heads * self.key_dim,
            out_features=c, dtype=self.dtype, param_dtype=jnp.float32,
            name="mha",
        )(seq, seq)
        return x + attn.reshape(b, h, w, c)


class MultiCamNet(nn.Module):
    """Shared per-camera encoder + latent fusion + shared per-camera decoder.

    flavor='torch' (pytorch/CNNs.py:189-237): fused = 1x1conv(concat) + concat
    residual; decoder input = concat(enc_i, fused) (5x latent width).
    flavor='tf' (tensorflow/Network.py:321-375): fused = concat (optionally
    self-attended); decoder input = concat(enc_i, fused).
    """

    out_channels: int  # total over all cameras
    num_cams: int = 4
    filters: int = 64
    kernel_size: int = 3
    dilation: int = 2
    dropout: float = 0.5
    num_blocks: int = 2
    flavor: str = "torch"
    do_attention: bool = False
    dtype: Dtype = jnp.bfloat16
    # Fold the camera views into the BATCH axis for the shared encoder and
    # decoder: one conv dispatch at 4x batch instead of 4 sequential view
    # passes — the shared weights make the views embarrassingly
    # batch-parallel, and larger batched convs tile the MXU far better
    # than 4 small back-to-back dispatches (round-2 verdict #6). The
    # unfolded path is kept for the bit-parity regression test; both share
    # one param tree (the modules are applied with the same scopes).
    fold_views: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        v = self.num_cams
        cc = c // v

        encoder = EncoderAtrous(
            self.filters, self.kernel_size, self.dilation, self.dropout,
            self.num_blocks, self.flavor, self.dtype, name="shared_encoder",
        )
        decoder = DecoderUp(
            self.out_channels // v, self.filters, self.kernel_size,
            self.num_blocks, self.flavor, self.dtype, name="shared_decoder",
        )

        def fuse(merged):
            if self.flavor == "torch":
                # fused latent + residual (pytorch/CNNs.py:216-223)
                return nn.Conv(
                    merged.shape[-1], (1, 1), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="fusion_conv",
                )(merged) + merged
            if self.do_attention:
                return LatentSelfAttention(
                    dtype=self.dtype, name="fusion_attn"
                )(merged)
            return merged

        if not self.fold_views:
            views = [x[..., i * cc : (i + 1) * cc] for i in range(v)]
            encs = [encoder(vw, train=train) for vw in views]
            fused = fuse(jnp.concatenate(encs, axis=-1))
            outs = [
                decoder(jnp.concatenate([e, fused], axis=-1)) for e in encs
            ]
            return jnp.concatenate(outs, axis=-1).astype(jnp.float32)

        # view-fold: channels are view-major blocks, so (B, H, W, V, cc)
        # slices match x[..., i*cc:(i+1)*cc] exactly
        xv = x.reshape(b, h, w, v, cc)
        xv = jnp.moveaxis(xv, 3, 1).reshape(b * v, h, w, cc)
        enc = encoder(xv, train=train)  # (B*V, h', w', C)
        _, hh, ww, ec = enc.shape
        encs = enc.reshape(b, v, hh, ww, ec)
        merged = jnp.moveaxis(encs, 1, 3).reshape(b, hh, ww, v * ec)
        fused = fuse(merged)
        dec_in = jnp.concatenate(
            [encs,
             jnp.broadcast_to(fused[:, None],
                              (b, v, hh, ww, fused.shape[-1]))],
            axis=-1,
        ).reshape(b * v, hh, ww, ec + fused.shape[-1])
        out = decoder(dec_in)  # (B*V, H, W, K/V)
        out = out.reshape(b, v, h, w, -1)
        out = jnp.moveaxis(out, 1, 3).reshape(b, h, w, self.out_channels)
        return out.astype(jnp.float32)
