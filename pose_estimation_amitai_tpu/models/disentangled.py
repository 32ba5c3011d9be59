"""Geometry-aware 4-camera disentanglement model (FTL).

Re-design of ``FourCamerasDisentanglement`` (reference: pytorch/CNNs.py:240-352):
shared per-view encoder -> 1x1 rearrange to a 300-channel latent -> inverse
FTL through each view's pseudo-inverse camera matrix into a canonical
400-channel space -> 1x1 fusion convs over the concatenated canonical
latents -> FTL back through each view's camera matrix -> 1x1 rearrange ->
encoder skip -> shared decoder.

The FTL math itself lives in :mod:`..ops.geometry` (``ftl_project`` /
``ftl_inverse``) as pure batched einsums — on TPU these are small MXU
contractions fused with the neighbouring 1x1 convs, instead of the
reference's reshape-heavy torch matmuls.

The camera matrices ride in as batch inputs (built per crop by the data
pipeline from the H5 ``cameras_dlt_array`` + ``cropZone``, reference:
pytorch/Datagenerators.py:242-270, 382-402).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.geometry import ftl_inverse, ftl_project
from .layers import DecoderUp, EncoderAtrous

Dtype = Any


class FourCamDisentangled(nn.Module):
    """Shared encoder + canonical-space fusion via FTL + shared decoder.

    Call signature: ``(x, camera_matrices, camera_matrices_inv)`` with
    x (B, H, W, 4*Cc), camera_matrices (B, 4, 3, 4), inverses (B, 4, 4, 3) —
    matching the reference forward (pytorch/CNNs.py:284-324).
    """

    out_channels: int  # total over 4 cameras
    filters: int = 64
    kernel_size: int = 3
    dilation: int = 2
    dropout: float = 0.5
    num_blocks: int = 2
    flavor: str = "torch"
    latent_3d_channels: int = 300  # 100 groups of (x, y, z) — CNNs.py:258-261
    dtype: Dtype = jnp.bfloat16
    # Checkpoint-fidelity switch: the reference's FTL/InvFTL "reshape" the
    # NCHW latent raw (torch.reshape (B, C, h, w) -> (B, h, w, C/3, 3, 1),
    # pytorch/CNNs.py:335+348) — a memory reinterpret that SCRAMBLES
    # channel and spatial axes rather than grouping channels. New training
    # uses the sane per-pixel channel grouping (default); imported
    # reference checkpoints were trained against the scrambled layout and
    # only reproduce their outputs with ``ref_ftl_layout=True``.
    ref_ftl_layout: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        camera_matrices: jnp.ndarray,
        camera_matrices_inv: jnp.ndarray,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        num_cams = 4
        cc = x.shape[-1] // num_cams
        views = [x[..., i * cc : (i + 1) * cc] for i in range(num_cams)]

        encoder = EncoderAtrous(
            self.filters, self.kernel_size, self.dilation, self.dropout,
            self.num_blocks, self.flavor, self.dtype, name="shared_encoder",
        )
        enc_ch = encoder.output_channels()

        def conv1x1(feat, name):
            return nn.Conv(feat, (1, 1), padding="VALID", dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)

        rearrange1 = conv1x1(self.latent_3d_channels, "rearrange1")
        rearrange2 = conv1x1(enc_ch, "rearrange2")
        canon_ch = self.latent_3d_channels // 3 * 4  # 400

        if self.ref_ftl_layout:
            # reference raw-memory reinterpret (pytorch/CNNs.py:335, 348):
            # NCHW (B, C, h, w) cast to (B, h, w, C/3, 3) — general in h/w
            def ftl_inv(t, P_inv):
                b, h, w, c = t.shape
                z = jnp.transpose(t, (0, 3, 1, 2)).reshape(b, h, w, c // 3, 3)
                out = jnp.einsum("bhwgj,bij->bhwgi", z, P_inv)
                out = out.reshape(b, 4 * c // 3, h, w)
                return jnp.transpose(out, (0, 2, 3, 1))

            def ftl_proj(t, P):
                b, h, w, c = t.shape
                z = jnp.transpose(t, (0, 3, 1, 2)).reshape(b, h, w, c // 4, 4)
                out = jnp.einsum("bhwgj,bij->bhwgi", z, P)
                out = out.reshape(b, 3 * c // 4, h, w)
                return jnp.transpose(out, (0, 2, 3, 1))
        else:
            ftl_inv, ftl_proj = ftl_inverse, ftl_project

        first_encs = [encoder(v, train=train) for v in views]
        # Per-view latent -> canonical space through pinv(P_i).
        canonical = [
            ftl_inv(
                rearrange1(first_encs[i]).astype(jnp.float32),
                camera_matrices_inv[:, i],
            ).astype(self.dtype)
            for i in range(num_cams)
        ]

        fusion = jnp.concatenate(canonical, axis=-1)  # (B, h, w, 1600)
        fusion = conv1x1(canon_ch, "fusion1")(fusion)
        fusion = nn.relu(nn.BatchNorm(use_running_average=not train,
                                      dtype=jnp.float32, name="bn1")(fusion))
        fusion = conv1x1(canon_ch, "fusion2")(fusion.astype(self.dtype))
        fusion = nn.relu(nn.BatchNorm(use_running_average=not train,
                                      dtype=jnp.float32, name="bn2")(fusion))

        bn3 = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                           name="bn3")
        decoder = DecoderUp(
            self.out_channels // num_cams, self.filters, self.kernel_size,
            self.num_blocks, self.flavor, self.dtype, name="shared_decoder",
        )
        outs = []
        for i in range(num_cams):
            ent = ftl_proj(fusion.astype(jnp.float32), camera_matrices[:, i])
            ent = nn.relu(bn3(ent))
            ent = rearrange2(ent.astype(self.dtype))
            outs.append(decoder(ent + first_encs[i]))
        return jnp.concatenate(outs, axis=-1).astype(jnp.float32)
