"""ViT heatmap models: ViT encoder + CNN decoder, 4-camera cross-attention ViT.

Re-designs of the reference ViT family:

* ``CustomViT`` patch-unfold + linear embed + learned pos-emb + pre-LN
  transformer (reference: pytorch/pytorch_vit_encoder.py:12-149)
* ``CNN_Decoder`` tokens -> (12, 12, dim) grid -> 4 stride-2 deconvs ->
  global min-max normalisation (reference: pytorch/VITs.py:13-58)
* ``VIT_encoder_CNN_decoder`` (reference: pytorch/VITs.py:197-229),
  the ``MODEL_18_POINTS_PER_WING_VIT`` dispatch target
* TF ``vision_transformer`` post-LN flavour with a channel-halving deconv
  reconstruction head (reference: tensorflow/vitPose.py:63-130)
* ``VIT4CamerasBaseLine`` shared encoder + cross-attention fusion over the
  concatenated per-camera tokens (reference: pytorch/VITs.py:235-306)

TPU-first choices: patch embedding is a strided conv (identical math to
unfold+matmul, but XLA lowers it straight onto the MXU); attention is fused
einsum in bf16 with f32 softmax accumulation; sequence length is 144 tokens
(192/16)^2, so no context-parallel machinery is needed (SURVEY §5).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import TORCH_ALPHA, leaky

Dtype = Any


class _DenseParams(nn.Module):
    """Claims nn.Dense's exact param tree (``kernel``[, ``bias``]) without
    applying it (fused serving paths consume the weights algebraically)."""

    in_dim: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.linear.default_kernel_init,
            (self.in_dim, self.features), jnp.float32,
        )
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        jnp.float32)
             if self.use_bias else None)
        return k, b


class Attention(nn.Module):
    """Pre-LN multi-head self-attention with fused qkv.

    Reference: pytorch/pytorch_vit_encoder.py:31-78 (LN -> qkv (no bias) ->
    scaled dot-product -> out projection).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    pre_norm: bool = True  # False: raw input (tf post-LN blocks norm after)
    # torch flavour: bias-free fused qkv (pytorch_vit_encoder.py:52);
    # tf flavour: keras MultiHeadAttention defaults to biased q/k/v
    # projections (vitPose.py:66-68)
    qkv_bias: bool = False
    # Serving-only switch (infer.Predictor engages it for argmax peaks-only
    # serving, like CNNDecoderViT.normalize_output): keep the softmax chain
    # in bf16 with an f32 SUM accumulation instead of materialising the
    # (B, H, N, N) logits in f32. Max-subtraction bounds exp to (0, 1]
    # where bf16 carries ~3 significant digits, and the normaliser is
    # accumulated in f32 — halves the HBM traffic of the profiled softmax
    # bottleneck (DESIGN.md "ViT serving attribution": the f32 logits
    # materialisation is the trunk's dominant non-matmul cost). Training
    # and heatmap-returning paths keep the f32 softmax.
    fast_softmax: bool = False
    # Serving-only switch (round-5, engaged with fast_softmax): an exact
    # algebraic rewrite of the SAME param tree — the per-head V projection
    # and the output projection are merged (W_vo[h] = Wv[h] @ Wo[h],
    # associativity of the chain attn_h @ (x Wv_h) Wo_h), so the
    # (B, N, heads*dim_head) attention output is never materialised and
    # the to_out GEMM disappears; the softmax output contracts straight
    # to model dim over (tokens, heads) in ONE dot_general.
    # Exact in real arithmetic; bf16 rounding differs slightly, so it is
    # a serving-only switch like fast_softmax (argmax parity pinned in
    # tests/test_models.py).
    fused_serving: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        inner = self.dim_head * self.heads
        if (self.fused_serving and self.pre_norm and self.fast_softmax
                and not train):
            return self._fused_forward(x)
        y = (nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
             if self.pre_norm else x.astype(jnp.float32))
        qkv = nn.Dense(inner * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(y)
        b, n, _ = qkv.shape
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        scale = self.dim_head**-0.5
        if self.fast_softmax and not train:
            # scale folded onto q (one (B,N,H,D) pass instead of the
            # (B,H,N,N) logits pass); bf16 logits; f32 normaliser. The
            # einsums keep heads INNERMOST ("bnmh" logits): the qkv slices
            # then feed dot_general without bhnd input transposes — same
            # contraction, BITWISE-identical outputs (measured maxdiff 0.0,
            # scripts/exp_attn_layout.py), -4% trunk time at the
            # production dim_head=256 config.
            qs = q * jnp.asarray(scale, q.dtype)
            logits = jnp.einsum("bnhd,bmhd->bnmh", qs, k)
            mx = jnp.max(logits, axis=2, keepdims=True)
            e = jnp.exp(logits - mx)
            s = jnp.sum(e, axis=2, keepdims=True, dtype=jnp.float32)
            attn = (e.astype(jnp.float32) / s).astype(self.dtype)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum("bnmh,bmhd->bnhd", attn, v).reshape(b, n, inner)
        else:
            logits = (
                jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
                * scale
            )
            attn = nn.softmax(logits, axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="to_out")(out)

    def _fused_forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """Merged V/out projection (see ``fused_serving``).

        Reads the IDENTICAL param tree as the module path (to_qkv / to_out
        via the param-claiming helpers) and computes the same function with
        one fewer GEMM and one fewer materialised intermediate per block.
        (An LN->qkv weight fold was measured too: its wide f32 epilogue
        over the 6144-wide qkv output cost MORE than the small LN it
        removed — scripts/exp_vit_fused.py — so the real LayerNorm stays.)
        """
        b, n, dim = x.shape
        h, dh = self.heads, self.dim_head
        inner = dh * h
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        wqkv, bqkv = _DenseParams(dim, inner * 3, use_bias=self.qkv_bias,
                                  name="to_qkv")()
        wo, bo = _DenseParams(inner, self.dim, name="to_out")()
        scale = dh**-0.5
        w3 = wqkv.reshape(dim, 3, h, dh)
        wq = w3[:, 0].reshape(dim, inner) * scale  # softmax scale folded
        wk = w3[:, 1].reshape(dim, inner)
        wo_h = wo.reshape(h, dh, self.dim)
        # W_vo[h] = Wv[h] @ Wo[h]: associativity of attn @ (x Wv) Wo
        wvo = jnp.einsum("dhe,heo->dho", w3[:, 2], wo_h)
        w_all = jnp.concatenate(
            [wq, wk, wvo.reshape(dim, h * self.dim)], axis=1
        )
        d = jnp.zeros((2 * inner + h * self.dim,), jnp.float32)
        out_const = jnp.zeros((self.dim,), jnp.float32)
        if bqkv is not None:
            b3 = bqkv.reshape(3, h, dh)
            d = d + jnp.concatenate([
                b3[0].reshape(inner) * scale, b3[1].reshape(inner),
                jnp.zeros((h * self.dim,), jnp.float32),
            ])
            # softmax rows sum to 1, so the V bias contracts to a constant
            out_const = jnp.einsum("hd,hdo->o", b3[2], wo_h)
        z = y.astype(self.dtype) @ w_all.astype(self.dtype)
        if bqkv is not None:
            z = z + d.astype(self.dtype)
        q = z[..., :inner].reshape(b, n, h, dh)
        k = z[..., inner:2 * inner].reshape(b, n, h, dh)
        vt = z[..., 2 * inner:].reshape(b, n, h, self.dim)
        logits = jnp.einsum("bnhd,bmhd->bnmh", q, k)
        mx = jnp.max(logits, axis=2, keepdims=True)
        e = jnp.exp(logits - mx)
        s = jnp.sum(e, axis=2, keepdims=True, dtype=jnp.float32)
        attn = (e.astype(jnp.float32) / s).astype(self.dtype)
        # ONE contraction over (tokens, heads) straight to model dim — the
        # (B, N, inner) attention output and the to_out GEMM never exist
        out = jnp.einsum("bnmh,bmhe->bne", attn, vt)
        return out + (bo + out_const).astype(self.dtype)


class FeedForward(nn.Module):
    """LN -> Dense -> GELU -> Dense (reference: pytorch_vit_encoder.py:12-28)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    pre_norm: bool = True  # False: raw input (tf post-LN blocks norm after)
    activation: str = "gelu"  # tf flavour uses relu (vitPose.py:71)
    # accepted for interface symmetry with Attention.fused_serving; an
    # LN->fc1 weight fold was built and measured NEGATIVE (the f32 epilogue
    # over the wide fc1 output outweighs the removed LN pass,
    # scripts/exp_vit_fused.py) — the module path is the fast path here.
    fused_serving: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        y = (nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
             if self.pre_norm else x)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(y)
        y = nn.relu(y) if self.activation == "relu" else nn.gelu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class Transformer(nn.Module):
    """Transformer stack in two reference flavours.

    ``torch``: pre-LN blocks with a trailing LayerNorm
    (pytorch/pytorch_vit_encoder.py:81-105). ``tf``: post-LN blocks — raw
    MHA + skip then LN, relu FFN + skip then LN, attention dropout 0.1 —
    exactly ``transformer_layer`` (tensorflow/vitPose.py:63-79); the last
    block already ends in LN, so no extra trailing norm.
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    flavor: str = "torch"
    fast_softmax: bool = False  # see Attention.fast_softmax (serving-only)
    fused_serving: bool = False  # see Attention.fused_serving (serving-only)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if self.flavor == "tf":
            for i in range(self.depth):
                a = Attention(self.dim, self.heads, self.dim_head,
                              0.1,  # fixed attention dropout, vitPose.py:66
                              self.dtype, pre_norm=False, qkv_bias=True,
                              fast_softmax=self.fast_softmax,
                              name=f"attn{i}")(x, train=train)
                x = nn.LayerNorm(dtype=jnp.float32, name=f"postnorm{i}a")(
                    x + a
                )
                f = FeedForward(self.dim, self.mlp_dim, 0.0, self.dtype,
                                pre_norm=False, activation="relu",
                                name=f"ff{i}")(x, train=train)
                x = nn.LayerNorm(dtype=jnp.float32, name=f"postnorm{i}b")(
                    x + f
                )
            return x
        for i in range(self.depth):
            x = Attention(self.dim, self.heads, self.dim_head, self.dropout,
                          self.dtype, fast_softmax=self.fast_softmax,
                          fused_serving=self.fused_serving,
                          name=f"attn{i}")(x, train=train) + x
            x = FeedForward(self.dim, self.mlp_dim, self.dropout, self.dtype,
                            fused_serving=self.fused_serving,
                            name=f"ff{i}")(x, train=train) + x
        return nn.LayerNorm(dtype=jnp.float32, name="final_norm")(x)


class PatchEmbed(nn.Module):
    """Strided-conv patch embedding + learned positional embedding.

    Identical math to the reference's unfold + linear embedding
    (pytorch/pytorch_vit_encoder.py:131-144, tensorflow/vitPose.py:6-60), but
    expressed as a conv so XLA tiles it onto the MXU directly.
    """

    dim: int
    patch_size: int = 16
    post_norm: bool = True  # torch flavour LayerNorms the embedding
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        # the CNN decoder reconstructs a SQUARE token grid from sqrt(N);
        # a rectangular grid whose count is a perfect square (e.g. 16x9)
        # would silently scramble spatial layout
        assert h == w, f"ViT path needs square inputs, got {h}x{w}"
        p = self.patch_size
        y = nn.Conv(self.dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32, name="proj")(
            x.astype(self.dtype)
        )
        n = (h // p) * (w // p)
        y = y.reshape(b, n, self.dim)
        if self.post_norm:
            y = nn.LayerNorm(dtype=jnp.float32, name="embed_norm")(y)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, n, self.dim),
            jnp.float32,
        )
        return (y + pos.astype(y.dtype)).astype(self.dtype)


class CNNDecoderViT(nn.Module):
    """Token grid -> heatmaps via 4 stride-2 deconvs.

    flavor='torch': constant-width deconvs + per-sample min-max
    normalisation (pytorch/VITs.py:13-58; the reference's batch-global
    min-max is a latent defect, see inline note). flavor='tf':
    channel-halving deconvs, no normalisation (tensorflow/vitPose.py:82-96).
    """

    out_channels: int
    dim: int
    kernel_size: int = 3
    flavor: str = "torch"
    dtype: Dtype = jnp.bfloat16
    # serving-only switch: per-sample min-max normalisation is strictly
    # monotonic, so the argmax peak decode is invariant to it — the
    # peaks-only inference path (infer.Predictor, decode='argmax', no
    # heatmaps returned) disables it to skip the f32 cast + 3 full-map
    # HBM passes. Training and heatmap-returning paths keep the reference
    # normalisation (pytorch/VITs.py:55-58).
    normalize_output: bool = True
    # Checkpoint-fidelity switch: the reference reshapes (B, N, dim) tokens
    # as ``x.reshape(-1, dim, 12, 12)`` (pytorch/VITs.py:40) — a raw
    # memory-order cast that SCRAMBLES token and channel axes rather than
    # forming the (12, 12) token grid. The sane grid (default) is what new
    # training should use; imported reference checkpoints were trained
    # against the scrambled layout and only reproduce their outputs with
    # ``ref_token_grid=True``.
    ref_token_grid: bool = False

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        b, n, d = tokens.shape
        g = int(round(n**0.5))
        if self.ref_token_grid:
            # row-major cast to (d, g, g) exactly like torch's reshape,
            # then to NHWC for our deconvs
            x = tokens.reshape(b, d, g, g).transpose(0, 2, 3, 1)
        else:
            x = tokens.reshape(b, g, g, d)
        x = x.astype(self.dtype)
        # both flavours use alpha=0.1 here: the TF ViT decoder hard-codes
        # LeakyReLU(alpha=0.1) on every deconv incl. the head
        # (tensorflow/vitPose.py:89-96), unlike the TF CNN stack's 0.01
        alpha = TORCH_ALPHA

        def deconv(feat, name):
            # torch flavour: reproduce ConvTranspose2d(k, s=2, p=1, op=1)'s
            # top/left crop exactly (see layers.DecoderUp._deconv)
            if self.flavor == "torch":
                k = self.kernel_size
                padding = ((k - 2, k - 1), (k - 2, k - 1))
            else:
                padding = "SAME"
            return nn.ConvTranspose(
                feat, (self.kernel_size, self.kernel_size), strides=(2, 2),
                padding=padding, dtype=self.dtype, param_dtype=jnp.float32,
                name=name,
            )

        if self.flavor == "torch":
            widths = (self.dim, self.dim, self.dim, self.out_channels)
        else:
            widths = (d // 2, d // 4, d // 8, self.out_channels)
        for i, feat in enumerate(widths):
            x = leaky(deconv(feat, f"deconv{i + 1}")(x), alpha)
        if self.flavor == "torch" and not self.normalize_output:
            return x  # peaks-only serving: stay in compute dtype
        x = x.astype(jnp.float32)
        if self.flavor == "torch":
            # PER-SAMPLE min-max normalisation. The reference normalises
            # over the whole batch (pytorch/VITs.py:55-58), which couples
            # every sample's heatmap amplitudes to its batchmates — a
            # latent defect (same image, different prediction at different
            # batch sizes), resolved per repo policy (DESIGN.md deviations).
            lo = x.min(axis=(1, 2, 3), keepdims=True)
            hi = x.max(axis=(1, 2, 3), keepdims=True)
            x = (x - lo) / (hi - lo + 1e-12)
        return x


class ViTPoseNet(nn.Module):
    """ViT encoder + CNN decoder heatmap model.

    Reference: pytorch/VITs.py:197-229 (``VIT_encoder_CNN_decoder``) and the
    TF ``vision_transformer`` (tensorflow/vitPose.py:100-130).
    """

    out_channels: int
    patch_size: int = 16
    dim: int = 256
    depth: int = 8
    heads: int = 8
    dim_head: int = 64
    mlp_expand: int = 4
    kernel_size: int = 3
    dropout: float = 0.0
    flavor: str = "torch"
    dtype: Dtype = jnp.bfloat16
    normalize_output: bool = True  # see CNNDecoderViT.normalize_output
    ref_token_grid: bool = False  # see CNNDecoderViT.ref_token_grid
    fast_softmax: bool = False  # see Attention.fast_softmax (serving-only)
    fused_serving: bool = False  # see Attention.fused_serving (serving-only)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        tokens = PatchEmbed(self.dim, self.patch_size,
                            post_norm=self.flavor == "torch",
                            dtype=self.dtype, name="patch_embed")(x)
        tokens = Transformer(self.dim, self.depth, self.heads, self.dim_head,
                             self.dim * self.mlp_expand, self.dropout,
                             self.dtype, flavor=self.flavor,
                             fast_softmax=self.fast_softmax,
                             fused_serving=self.fused_serving,
                             name="transformer")(tokens, train=train)
        return CNNDecoderViT(self.out_channels, self.dim, self.kernel_size,
                             self.flavor, self.dtype,
                             normalize_output=self.normalize_output,
                             ref_token_grid=self.ref_token_grid,
                             name="decoder")(tokens)


class CrossAttentionFuse(nn.Module):
    """One cross-attention fusion block over concatenated camera tokens.

    Reference: pytorch/VITs.py:235-249 — a depth-1 Transformer on the
    (dim*5)-wide concat, then LN + Linear back to dim + GELU.
    """

    input_dim: int
    output_dim: int
    dtype: Dtype = jnp.bfloat16
    fast_softmax: bool = False  # see Attention.fast_softmax (serving-only)
    fused_serving: bool = False  # see Attention.fused_serving (serving-only)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        y = Transformer(self.input_dim, depth=1, heads=4,
                        dim_head=self.output_dim, mlp_dim=self.output_dim,
                        dtype=self.dtype, fast_softmax=self.fast_softmax,
                        fused_serving=self.fused_serving,
                        name="transformer")(x, train=train)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(y)
        y = nn.Dense(self.output_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj")(y)
        return nn.gelu(y)


class ViT4Cameras(nn.Module):
    """Shared ViT encoder per camera + cross-attention fusion + shared decoder.

    Reference: pytorch/VITs.py:252-306 (``VIT4CamerasBaseLine``). Input is
    (B, H, W, 4*Cc): 4 camera views of Cc channels, concatenated on channels.
    """

    out_channels: int  # total over 4 cameras
    patch_size: int = 16
    dim: int = 256
    depth: int = 8
    heads: int = 8
    dim_head: int = 64
    mlp_expand: int = 4
    kernel_size: int = 3
    num_fuse_layers: int = 4
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    normalize_output: bool = True  # see CNNDecoderViT.normalize_output
    fast_softmax: bool = False  # see Attention.fast_softmax (serving-only)
    fused_serving: bool = False  # see Attention.fused_serving (serving-only)
    # Fold the 4 camera views into the BATCH axis for the shared encoder,
    # fusion blocks and decoder (one dispatch at 4x batch instead of 4
    # sequential passes; per-(sample, view) min-max normalisation is
    # unchanged because the unfolded decoder already normalised per sample
    # within each view). The unfolded path stays for the bit-parity test.
    fold_views: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        num_cams = 4
        b, h, w, c = x.shape
        cc = c // num_cams

        embed = PatchEmbed(self.dim, self.patch_size, dtype=self.dtype,
                           name="patch_embed")
        encoder = Transformer(self.dim, self.depth, self.heads, self.dim_head,
                              self.dim * self.mlp_expand, self.dropout,
                              self.dtype, fast_softmax=self.fast_softmax,
                              fused_serving=self.fused_serving,
                              name="shared_encoder")
        fuses = [CrossAttentionFuse(self.dim * 5, self.dim, self.dtype,
                                    fast_softmax=self.fast_softmax,
                                    fused_serving=self.fused_serving,
                                    name=f"fuse{i}")
                 for i in range(self.num_fuse_layers)]
        decoder = CNNDecoderViT(self.out_channels // num_cams, self.dim,
                                self.kernel_size, "torch", self.dtype,
                                normalize_output=self.normalize_output,
                                name="shared_decoder")

        if not self.fold_views:
            views = [x[..., i * cc : (i + 1) * cc] for i in range(num_cams)]
            encs = [encoder(embed(v), train=train) for v in views]
            skips = list(encs)
            merged = jnp.concatenate(encs, axis=-1)  # (B, N, 4*dim)
            for fuse in fuses:
                encs = [
                    fuse(jnp.concatenate([e, merged], axis=-1), train=train)
                    + e
                    for e in encs
                ]
            outs = [decoder(e + s) for e, s in zip(encs, skips)]
            out = jnp.concatenate(outs, axis=-1)
            return out if not self.normalize_output else out.astype(
                jnp.float32
            )

        v = num_cams
        xv = x.reshape(b, h, w, v, cc)
        xv = jnp.moveaxis(xv, 3, 1).reshape(b * v, h, w, cc)
        tokens = encoder(embed(xv), train=train)  # (B*V, N, D)
        n, d = tokens.shape[1:]
        encs = tokens.reshape(b, v, n, d)
        skips = encs
        merged = jnp.moveaxis(encs, 1, 2).reshape(b, n, v * d)
        for fuse in fuses:
            fin = jnp.concatenate(
                [encs, jnp.broadcast_to(merged[:, None], (b, v, n, v * d))],
                axis=-1,
            ).reshape(b * v, n, d + v * d)
            encs = fuse(fin, train=train).reshape(b, v, n, d) + encs
        out = decoder((encs + skips).reshape(b * v, n, d))  # (B*V, H, W, K/V)
        out = out.reshape(b, v, h, w, -1)
        out = jnp.moveaxis(out, 1, 3).reshape(b, h, w, self.out_channels)
        return out if not self.normalize_output else out.astype(jnp.float32)
