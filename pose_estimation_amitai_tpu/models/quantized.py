"""Calibrated int8 inference for the flagship CNN (serving fast path).

v5e's MXU runs int8 at 2x its bf16 rate (394 vs 197 T(FL)OPS) and int8
activations halve HBM traffic, so a quantized forward nearly doubles
batched-inference throughput. Heatmap regression decodes by per-channel
argmax, which is robust to quantization noise — parity is verified on a
trained model in tests/test_quantized.py (peak locations within ~1px of the
bf16 path; the reference's own eval metric, pixel L2, is the yardstick).

Scheme: symmetric per-tensor activation scales (amax calibrated on sample
batches) and per-output-channel weight scales; convs/deconvs run
int8 x int8 -> int32 on the MXU, with dequant+bias+LeakyReLU fused into the
epilogue by XLA. Structure mirrors BasicNet's torch flavour exactly
(models/layers.py; reference pytorch/CNNs.py:73-157).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .cnn import BasicNet
from .layers import TORCH_ALPHA

_DN = ("NHWC", "HWIO", "NHWC")


def _leaky(x, alpha=TORCH_ALPHA):
    return jnp.where(x >= 0, x, x * alpha)


def _conv(x, w, dilation=1, acc=None):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(dilation, dilation),
        dimension_numbers=_DN, preferred_element_type=acc,
    )


def _deconv_s1(x, w, acc=None):
    # flax ConvTranspose(k3, s1, SAME) == plain unflipped SAME conv
    return _conv(x, w, acc=acc)


def _deconv_s2(x, w, acc=None):
    # torch-flavour ConvTranspose(k3, s2, padding ((1,2),(1,2)) — the
    # reference ConvTranspose2d p=1/op=1 crop, models/layers.py) ==
    # lhs-dilated conv, padding (1, 2)
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 2), (1, 2)], lhs_dilation=(2, 2),
        dimension_numbers=_DN, preferred_element_type=acc,
    )


def _pool(x):
    b, h, w, c = x.shape
    return jnp.max(
        x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4)
    )


_DEC = ["deconv1", "deconv2", "deconv3", "deconv4"]


def reference_forward(params, x, collect=None):
    """Float forward of BasicNet (torch flavour) in plain lax ops.

    Matches ``BasicNet.apply`` (verified in tests); optionally records each
    quantizable layer's input amax into ``collect`` for calibration.
    """
    enc, dec = params["encoder"], params["decoder"]

    def track(name, v):
        if collect is not None:
            collect[name] = max(
                collect.get(name, 0.0), float(jnp.max(jnp.abs(v)))
            )
        return v

    h = x
    for s, mult in enumerate((1, 2, 4)):
        c1, c2, c3 = (enc[f"conv{3 * s + k + 1}"] for k in range(3))
        x1 = _leaky(_conv(track(f"conv{3*s+1}", h), c1["kernel"], 2)
                    + c1["bias"])
        x2 = _leaky(_conv(track(f"conv{3*s+2}", x1), c2["kernel"], 2)
                    + c2["bias"]) + x1
        x3 = _leaky(_conv(track(f"conv{3*s+3}", x2), c3["kernel"], 2)
                    + c3["bias"]) + x2
        h = _leaky(_pool(x3)) if s < 2 else x3

    d1, d2, d3, d4 = (dec[n] for n in _DEC)
    y1 = _leaky(_deconv_s2(track("deconv1", h), d1["kernel"]) + d1["bias"])
    y2 = _leaky(_deconv_s1(track("deconv2", y1), d2["kernel"])
                + d2["bias"]) + y1
    y3 = _leaky(_deconv_s1(track("deconv3", y2), d3["kernel"])
                + d3["bias"]) + y2
    return _leaky(_deconv_s2(track("deconv4", y3), d4["kernel"]) + d4["bias"])


def calibrate(params, frames, batch: int = 32) -> dict[str, float]:
    """Per-layer input amax over calibration frames (symmetric scales)."""
    collect: dict[str, float] = {}
    for i in range(0, min(len(frames), 4 * batch), batch):
        chunk = jnp.asarray(frames[i : i + batch], jnp.float32)
        reference_forward(
            jax.tree_util.tree_map(jnp.asarray, params), chunk, collect
        )
    return {k: v / 127.0 for k, v in collect.items()}


def quantize_params(params, act_scales: dict[str, float]):
    """Precompute int8 weights + per-channel dequant multipliers."""
    enc, dec = params["encoder"], params["decoder"]
    q: dict[str, dict] = {}
    for name in list(act_scales):
        layer = enc[name] if name.startswith("conv") else dec[name]
        w = np.asarray(layer["kernel"], np.float32)
        s_w = np.abs(w).max(axis=(0, 1, 2)) / 127.0  # per out channel
        s_w = np.maximum(s_w, 1e-12)
        w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
        # floor s_x like s_w: an all-zero calibration input (blank frames)
        # must not produce 1/0 at forward-build time
        s_x = max(float(act_scales[name]), 1e-12)
        q[name] = {
            "w_q": jnp.asarray(w_q),
            "bias": jnp.asarray(layer["bias"], np.float32),
            # dequant multiplier: s_x * s_w per output channel
            "mult": jnp.asarray(s_x * s_w, np.float32),
            "s_x": s_x,
        }
    return q


def make_quantized_fused_forward(
    model: BasicNet, params, act_scales, out_dtype=jnp.float32,
    interpret: bool = False, max_chunk: int = 8,
):
    """int8 forward with Pallas-fused encoder stages.

    Same arithmetic as :func:`make_quantized_forward` (scales, bf16 skips)
    with each encoder stage's requant chain kept in VMEM
    (ops/pallas_qconv.py); the decoder runs the XLA int8 path on the
    pre-quantized latent.
    """
    from ..ops.pallas_qconv import fused_quantized_stage

    assert model.flavor == "torch"
    q = quantize_params(params, act_scales)

    def stage_args(s):
        names = [f"conv{3 * s + k + 1}" for k in range(3)]
        args = []
        for n in names:
            args += [q[n]["w_q"], q[n]["mult"], q[n]["bias"]]
        return args

    inv = {n: 1.0 / q[n]["s_x"] for n in q}

    def encoder_int8(x):
        """(B, H, W, C) float -> int8 latent at deconv1's input scale."""
        h = jnp.clip(
            jnp.round((x.astype(jnp.bfloat16)
                       * jnp.bfloat16(inv["conv1"])).astype(jnp.float32)),
            -127, 127,
        ).astype(jnp.int8)
        for s in range(3):
            n2, n3 = f"conv{3 * s + 2}", f"conv{3 * s + 3}"
            nxt = f"conv{3 * s + 4}" if s < 2 else "deconv1"
            h = fused_quantized_stage(
                h, *stage_args(s),
                inv_s2=inv[n2], inv_s3=inv[n3], inv_out=inv[nxt],
                pool=s < 2, interpret=interpret,
            )
            if s < 2:
                # int8 2x2 max-pool (commutes with the in-kernel
                # quant(leaky(.)), so identical to pooling before quant)
                bb, hh, ww, cc = h.shape
                h = jnp.max(
                    h.reshape(bb, hh // 2, 2, ww // 2, 2, cc), axis=(2, 4)
                )
        return h

    def qconv_pre(name, x_q, conv_fn):
        layer = q[name]
        y = conv_fn(x_q, layer["w_q"]).astype(jnp.float32)
        return y * layer["mult"] + layer["bias"]

    def qconv(name, x, conv_fn):
        layer = q[name]
        x_q = jnp.clip(
            jnp.round((x * jnp.bfloat16(1.0 / layer["s_x"])).astype(
                jnp.float32)), -127, 127,
        ).astype(jnp.int8)
        return qconv_pre(name, x_q, conv_fn)

    def b16(v):
        return v.astype(jnp.bfloat16)

    def forward(x):
        from .fast_infer import chunked_batch_map

        # max_chunk caps the pallas grid per call (8 was the round-2
        # compile-helper ceiling; the round-5 toolchain accepts larger
        # grids — scripts/exp_fused_stage_bench.py sweeps this)
        lat = chunked_batch_map(encoder_int8, x, max_chunk=max_chunk)
        d2s = lambda a, w: _deconv_s2(a, w, acc=jnp.int32)
        d1s = lambda a, w: _deconv_s1(a, w, acc=jnp.int32)
        y1 = b16(_leaky(qconv_pre("deconv1", lat, d2s)))
        y2 = b16(_leaky(qconv("deconv2", y1, d1s))) + y1
        y3 = b16(_leaky(qconv("deconv3", y2, d1s))) + y2
        return _leaky(qconv("deconv4", y3, d2s)).astype(out_dtype)

    return forward


def make_quantized_resident_forward(
    model: BasicNet, params, act_scales, out_dtype=jnp.bfloat16
):
    """int8-resident forward: activations *stored* int8 between layers.

    The profiled bottleneck of the int8 path is HBM, not the MXU (convs run
    ~450 GB/s memory-bound with bf16 inter-layer activations). Here every
    layer's output is requantized to the next layer's input scale inside the
    conv epilogue, so the tensors that actually round-trip HBM are int8 —
    half the traffic. Two exact identities keep the math aligned with
    :func:`make_quantized_forward`:

    * residual adds read the stored int8 activation dequantized by its own
      scale (adds one quantization of noise on the skip path — peak-decode
      parity is verified on trained models in tests/test_quantized.py);
    * ``quant(leaky(.))`` is monotone, so the 2x2 max-pool commutes with it
      and pools int8 directly.

    Returns ``fn(frames) -> heatmaps`` (``out_dtype``), jittable.
    """
    assert model.flavor == "torch"
    q = quantize_params(params, act_scales)
    inv = {n: jnp.bfloat16(1.0 / q[n]["s_x"]) for n in q}

    def quant_to(name, x):
        """f32 activation -> int8 at layer ``name``'s input scale."""
        return jnp.clip(
            jnp.round((x.astype(jnp.bfloat16) * inv[name]).astype(
                jnp.float32)), -127, 127,
        ).astype(jnp.int8)

    def qconv(name, x_q, conv_fn):
        layer = q[name]
        y = conv_fn(x_q, layer["w_q"]).astype(jnp.float32)
        return y * layer["mult"] + layer["bias"]

    def dq(name, x_q):
        """Stored int8 at ``name``'s scale -> f32 (for residual adds)."""
        return x_q.astype(jnp.float32) * jnp.float32(q[name]["s_x"])

    def forward(x):
        c2 = lambda a, w: _conv(a, w, 2, acc=jnp.int32)
        d2s = lambda a, w: _deconv_s2(a, w, acc=jnp.int32)
        d1s = lambda a, w: _deconv_s1(a, w, acc=jnp.int32)

        h = quant_to("conv1", x.astype(jnp.float32))
        for s in range(3):
            n1, n2, n3 = (f"conv{3 * s + k + 1}" for k in range(3))
            nxt = f"conv{3 * s + 4}" if s < 2 else "deconv1"
            q1 = quant_to(n2, _leaky(qconv(n1, h, c2)))
            x2 = _leaky(qconv(n2, q1, c2)) + dq(n2, q1)
            q2 = quant_to(n3, x2)
            x3 = _leaky(qconv(n3, q2, c2)) + dq(n3, q2)
            if s < 2:
                # quant(leaky(.)) is monotone -> pool the int8 directly
                h = _pool(quant_to(nxt, _leaky(x3)))
            else:
                h = quant_to(nxt, x3)
        y1 = _leaky(qconv("deconv1", h, d2s))
        q1 = quant_to("deconv2", y1)
        y2 = _leaky(qconv("deconv2", q1, d1s)) + dq("deconv2", q1)
        q2 = quant_to("deconv3", y2)
        y3 = _leaky(qconv("deconv3", q2, d1s)) + dq("deconv3", q2)
        q3 = quant_to("deconv4", y3)
        return _leaky(qconv("deconv4", q3, d2s)).astype(out_dtype)

    return forward


def make_quantized_forward(
    model: BasicNet, params, act_scales, out_dtype=jnp.float32
):
    """Build an int8 forward numerically tracking BasicNet (torch flavour).

    Returns ``fn(frames) -> heatmaps`` (``out_dtype``), jittable. bf16
    output halves the final heatmap write (argmax decode is unaffected).
    """
    assert model.flavor == "torch"
    q = quantize_params(params, act_scales)

    def qconv(name, x, conv_fn):
        layer = q[name]
        inv = jnp.bfloat16(1.0 / layer["s_x"])
        x_q = jnp.clip(
            jnp.round((x * inv).astype(jnp.float32)), -127, 127
        ).astype(jnp.int8)
        y = conv_fn(x_q, layer["w_q"]).astype(jnp.float32)
        return y * layer["mult"] + layer["bias"]

    # inter-layer activations stay bf16 (half the HBM traffic); dequant +
    # bias + LeakyReLU fold into the conv epilogue, quantize into the next
    # layer's prologue.
    def b16(v):
        return v.astype(jnp.bfloat16)

    def forward(x):
        h = x.astype(jnp.bfloat16)
        for s in range(3):
            n1, n2, n3 = (f"conv{3 * s + k + 1}" for k in range(3))
            c2 = lambda a, w: _conv(a, w, 2, acc=jnp.int32)
            x1 = b16(_leaky(qconv(n1, h, c2)))
            x2 = b16(_leaky(qconv(n2, x1, c2))) + x1
            x3 = b16(_leaky(qconv(n3, x2, c2))) + x2
            h = _leaky(_pool(x3)) if s < 2 else x3
        d2s = lambda a, w: _deconv_s2(a, w, acc=jnp.int32)
        d1s = lambda a, w: _deconv_s1(a, w, acc=jnp.int32)
        y1 = b16(_leaky(qconv("deconv1", h, d2s)))
        y2 = b16(_leaky(qconv("deconv2", y1, d1s))) + y1
        y3 = b16(_leaky(qconv("deconv3", y2, d1s))) + y2
        return _leaky(qconv("deconv4", y3, d2s)).astype(out_dtype)

    return forward
