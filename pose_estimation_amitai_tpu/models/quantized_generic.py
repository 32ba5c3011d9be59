"""Generic calibrated-int8 serving for every model family.

:mod:`.quantized` hand-writes the int8 forward of the flagship BasicNet (the
fastest path — its layer chain is known statically). This module generalises
int8 serving to the rest of the model zoo (ViT, 4-camera fusion,
disentangled, ResNet) without per-architecture forwards: a flax *method
interceptor* rewrites every ``nn.Dense`` / ``nn.Conv`` / ``nn.ConvTranspose``
application inside ``model.apply`` into an int8 x int8 -> int32 MXU op with a
dequant epilogue, leaving everything else (LayerNorm, softmax, BatchNorm
running stats, residuals, min-max normalisation) in float exactly as the
float model computes it.

Scheme (same as models/quantized.py): symmetric per-tensor activation scales
calibrated as amax/127 over sample batches, symmetric per-output-channel
weight scales. Measured (scripts/bench_zoo.py, v5e-1): the conv families
gain from int8; the ViT family does NOT — its medium matmuls
(144-576 tokens x dim 256) are bound by the LayerNorm/softmax VPU chain,
so the per-layer quantize/dequantize overhead exceeds the MXU-rate gain
and bf16 serves faster. Serve with whichever path bench_zoo.py shows
fastest for the model family.

Mixed-precision serving: ``layer_filter`` restricts quantisation to a
subset of layers — ``conv_layers_only`` keeps the transformer trunk
(Dense/LN/softmax) in bf16 while the CNN decoder's conv stack runs int8,
capturing the conv-family gain inside the ViT models without paying the
attention-matmul quantisation penalty.

The reference has no quantized serving at all (its inference-as-practiced is
``model.predict`` in float, SURVEY §3.5) — this is TPU-added capability, and
peak-decode parity with each float model is what tests/test_quantized.py
verifies.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

_QUANT_TYPES = (nn.Dense, nn.Conv, nn.ConvTranspose)


def conv_layers_only(module: nn.Module) -> bool:
    """``layer_filter``: quantise Conv/ConvTranspose, keep Dense in float.

    The mixed-precision serving mode for the ViT families: their decoder
    conv stack gains from int8 on the MXU while the transformer trunk's
    Dense chain (bound by the LayerNorm/softmax VPU work around it) serves
    faster in bf16 (DESIGN.md serving findings). The patch-embedding stem
    conv is explicitly EXCLUDED even though it is an ``nn.Conv``: it feeds
    every token of the (kept-float) trunk, so quantising it would inject
    int8 error into the highest-sensitivity layer for no decoder-side gain.
    """
    if not isinstance(module, (nn.Conv, nn.ConvTranspose)):
        return False
    return "patch_embed" not in module.path


def _path_key(module: nn.Module) -> str:
    return "/".join(module.path)


def _canon_padding(padding, rank: int):
    """flax-style padding canonicalisation for the cases the zoo uses."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * rank
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def _tuple_arg(v, rank: int):
    if v is None:
        return (1,) * rank
    if isinstance(v, int):
        return (v,) * rank
    return tuple(v)


def _quant_tensor(x: jax.Array, scale) -> jax.Array:
    inv = jnp.asarray(1.0 / scale, jnp.bfloat16)
    return jnp.clip(
        jnp.round((x.astype(jnp.bfloat16) * inv).astype(jnp.float32)),
        -127, 127,
    ).astype(jnp.int8)


def _weight_scales(kernel: jax.Array) -> jax.Array:
    """Per-output-channel (last axis) symmetric scales."""
    axes = tuple(range(kernel.ndim - 1))
    s = jnp.max(jnp.abs(kernel), axis=axes) / 127.0
    return jnp.maximum(s, 1e-12)


def _apply_quantized(module: nn.Module, x: jax.Array, s_x: float) -> jax.Array:
    """int8 re-implementation of one Dense/Conv/ConvTranspose application."""
    params = module.variables["params"]
    kernel = jnp.asarray(params["kernel"], jnp.float32)
    s_w = _weight_scales(kernel)
    w_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    x_q = _quant_tensor(x, s_x)

    if isinstance(module, nn.Dense):
        y = lax.dot_general(
            x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        rank = kernel.ndim - 2
        # collapse extra batch dims the way flax does (none in this zoo)
        assert x_q.ndim == rank + 2, "unexpected batched conv input rank"
        strides = _tuple_arg(getattr(module, "strides", None), rank)
        kdil = _tuple_arg(getattr(module, "kernel_dilation", None), rank)
        padding = _canon_padding(module.padding, rank)
        spatial = "DHW"[-rank:] if rank <= 3 else None
        dn = lax.conv_dimension_numbers(
            x_q.shape, w_q.shape,
            (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"),
        )
        if isinstance(module, nn.ConvTranspose):
            assert not module.transpose_kernel
            y = lax.conv_transpose(
                x_q, w_q, strides, padding, rhs_dilation=kdil,
                transpose_kernel=False,
                preferred_element_type=jnp.int32,
            )
        else:
            idil = _tuple_arg(getattr(module, "input_dilation", None), rank)
            y = lax.conv_general_dilated(
                x_q, w_q, strides, padding,
                lhs_dilation=idil, rhs_dilation=kdil,
                dimension_numbers=dn,
                feature_group_count=module.feature_group_count,
                preferred_element_type=jnp.int32,
            )
    # dequant epilogue (XLA fuses into the int32 accumulate)
    y = y.astype(jnp.float32) * (jnp.float32(s_x) * s_w)
    if module.use_bias:
        y = y + jnp.asarray(params["bias"], jnp.float32)
    if module.dtype is not None:
        y = y.astype(module.dtype)
    return y


def calibrate_apply(
    model: nn.Module,
    variables: dict | Any,
    sample_inputs: list[tuple],
    layer_filter: Callable[[nn.Module], bool] | None = None,
    **apply_kwargs,
) -> dict[str, float]:
    """Record per-layer input amax/127 over calibration batches.

    ``variables`` is either a full variables dict or bare params;
    ``sample_inputs`` is a list of positional-arg tuples for ``model.apply``.
    ``layer_filter`` restricts which layers are calibrated (and therefore
    quantised downstream — ``make_quantized_apply`` only rewrites layers
    present in the scales dict); e.g. :func:`conv_layers_only`.

    The instrumented forward runs under ``jax.jit``: the interceptor fires
    at trace time and the per-layer amax tracers become the program's
    outputs, so each calibration batch is ONE dispatched program instead of
    thousands of eager ops (the eager variant takes tens of minutes per
    batch through a remote-attached runtime).
    """
    if "params" not in variables:
        variables = {"params": variables}

    @jax.jit
    def traced_amax(inputs):
        local: dict[str, jax.Array] = {}

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if (
                isinstance(m, _QUANT_TYPES)
                and context.method_name == "__call__"
                and (layer_filter is None or layer_filter(m))
            ):
                key = _path_key(m)
                amax = jnp.max(jnp.abs(args[0])).astype(jnp.float32)
                prev = local.get(key)
                local[key] = amax if prev is None else jnp.maximum(prev, amax)
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, *inputs, train=False, **apply_kwargs)
        return local

    collect: dict[str, float] = {}
    for inputs in sample_inputs:
        for k, v in traced_amax(tuple(inputs)).items():
            collect[k] = max(collect.get(k, 0.0), float(v))
    # floor like _weight_scales: an all-zero calibration input for a layer
    # (dead branch / blank sample) must not produce scale 0 -> 1/0 in
    # _quant_tensor
    return {k: jnp.maximum(v / 127.0, 1e-12) for k, v in collect.items()}


def make_quantized_apply(
    model: nn.Module,
    variables: dict | Any,
    act_scales: dict[str, float],
    out_dtype=jnp.float32,
) -> Callable:
    """Build ``fn(*inputs) -> output``: the model's eval forward with every
    Dense/Conv/ConvTranspose running int8 on the MXU. Jittable."""
    if "params" not in variables:
        variables = {"params": variables}
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (
            isinstance(m, _QUANT_TYPES)
            and context.method_name == "__call__"
            and _path_key(m) in act_scales
            and getattr(m, "mask", None) is None
        ):
            return _apply_quantized(m, args[0], act_scales[_path_key(m)])
        return next_fun(*args, **kwargs)

    def forward(*inputs):
        with nn.intercept_methods(interceptor):
            out = model.apply(variables, *inputs, train=False)
        return jax.tree_util.tree_map(
            lambda t: t.astype(out_dtype), out
        )

    return forward


def quantize_predict_fn(
    model: nn.Module,
    variables: dict | Any,
    calibration_inputs: list[tuple] | np.ndarray,
    out_dtype=jnp.float32,
    layer_filter: Callable[[nn.Module], bool] | None = None,
) -> Callable:
    """Calibrate + build in one step.

    ``calibration_inputs``: list of positional-arg tuples, or a single
    frames array (split into chunks of 8 internally). ``layer_filter``
    selects the quantised subset (see :func:`conv_layers_only`).
    """
    if isinstance(calibration_inputs, (np.ndarray, jax.Array)):
        arr = np.asarray(calibration_inputs)
        calibration_inputs = [
            (jnp.asarray(arr[i : i + 8], jnp.float32),)
            for i in range(0, min(len(arr), 32), 8)
        ]
    scales = calibrate_apply(
        model, variables, calibration_inputs, layer_filter=layer_filter
    )
    return make_quantized_apply(model, variables, scales, out_dtype)
