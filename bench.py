"""Headline benchmark: batched heatmap inference throughput (frames/sec/chip).

The BASELINE target surface (BASELINE.md): >=5,000 frames/sec/chip batched
heatmap inference with on-device peak decode on the flagship
``MODEL_18_POINTS_PER_WING`` CNN (192x192x4 in, 18 heatmaps out) — the
reference's inference-as-practiced path (model.predict + tf_find_peaks,
reference: tensorflow/preprocessor.py:657-689) as one jitted device-resident
program.

Measured paths (the faster wins):
* int8-resident (models/quantized.py make_quantized_resident_forward —
  activations *stored* int8 between layers; the profiled bottleneck is HBM,
  so halving activation traffic beats the MXU-rate argument; peak parity
  verified in tests/test_quantized.py)
* calibrated int8 with bf16 activations (v5e MXU runs int8 at 2x bf16)
* bf16 XLA forward (flax convs)

Methodology: the whole movie loop runs as ONE jitted ``lax.scan`` over K
batches (per-dispatch overhead through remote-attached runtimes can reach
tens of ms) and throughput is the MARGINAL rate between two K values, which
cancels fixed dispatch/fetch overhead. Host fetches are forced with
``np.asarray`` — ``block_until_ready`` can return early on remote backends.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 5000.0
B = 1024
K_SMALL, K_LARGE = 4, 20


def _marginal_fps(make_run, budget_s=420.0):
    """fps from the marginal time between K_SMALL and K_LARGE scan lengths."""
    t_start = time.perf_counter()
    r_small, r_large = make_run(K_SMALL), make_run(K_LARGE)
    np.asarray(r_small())  # compile + warm
    np.asarray(r_large())

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    t_s, t_l = timed(r_small), timed(r_large)
    for _ in range(2):
        if time.perf_counter() - t_start > budget_s:
            break
        t_s = min(t_s, timed(r_small))
        t_l = min(t_l, timed(r_large))
    return (K_LARGE - K_SMALL) * B / max(t_l - t_s, 1e-9)


def main() -> None:
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.models import build_model
    from pose_estimation_amitai_tpu.models.quantized import (
        calibrate,
        make_quantized_forward,
        make_quantized_resident_forward,
    )
    from pose_estimation_amitai_tpu.ops import peaks

    hw, in_ch, out_ch = 192, 4, 18
    cfg = Config()
    model = build_model(cfg, (hw, hw, in_ch), out_ch)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32),
        model.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, hw, hw, in_ch), jnp.bfloat16),
            train=False,
        )["params"],
    )
    rng = np.random.default_rng(0)
    base = jnp.asarray(
        rng.random((B, hw, hw, in_ch), np.float32), jnp.bfloat16
    )

    def scan_runner(forward):
        def make(K):
            @jax.jit
            def run(params, base):
                def body(c, i):
                    frames = base * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
                    return c, peaks.find_peaks_with_vals(forward(frames))

                _, out = jax.lax.scan(body, 0, jnp.arange(K))
                return out

            return lambda: run(params, base)

        return make

    def xla_forward(frames):
        return model.apply({"params": params}, frames, train=False)

    results = {}
    scales = None
    try:
        scales = calibrate(
            params, rng.random((8, hw, hw, in_ch)).astype(np.float32),
            batch=4,
        )
        qr = make_quantized_resident_forward(
            model, params, scales, out_dtype=jnp.bfloat16
        )
        results["int8_resident"] = _marginal_fps(
            scan_runner(lambda f: qr(f))
        )
    except Exception:
        pass
    try:
        if scales is not None:
            qf = make_quantized_forward(
                model, params, scales, out_dtype=jnp.bfloat16
            )
            results["int8"] = _marginal_fps(scan_runner(lambda f: qf(f)))
    except Exception:
        pass
    try:
        if not results:
            results["bf16"] = _marginal_fps(scan_runner(xla_forward))
    except Exception:
        if not results:
            raise

    fps = max(results.values())
    print(
        json.dumps(
            {
                "metric": "heatmap_inference_throughput",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
