"""Headline benchmark: batched heatmap inference throughput (frames/sec/chip).

The BASELINE target surface (BASELINE.md): >=5,000 frames/sec/chip batched
heatmap inference with on-device peak decode on the flagship
``MODEL_18_POINTS_PER_WING`` CNN (192x192x4 in, 18 heatmaps out), the
reference's inference-as-practiced path (model.predict + tf_find_peaks,
reference: tensorflow/preprocessor.py:657-689) fused into one jitted
device-resident program.

Two implementations are measured and the faster wins:
* pure XLA forward (flax convs)
* Pallas fused-encoder path (ops/pallas_conv.py)

Timing forces host fetches of the (tiny) decoded outputs — on remote-attached
backends ``block_until_ready`` can return before execution finishes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 5000.0


def _measure(fn, params, chunks, trials=3, budget_s=240.0):
    t_start = time.perf_counter()
    np.asarray(fn(params, chunks[0]))  # compile + warm
    best = 0.0
    n = sum(c.shape[0] for c in chunks)
    for _ in range(trials):
        t0 = time.perf_counter()
        outs = [fn(params, c) for c in chunks]  # pipelined dispatch
        for o in outs:
            np.asarray(o)  # fetch decoded keypoints (B, 3, K) — tiny
        best = max(best, n / (time.perf_counter() - t0))
        if time.perf_counter() - t_start > budget_s:
            break  # degraded backend — don't burn the driver's time budget
    return best


def main() -> None:
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.models import build_model
    from pose_estimation_amitai_tpu.models.fast_infer import (
        basicnet_apply_fused,
    )
    from pose_estimation_amitai_tpu.ops import peaks

    hw, in_ch, out_ch = 192, 4, 18
    batch, n_chunks = 512, 8

    cfg = Config()
    model = build_model(cfg, (hw, hw, in_ch), out_ch)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, hw, hw, in_ch), jnp.bfloat16),
        train=False,
    )["params"]

    @jax.jit
    def infer_xla(params, frames):
        maps = model.apply({"params": params}, frames, train=False)
        return peaks.find_peaks_with_vals(maps)

    @jax.jit
    def infer_fused(params, frames):
        maps = basicnet_apply_fused(model, params, frames)
        return peaks.find_peaks_with_vals(maps)

    rng = np.random.default_rng(0)
    chunks = [
        jnp.asarray(rng.random((batch, hw, hw, in_ch), np.float32), jnp.bfloat16)
        for _ in range(n_chunks)
    ]

    t0 = time.perf_counter()
    fps_xla = _measure(infer_xla, params, chunks)
    xla_took = time.perf_counter() - t0
    fps_fused = 0.0
    if xla_took < 300.0:  # skip the second path on a degraded backend
        try:
            fps_fused = _measure(infer_fused, params, chunks)
        except Exception:
            fps_fused = 0.0
    fps = max(fps_xla, fps_fused)

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
