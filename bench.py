"""Headline benchmark: batched heatmap inference throughput (frames/sec/chip).

The BASELINE target surface (BASELINE.md): >=5,000 frames/sec/chip batched
heatmap inference with on-device peak decode on the flagship
``MODEL_18_POINTS_PER_WING`` CNN (192x192x4 in, 18 heatmaps out), the
reference's inference-as-practiced path (model.predict + tf_find_peaks,
reference: tensorflow/preprocessor.py:657-689) fused into one jitted
device-resident program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 5000.0


def main() -> None:
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.models import build_model
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
    def infer(params, frames):
        """frames -> (heatmaps-decoded) keypoints [x, y, val] per channel."""
        maps = model.apply({"params": params}, frames, train=False)
        return peaks.find_peaks_with_vals(maps)

    rng = np.random.default_rng(0)
    chunks = [
        jnp.asarray(rng.random((batch, hw, hw, in_ch), np.float32), jnp.bfloat16)
        for _ in range(n_chunks)
    ]

    # warmup / compile (np.asarray forces a real device round-trip — some
    # remote backends return from block_until_ready before execution ends)
    np.asarray(infer(params, chunks[0]))

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [infer(params, c) for c in chunks]  # pipelined dispatch
        for o in outs:
            np.asarray(o)  # fetch decoded keypoints (B, 3, K) — tiny
        dt = time.perf_counter() - t0
        best = max(best, batch * n_chunks / dt)

    fps = best
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
