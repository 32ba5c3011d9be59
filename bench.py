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

A second, driver-visible metric: full train-step throughput (gather ->
on-device augmentation -> fwd -> bwd -> Adam, the whole jitted program) in
frames/sec/chip, measured with the same single-dispatch ``lax.scan`` +
marginal-rate methodology at batch 256 with full augmentation (the
self-reported round-1 number this makes reproducible).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"train_step_throughput": {"value", "unit"}}.

``--train`` / ``--infer`` run just one side (default: both).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: repeat bench runs skip the multi-minute
# train-step compile (same cache the test suite uses)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

BASELINE_FPS = 5000.0
B = 1024
K_SMALL, K_LARGE = 4, 20
TRAIN_B = 256
TRAIN_K_SMALL, TRAIN_K_LARGE = 2, 8


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
    dt = t_l - t_s
    if dt <= 1e-6:
        # timing noise ate the marginal (preempted host / jittery relay):
        # fall back to the conservative whole-run rate instead of printing
        # an absurd 1e13 fps headline
        print(
            f"[bench] marginal time degenerate (t_s={t_s:.3f}, "
            f"t_l={t_l:.3f}); using whole-run rate", file=sys.stderr,
        )
        return K_LARGE * B / t_l
    return (K_LARGE - K_SMALL) * B / dt


def bench_train() -> float:
    """Train-step frames/sec/chip: flagship model, batch 256, 192px, full
    on-device augmentation (rotation +-15 deg, shifts, flips), MSE loss,
    one Adam update per step. K steps chain inside ONE jitted lax.scan;
    at K=8 the program runs ~2 s so per-dispatch overhead (<50 ms) is noise
    and direct timing suffices — ONE compile, unlike the inference paths'
    marginal-rate pairs (the train step is the expensive compile here)."""
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.models import build_model
    from pose_estimation_amitai_tpu.train.loop import (
        create_train_state, make_train_step,
    )

    hw, in_ch, out_ch, n_data = 192, 4, 18, 2048
    cfg = Config(
        batch_size=TRAIN_B, do_augmentations=True, rotation_range=15.0,
        xy_shifts=10.0, zoom_range=(0.9, 1.1), dropout_ratio=0.0,
    )
    model = build_model(cfg, (hw, hw, in_ch), out_ch)
    rng = np.random.default_rng(0)
    data = {
        "box": jnp.asarray(rng.random((n_data, hw, hw, in_ch), np.float32)),
        "peaks": jnp.asarray(
            rng.uniform(20, hw - 20, (n_data, out_ch, 2)).astype(np.float32)
        ),
        "peak_vals": jnp.ones((n_data, out_ch), jnp.float32),
    }
    sample = {"image": jnp.zeros((TRAIN_B, hw, hw, in_ch), jnp.float32)}
    state = create_train_state(model, cfg, sample)
    train_step = make_train_step(model, cfg)

    K = TRAIN_K_LARGE
    idx_all = jnp.asarray(
        rng.integers(0, n_data, (K, 1, TRAIN_B)).astype(np.int32)
    )

    @jax.jit
    def run(state, data, idx_all):
        def body(st, idx):
            st, loss = train_step(st, data, idx, 1.0)
            return st, loss

        _, losses = jax.lax.scan(body, state, idx_all)
        return losses

    t0 = time.perf_counter()
    np.asarray(run(state, data, idx_all))  # compile + warm
    print(f"[bench] train-step compile+warm {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

    def timed():
        t0 = time.perf_counter()
        np.asarray(run(state, data, idx_all))
        return time.perf_counter() - t0

    t = min(timed() for _ in range(3))
    return K * TRAIN_B / t


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
    except Exception as e:
        print(f"[bench] int8_resident path failed: {e!r}", file=sys.stderr)
    try:
        if scales is not None:
            qf = make_quantized_forward(
                model, params, scales, out_dtype=jnp.bfloat16
            )
            results["int8"] = _marginal_fps(scan_runner(lambda f: qf(f)))
    except Exception as e:
        print(f"[bench] int8 path failed: {e!r}", file=sys.stderr)
    try:
        if not results:
            results["bf16"] = _marginal_fps(scan_runner(xla_forward))
    except Exception as e:
        print(f"[bench] bf16 path failed: {e!r}", file=sys.stderr)
        if not results:
            raise

    fps = max(results.values())
    out = {
        "metric": "heatmap_inference_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }
    if "--infer" not in sys.argv:
        try:
            out["train_step_throughput"] = {
                "value": round(bench_train(), 1),
                "unit": "frames/sec/chip",
            }
        except Exception as e:  # train bench must never sink the headline
            out["train_step_throughput"] = {"error": repr(e)[:200]}
    print(json.dumps(out))


if __name__ == "__main__":
    if "--train" in sys.argv:
        fps = bench_train()
        print(
            json.dumps(
                {
                    "metric": "train_step_throughput",
                    "value": round(fps, 1),
                    "unit": "frames/sec/chip",
                }
            )
        )
    else:
        main()
