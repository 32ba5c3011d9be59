"""Zoo-wide inference throughput: every serving-relevant model family.

bench.py measures the flagship BasicNet headline (its int8-resident path is
hand-written in models/quantized.py). This script measures the REST of the
zoo — ViT, 4-camera fusion CNN, 4-camera ViT, camera-matrix disentangled,
ResNet, GPTNet — in bf16 and through the generic int8 interceptor
(models/quantized_generic.py), demonstrating the whole model family is
production-servable, not just the flagship.

Same methodology as bench.py: each movie loop is ONE jitted ``lax.scan``
over K batches and throughput is the marginal rate between two K values
(cancels dispatch/fetch overhead through the remote-attached runtime).
On-device peak decode is included, like the headline path.

Frame accounting: 4-camera models consume 4 camera frames per sample, so
both samples/s and frames/s (= 4x samples/s) are reported; single-view
models have frames/s == samples/s. Inputs are 192x192 like production.

Run: ``python scripts/bench_zoo.py [model ...]`` (default: all). Prints one
JSON line per model and a final summary table to stderr.

Reference parity note: the reference serves every family the same way —
float ``model.predict`` + argmax (SURVEY §3.5); quantized serving is
TPU-added capability, decode parity vs float is tested in
tests/test_quantized.py.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.models import build_model, needs_camera_matrices
from pose_estimation_amitai_tpu.models.quantized_generic import (
    calibrate_apply,
    conv_layers_only,
    make_quantized_apply,
)
from pose_estimation_amitai_tpu.ops import peaks

HW = 192
K_SMALL, K_LARGE = 2, 8

# families with both a Dense transformer trunk (faster bf16) and a conv
# decoder (faster int8): measure the layer_filter mixed-precision path too
MIXED = {"vit", "vit4cam"}

# model key -> (model_type, in_channels, out_channels, cams, batch)
ZOO = {
    # batch 768 = the round-5 serving default for this family (+1-4.5%
    # over 512, scripts/exp_vit_fused.py)
    "vit": (C.MODEL_18_POINTS_PER_WING_VIT, 4, 18, 1, 768),
    "multicam": (C.ALL_CAMS_18_POINTS, 16, 72, 4, 256),
    "vit4cam": (C.ALL_CAMS_18_POINTS_VIT, 16, 72, 4, 128),
    "disentangled": (C.ALL_CAMS_DISENTANGLED_PER_WING_CNN, 16, 72, 4, 128),
    "resnet": (C.RESNET_18_POINTS_PER_WING, 4, 18, 1, 256),
    "gptnet": (C.GPTNET, 4, 18, 1, 256),
}


def _cameras(batch: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Plausible per-sample 3x4 projection matrices + normalised pinvs
    (the contract CameraMatrixGenerator produces — P @ P_inv ~ s*I3)."""
    rng = np.random.default_rng(7)
    P = np.tile(np.eye(3, 4, dtype=np.float32), (batch, 4, 1, 1))
    P += rng.normal(0, 0.05, P.shape).astype(np.float32)
    P_inv = np.linalg.pinv(P)
    P_inv /= np.linalg.norm(P_inv, axis=(-2, -1), keepdims=True)
    return jnp.asarray(P), jnp.asarray(P_inv)


def bench_one(key: str, budget_s: float = 420.0) -> dict:
    model_type, in_ch, out_ch, cams, batch = ZOO[key]
    cfg = Config(model_type=model_type, dropout_ratio=0.0)
    hw = HW
    model = build_model(cfg, (hw, hw, in_ch), out_ch)
    if batch >= 128 and getattr(model, "fold_views", None) is True:
        # large-batch regime: unfolded (XLA sequences the views, so peak
        # memory stays one view's activations and the batch can grow to
        # the throughput-optimal size) — mirrors infer.Predictor
        model = model.clone(fold_views=False)
    if getattr(model, "normalize_output", None) is True:
        # peaks-only serving (this bench decodes peaks, like
        # infer.Predictor's argmax path): the ViT decoder's per-sample
        # min-max is monotonic -> argmax-invariant; skip its f32 HBM passes
        model = model.clone(normalize_output=False)
    if getattr(model, "fast_softmax", None) is False and \
            "--exact-softmax" not in sys.argv:
        # bf16 softmax chain (argmax-parity pinned in tests/test_models.py)
        # — mirrors infer.Predictor's argmax peaks-only serving default
        model = model.clone(fast_softmax=True)
    # fused_serving (merged V/out) measured ~10% SLOWER than the einsum
    # form on v5e (scripts/exp_vit_fused.py) — not engaged

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((batch, hw, hw, in_ch)), jnp.bfloat16)
    extra = ()
    if needs_camera_matrices(model_type):
        extra = _cameras(batch)

    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, hw, hw, in_ch), jnp.bfloat16),
        *(e[:1] for e in extra),
        train=False,
    )
    variables = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), variables
    )

    def float_forward(frames, *args):
        return model.apply(variables, frames, *args, train=False)

    calib = [(np.asarray(base[:8], np.float32),) + tuple(e[:8] for e in extra)]
    scales = calibrate_apply(model, variables, calib)
    int8_forward = make_quantized_apply(
        model, variables, scales, out_dtype=jnp.bfloat16
    )

    def scan_runner(forward):
        def make(K):
            @jax.jit
            def run(base, *args):
                def body(c, i):
                    frames = base * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
                    return c, peaks.find_peaks_with_vals(
                        forward(frames, *args)
                    )

                _, out = jax.lax.scan(body, 0, jnp.arange(K))
                return out

            return lambda: run(base, *extra)

        return make

    def marginal_fps(make_run) -> float:
        t_start = time.perf_counter()
        r_small, r_large = make_run(K_SMALL), make_run(K_LARGE)
        np.asarray(jax.tree_util.tree_leaves(r_small())[0])
        np.asarray(jax.tree_util.tree_leaves(r_large())[0])

        def timed(fn):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(fn())[0])
            return time.perf_counter() - t0

        t_s, t_l = timed(r_small), timed(r_large)
        for _ in range(2):
            if time.perf_counter() - t_start > budget_s:
                break
            t_s = min(t_s, timed(r_small))
            t_l = min(t_l, timed(r_large))
        return (K_LARGE - K_SMALL) * batch / max(t_l - t_s, 1e-9)

    out = {"model": key, "model_type": model_type, "batch": batch}
    sps_f = marginal_fps(scan_runner(float_forward))
    out["bf16_samples_per_s"] = round(sps_f, 1)
    try:
        sps_q = marginal_fps(scan_runner(int8_forward))
        out["int8_samples_per_s"] = round(sps_q, 1)
    except Exception as e:  # pragma: no cover - diagnostic surface
        out["int8_error"] = repr(e)[:200]
        sps_q = 0.0
    sps_m = 0.0
    if key in MIXED:
        # mixed precision: int8 conv stack + bf16 transformer trunk
        mixed_scales = calibrate_apply(
            model, variables, calib, layer_filter=conv_layers_only
        )
        mixed_forward = make_quantized_apply(
            model, variables, mixed_scales, out_dtype=jnp.bfloat16
        )
        try:
            sps_m = marginal_fps(scan_runner(mixed_forward))
            out["mixed_samples_per_s"] = round(sps_m, 1)
        except Exception as e:  # pragma: no cover - diagnostic surface
            out["mixed_error"] = repr(e)[:200]
    best = max(sps_f, sps_q, sps_m)
    out["frames_per_s"] = round(best * cams, 1)
    out["cams"] = cams
    return out


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(ZOO)
    rows = []
    for name in names:
        t0 = time.perf_counter()
        r = bench_one(name)
        r["bench_wall_s"] = round(time.perf_counter() - t0, 1)
        rows.append(r)
        print(json.dumps(r), flush=True)
    print(
        f"{'model':14s} {'batch':>5s} {'bf16 sps':>10s} {'int8 sps':>10s}"
        f" {'mixed sps':>10s} {'frames/s':>10s}",
        file=sys.stderr,
    )
    for r in rows:
        print(
            f"{r['model']:14s} {r['batch']:5d}"
            f" {r.get('bf16_samples_per_s', 0):10.0f}"
            f" {r.get('int8_samples_per_s', 0):10.0f}"
            f" {r.get('mixed_samples_per_s', 0):10.0f}"
            f" {r['frames_per_s']:10.0f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
