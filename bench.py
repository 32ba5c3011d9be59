"""Headline benchmark: batched heatmap inference throughput (frames/sec/chip).

The BASELINE target surface (BASELINE.md): >=5,000 frames/sec/chip batched
heatmap inference with on-device peak decode on the flagship
``MODEL_18_POINTS_PER_WING`` CNN (192x192x4 in, 18 heatmaps out) — the
reference's inference-as-practiced path (model.predict + tf_find_peaks,
reference: tensorflow/preprocessor.py:657-689) as one jitted device-resident
program.

Design constraints (learned the hard way in round 2, BENCH_r02.json rc=124):
the driver runs ``python bench.py`` under an unknown timeout, so this script
has ONE global wall-clock deadline and prints its single headline JSON line
as soon as the known-best path (int8-resident serving) has a number.  A
watchdog thread force-emits whatever number exists if the deadline hits
mid-compile.  Optional refinements (marginal-rate pair, train-step metric)
run only with time to spare; they can improve the output but never delay or
sink it.

Measured path: int8-resident serving (models/quantized.py
make_quantized_resident_forward — activations *stored* int8 between layers;
the profiled bottleneck is HBM, so halving activation traffic beats the MXU
rate argument; peak parity verified in tests/test_quantized.py).  Calibration
scales are deterministic for the bench seed and pre-baked in
``bench_scales.npz`` so the driver run skips the calibration compile; the
fallback recomputes them.

Methodology: the whole movie loop runs as ONE jitted ``lax.scan`` over K
batches (per-dispatch overhead through remote-attached runtimes can reach
tens of ms).  The first number is the conservative whole-run rate at K_LARGE
(dispatch overhead dilutes to <1%).  With budget left, the rate is refined to
the MARGINAL rate between two K values, which cancels the fixed overhead
exactly.  Host fetches are forced with ``np.asarray``.

Prints the HEADLINE JSON line first:
  {"metric": "heatmap_inference_throughput", "value", "value_kind", "unit",
   "vs_baseline", "value_min", "value_max", "spread_kind", "repeats"
   [, "train_step_throughput", "train_step_throughput_rot180"]}
``value`` is the best rate and ``value_kind`` says which estimator it is
(``marginal_rate`` when the refinement lands, else ``whole_run_rate``);
``value_min``/``value_max`` are the observed per-repeat WHOLE-RUN rate
spread (``spread_kind`` says so) — a marginal ``value`` legitimately sits
above ``value_max`` because it cancels the fixed dispatch overhead the
whole-run rates still carry. The two train sub-objects carry their
augmentation config (``rotation_range``) so the train-side warp work is
driver-measurable at both the mild and the worst-case rotation range.

Then — spare budget permitting — the zoo section appends one
driver-verified JSON line per extra serving family. Two fixed slots (ViT
per-wing, 4-cam fusion CNN) plus ONE ROTATING slot so the whole zoo gets
driver-verified across rounds without busting one run's budget: the
rotation picks from [FTL disentangled, ResNet50, GPTNet] by the number of
BENCH_r*.json artifacts present (rotation started at round 5 = 4 artifacts
= the FTL family, which exercises the camera-matrix input path). The
rotating slot runs FIRST — it is the line no earlier artifact carries, so
when a claim stall shrinks the budget it is the last to be starved. Every
zoo line carries its own ``baseline`` + ``baseline_kind`` (per-wing
families: the flagship 5,000 fps target; heavier multicam families: a
roofline-derived frame budget) so ``vs_baseline`` ~ 1.0 means "at its own
target/ceiling", not "fraction of the flagship's target". Zoo failures or
budget exhaustion only cost the extra lines; the headline is already out.

Flags: ``--train`` (train-step bench only), ``--infer`` (skip train metric),
``--no-deadline`` (offline runs: disable the watchdog AND every budget
gate, so a warming run compiles all six sections),
``--zoo-family NAME`` (offline: bench one zoo family by name).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

T0 = time.perf_counter()

import jax
import jax.numpy as jnp

# persistent compile cache: repeat bench runs skip cold compiles (same cache
# the test suite uses); the driver's end-of-round run rides whatever this
# round's own bench invocations left warm.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

BASELINE_FPS = 5000.0
B = 1024
K_SMALL, K_LARGE = 4, 20
TRAIN_B = 256
TRAIN_K = 8

# Global deadline (seconds from process start).  The driver's window is
# unknown; round 1 finished fine and round 2 was killed, so stay well inside
# the smallest plausible window while leaving room for one cold scan compile.
# The TPU *claim* itself can stall for minutes if a previous process died
# uncleanly (remote grant not yet released), so the watchdog extends the
# deadline while the claim is pending, up to an absolute cap.
HARD_DEADLINE_S = 330.0
# Post-claim budget covers headline + train (two rotation variants) + the
# three zoo lines on a warm cache (~310s measured end-to-end round 4 with
# two zoo lines); ABS_MAX stays under the smallest plausible driver window.
POST_CLAIM_S = 440.0       # budget from the moment the device answers
ABS_MAX_S = 560.0          # never run longer than this, claim or no claim
# Refinement / extras only start if time SINCE THE CLAIM is below these
# (wall-elapsed gates starved them after long claim stalls — the watchdog
# already extends its deadline claim-aware, these must match).
REFINE_BUDGET_S = 190.0
TRAIN_BUDGET_S = 110.0
TRAIN2_BUDGET_S = 170.0    # the ±180° train variant (a second compile)

_STATE: dict = {"out": None, "device_ready": None, "emitted": False}
# zoo spare-budget section (runs AFTER the headline line is printed, so it
# can only add lines, never delay or sink the headline). Start gates are
# against the WATCHDOG DEADLINE, not wall-clock: a family only starts with
# this much deadline headroom left (warm-cache costs measured ~60-90s per
# family; a cold compile can still overrun, in which case the watchdog
# bounds the damage after the headline is already out).
ZOO_VIT_HEADROOM_S = 130.0
ZOO_ROTATING_HEADROOM_S = 120.0
ZOO_MULTICAM_HEADROOM_S = 110.0
_EMIT_LOCK = threading.Lock()
SCALES_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_scales.npz")


def _elapsed() -> float:
    return time.perf_counter() - T0


def _log(msg: str) -> None:
    print(f"[bench +{_elapsed():.0f}s] {msg}", file=sys.stderr, flush=True)


def _emit(hard_exit: bool, code: int = 0) -> None:
    """Print the headline JSON (once).

    ``hard_exit`` (watchdog path, main thread stuck in a compile) kills the
    process outright.  The success path instead returns and lets the
    interpreter exit normally: the PJRT client then tears down its device
    claim promptly — an ``os._exit`` here leaves the remote grant held and
    can wedge the NEXT claimant (observed: minutes-long first-op hangs after
    unclean exits; the likely cause of round 2's bench timeout).
    """
    with _EMIT_LOCK:
        out = _STATE["out"]
        if out is not None:
            print(json.dumps(out), flush=True)
            _STATE["out"] = None  # never print twice
            _STATE["emitted"] = True
        elif not _STATE["emitted"]:
            code = max(code, 7)
        sys.stdout.flush()
        sys.stderr.flush()
        if hard_exit:
            os._exit(code)


def _since_claim() -> float:
    """Seconds since the device answered (elapsed if it never has)."""
    ready = _STATE["device_ready"]
    return _elapsed() if ready is None else _elapsed() - ready


def _current_deadline() -> float:
    """The watchdog's deadline under the current claim state (seconds
    from process start)."""
    ready = _STATE["device_ready"]
    if ready is None:
        return ABS_MAX_S
    return min(max(HARD_DEADLINE_S, ready + POST_CLAIM_S), ABS_MAX_S)


def _start_watchdog() -> None:
    def watch():
        while _elapsed() < _current_deadline():
            time.sleep(1.0)
        _log("hard deadline reached — emitting best-so-far")
        _emit(hard_exit=True)

    t = threading.Thread(target=watch, daemon=True)
    t.start()


def _spread(rates: list[float]) -> dict:
    """Observed per-repeat rate spread for the emitted JSON (noise band).

    The spread is of WHOLE-RUN rates; the headline ``value`` may be the
    marginal rate, which cancels fixed dispatch overhead and therefore
    legitimately exceeds ``value_max`` — ``value_kind``/``spread_kind``
    make the two estimators explicit in the artifact (advisor r4)."""
    return {
        "value_min": round(min(rates), 1),
        "value_max": round(max(rates), 1),
        "repeats": len(rates),
        "spread_kind": "whole_run_rate",
    }


def _set_headline(fps: float, extra: dict | None = None) -> None:
    """Update the pending headline; ``extra`` fields accumulate across
    calls (spread fields from the rate measurement, train_step metric)."""
    if extra:
        _STATE.setdefault("extras", {}).update(extra)
    out = {
        "metric": "heatmap_inference_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }
    out.update(_STATE.get("extras", {}))
    _STATE["out"] = out


def bench_train(rotation_range: float = 15.0) -> float:
    """Train-step frames/sec/chip: flagship model, batch 256, 192px, full
    on-device augmentation (rotation ±``rotation_range``°, shifts, flips),
    MSE loss, one Adam update per step.  K steps chain inside ONE jitted
    lax.scan.  The rotation range is a real cost axis — the separable
    warp's intermediate canvases scale with the shear bound (DESIGN.md
    "Augmentation") — so the driver line carries both ±15° and ±180°."""
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.models import build_model
    from pose_estimation_amitai_tpu.train.loop import (
        create_train_state, make_train_step,
    )

    hw, in_ch, out_ch, n_data = 192, 4, 18, 2048
    cfg = Config(
        batch_size=TRAIN_B, do_augmentations=True,
        rotation_range=rotation_range,
        xy_shifts=10.0, zoom_range=(0.9, 1.1), dropout_ratio=0.0,
    )
    model = build_model(cfg, (hw, hw, in_ch), out_ch)
    rng = np.random.default_rng(0)
    # synthesize the 1.2 GB input pool ON DEVICE (jax.random, fixed keys):
    # host-side numpy generation + the relay transfer cost 15-25 s per
    # train variant on a 1-cpu box and sit inside the deadline budget —
    # the timed program is unchanged (data is an input buffer of the
    # same shapes/dtypes either way)
    kb, kp = jax.random.split(jax.random.PRNGKey(0))
    data = {
        "box": jax.random.uniform(kb, (n_data, hw, hw, in_ch), jnp.float32),
        "peaks": jax.random.uniform(
            kp, (n_data, out_ch, 2), jnp.float32, 20.0, hw - 20.0
        ),
        "peak_vals": jnp.ones((n_data, out_ch), jnp.float32),
    }
    data = jax.tree_util.tree_map(jax.block_until_ready, data)
    sample = {"image": jnp.zeros((TRAIN_B, hw, hw, in_ch), jnp.float32)}
    state = create_train_state(model, cfg, sample)
    train_step = make_train_step(model, cfg)

    idx_all = jnp.asarray(
        rng.integers(0, n_data, (TRAIN_K, 1, TRAIN_B)).astype(np.int32)
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
    _log(f"train-step compile+warm {time.perf_counter() - t0:.0f}s")

    def timed():
        t0 = time.perf_counter()
        np.asarray(run(state, data, idx_all))
        return time.perf_counter() - t0

    t = min(timed() for _ in range(3))
    return TRAIN_K * TRAIN_B / t


def _build_serving():
    """Model, params, calibration scales, input batch for the serving bench."""
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.models import build_model
    from pose_estimation_amitai_tpu.models.quantized import calibrate

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

    scales = None
    if os.path.exists(SCALES_FILE):
        try:
            with np.load(SCALES_FILE) as z:
                scales = {k: float(z[k]) for k in z.files}
            _log(f"loaded {len(scales)} pre-baked calibration scales")
        except Exception as e:
            _log(f"scales file unreadable ({e!r}); recalibrating")
            scales = None
    if scales is None:
        scales = calibrate(
            params, rng.random((8, hw, hw, in_ch)).astype(np.float32),
            batch=4,
        )
        try:
            np.savez(SCALES_FILE, **{k: np.float64(v)
                                     for k, v in scales.items()})
            _log(f"calibrated + saved {len(scales)} scales")
        except Exception:
            pass
    return model, params, scales, base


def _scan_runner(forward, params, base):
    from pose_estimation_amitai_tpu.ops import peaks

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


def _bench_cameras(batch: int):
    """Plausible per-sample 3x4 projection matrices + normalised pinvs for
    the camera-matrix (FTL) family — the CameraMatrixGenerator contract
    (P @ P_inv ~ s*I3, reference pytorch/Datagenerators.py:242-270)."""
    rng = np.random.default_rng(7)
    P = np.tile(np.eye(3, 4, dtype=np.float32), (batch, 4, 1, 1))
    P += rng.normal(0, 0.05, P.shape).astype(np.float32)
    P_inv = np.linalg.pinv(P)
    P_inv /= np.linalg.norm(P_inv, axis=(-2, -1), keepdims=True)
    return jnp.asarray(P), jnp.asarray(P_inv)


def _bench_family(model_type: str, in_ch: int, out_ch: int,
                  batch: int, mode: str) -> float:
    """Marginal-rate serving throughput (samples/s) for one zoo family —
    the bench_zoo.py methodology compacted: one jitted ``lax.scan`` movie
    loop with on-device argmax decode, marginal rate between two K values.

    ``mode``: 'bf16' (plain flax apply) or 'int8' (the generic interceptor,
    models/quantized_generic.py, shape-only calibration)."""
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.models import (
        build_model, needs_camera_matrices,
    )
    from pose_estimation_amitai_tpu.ops import peaks

    hw = 192
    cfg = Config(model_type=model_type, dropout_ratio=0.0)
    model = build_model(cfg, (hw, hw, in_ch), out_ch)
    if batch >= 128 and getattr(model, "fold_views", None) is True:
        model = model.clone(fold_views=False)  # large-batch regime
    if getattr(model, "normalize_output", None) is True:
        model = model.clone(normalize_output=False)  # peaks-only serving
    if getattr(model, "fast_softmax", None) is False:
        model = model.clone(fast_softmax=True)  # bf16 softmax chain
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((batch, hw, hw, in_ch)), jnp.bfloat16)
    extra = ()
    if needs_camera_matrices(model_type):
        extra = _bench_cameras(batch)
    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, hw, hw, in_ch), jnp.bfloat16),
        *(e[:1] for e in extra),
        train=False,
    )
    variables = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), variables
    )
    if mode == "int8":
        from pose_estimation_amitai_tpu.models.quantized_generic import (
            calibrate_apply,
            make_quantized_apply,
        )

        calib = [(np.asarray(base[:8], np.float32),)
                 + tuple(e[:8] for e in extra)]
        scales = calibrate_apply(model, variables, calib)
        forward = make_quantized_apply(
            model, variables, scales, out_dtype=jnp.bfloat16
        )
    else:
        def forward(frames, *args):
            return model.apply(variables, frames, *args, train=False)

    k_s, k_l = 2, 8

    def make(K):
        @jax.jit
        def run(base, *args):
            def body(c, i):
                frames = base * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
                return c, peaks.find_peaks_with_vals(forward(frames, *args))

            _, out = jax.lax.scan(body, 0, jnp.arange(K))
            return out

        return lambda: run(base, *extra)

    r_s, r_l = make(k_s), make(k_l)

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        return time.perf_counter() - t0

    timed(r_s), timed(r_l)  # compile + warm
    t_s = min(timed(r_s) for _ in range(2))
    t_l = min(timed(r_l) for _ in range(2))
    # same trust policy as the headline: the marginal rate cancels fixed
    # dispatch overhead, but noise can make it absurd (or dt <= 0) — fall
    # back to the conservative whole-run rate outside the trust band
    whole = k_l * batch / t_l
    dt = t_l - t_s
    if dt > 1e-6:
        marginal = (k_l - k_s) * batch / dt
        if whole <= marginal <= whole * 1.2:
            return marginal
    return whole


def _zoo_family_table() -> dict:
    """Single source of truth for every zoo family's serving config and
    per-family baseline (consumed by BOTH the driver-run schedule and the
    --zoo-family offline helper, so the two paths can never drift).

    name -> (metric, model_type, in_ch, out_ch, cams, batch, mode,
    baseline_fps, baseline_kind). ``baseline`` semantics (round-4 verdict
    #6): per-wing families measure against the flagship 5,000 fps target;
    heavier multicam families against a bf16-roofline frame budget
    (197 TFLOP/s / GFLOP-per-sample * cams; GFLOP/sample measured in
    RESULTS.md: fusion 757.3, FTL 109.5, resnet 11.4, gptnet 4.8), so
    vs_baseline ~ 1.0 reads "at its own ceiling" instead of "fraction of
    the flagship target"."""
    from pose_estimation_amitai_tpu import constants as C

    return {
        # batch 768 measured +1-4.5% over 512 for this family
        # (scripts/exp_vit_fused.py batch sweep, 2026-08-21)
        "vit": ("vit_serving_throughput",
                C.MODEL_18_POINTS_PER_WING_VIT, 4, 18, 1, 768, "bf16",
                BASELINE_FPS, "flagship_target"),
        "ftl": ("ftl_serving_throughput",
                C.ALL_CAMS_DISENTANGLED_PER_WING_CNN, 16, 72, 4, 128,
                "int8", 7195.0, "bf16_roofline"),
        "resnet": ("resnet_serving_throughput",
                   C.RESNET_18_POINTS_PER_WING, 4, 18, 1, 256, "int8",
                   17280.0, "bf16_roofline"),
        "gptnet": ("gptnet_serving_throughput",
                   C.GPTNET, 4, 18, 1, 256, "int8",
                   41040.0, "bf16_roofline"),
        "multicam": ("multicam_serving_throughput",
                     C.ALL_CAMS_18_POINTS, 16, 72, 4, 256, "int8",
                     1040.0, "bf16_roofline"),
    }


def _zoo_schedule() -> list[tuple]:
    """The zoo lines for THIS run: two fixed slots (ViT per-wing, 4-cam
    fusion) + one rotating slot (round-4 verdict #2) so every serving
    family gets a driver-verified number within three rounds.  The
    rotation index comes from the BENCH_r*.json artifacts the driver left
    in the repo: rotation started at round 5 (4 artifacts) with the FTL
    disentangled family (the only family exercising the camera-matrix
    input path, reference pytorch/CNNs.py:240-352), then ResNet50
    (tensorflow/Network.py:377-414), then GPTNet (NNs warehouse/NNs.py).

    Returns (name, headroom_s) pairs resolved against
    :func:`_zoo_family_table`."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    n_rounds = len(glob.glob(os.path.join(here, "BENCH_r*.json")))
    rotating = ["ftl", "resnet", "gptnet"][max(0, n_rounds - 4) % 3]
    table = _zoo_family_table()
    # ORDER = priority under a shrunken budget (a long claim stall eats
    # into ABS_MAX_S): the rotating family first — it is the line no
    # prior round's artifact carries — then ViT, then the twice-verified
    # 4-cam fusion. A 195s claim stall run (2026-08-21) starved the slot
    # when it ran second.
    return [
        table[rotating] + (ZOO_ROTATING_HEADROOM_S,),
        table["vit"] + (ZOO_VIT_HEADROOM_S,),
        table["multicam"] + (ZOO_MULTICAM_HEADROOM_S,),
    ]


def bench_zoo_spare_budget() -> None:
    """Driver-verified zoo lines (round-3 verdict next #1): after the
    headline is printed, measure the second-most-important serving
    families and append one JSON line each — the ViT per-wing family
    (reference serving surface pytorch/VITs.py:197-229), this round's
    rotating family, and the 4-cam fusion CNN (pytorch/CNNs.py:189-237).
    Failures and budget exhaustion only cost the extra lines, never the
    headline."""
    for (metric, mt, in_ch, out_ch, cams, batch, mode,
         baseline, baseline_kind, headroom) in _zoo_schedule():
        # --no-deadline runs have no watchdog: the deadline gate is
        # meaningless there (a long claim stall would otherwise leave
        # "negative headroom" and skip the zoo forever)
        if _STATE.get("no_deadline"):
            remaining = float("inf")
        else:
            remaining = _current_deadline() - _elapsed()
        if remaining < headroom:
            _log(f"skipping {metric} (deadline headroom "
                 f"{remaining:.0f}s < {headroom:.0f}s)")
            continue
        try:
            sps = _bench_family(mt, in_ch, out_ch, batch, mode)
            frames = sps * cams
            line = {
                "metric": metric,
                "value": round(frames, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(frames / baseline, 3),
                "baseline": baseline,
                "baseline_kind": baseline_kind,
                "samples_per_s": round(sps, 1),
                "path": mode,
                "batch": batch,
                "model_type": mt,
            }
            print(json.dumps(line), flush=True)
            _log(f"{metric} {frames:.0f} frames/s ({mode}, batch {batch})")
        except Exception as e:
            _log(f"{metric} failed (headline unaffected): {e!r}")


def main() -> None:
    from pose_estimation_amitai_tpu.models.quantized import (
        make_quantized_resident_forward,
    )

    # claim the device with a trivial op first: marks device_ready for the
    # watchdog and isolates claim-stall time from compile budgets
    t0 = time.perf_counter()
    np.asarray(jnp.zeros(()) + 1.0)
    _STATE["device_ready"] = _elapsed()
    _log(f"device claimed in {time.perf_counter() - t0:.1f}s")

    model, params, scales, base = _build_serving()
    qr = make_quantized_resident_forward(
        model, params, scales, out_dtype=jnp.bfloat16
    )
    make = _scan_runner(lambda f: qr(f), params, base)

    # --- first number: whole-run rate at K_LARGE (one compile) -------------
    run_large = make(K_LARGE)
    t0 = time.perf_counter()
    np.asarray(run_large())  # compile + warm
    _log(f"int8-resident K={K_LARGE} compile+warm {time.perf_counter()-t0:.0f}s")

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    times_l = [timed(run_large) for _ in range(3)]
    t_l = min(times_l)
    # per-repeat whole-run rates: the headline's published SPREAD, so
    # round-over-round drift (r1 6,607 -> r3 6,506) is classifiable as
    # relay noise vs real regression (round-3 verdict weak #4)
    rates = [K_LARGE * B / t for t in times_l]
    fps = K_LARGE * B / t_l
    _set_headline(fps, {**_spread(rates), "value_kind": "whole_run_rate"})
    _log(f"whole-run rate {fps:.0f} fps (t={t_l:.3f}s, "
         f"spread {min(rates):.0f}-{max(rates):.0f})")

    # --- refinement: marginal rate between K_SMALL and K_LARGE -------------
    # --no-deadline runs ignore the budget gates entirely (same rationale
    # as the zoo section: offline/warming runs must exercise EVERY section
    # so the persistent compile cache covers the driver's gated run)
    if _STATE.get("no_deadline") or _since_claim() < REFINE_BUDGET_S:
        try:
            run_small = make(K_SMALL)
            np.asarray(run_small())  # compile + warm
            t_s = min(timed(run_small) for _ in range(3))
            more_l = [timed(run_large) for _ in range(2)]
            rates += [K_LARGE * B / t for t in more_l]
            t_l = min(t_l, min(more_l))
            dt = t_l - t_s
            if dt > 1e-6:
                m_fps = (K_LARGE - K_SMALL) * B / dt
                # marginal must be sane (dispatch overhead only *adds* time,
                # so marginal >= whole-run; cap runaway noise at +20%)
                if fps <= m_fps <= fps * 1.2:
                    fps = m_fps
                    _set_headline(fps, {**_spread(rates),
                                        "value_kind": "marginal_rate"})
                    _log(f"marginal rate {fps:.0f} fps")
                else:
                    _set_headline(fps, _spread(rates))
                    _log(f"marginal {m_fps:.0f} fps out of trust band; "
                         f"keeping whole-run rate")
            else:
                _log("marginal degenerate; keeping whole-run rate")
        except Exception as e:
            _log(f"refinement failed: {e!r}")
    else:
        _log("skipping marginal refinement (budget)")

    # --- optional second metric: train-step throughput ---------------------
    # two augmentation variants (round-4 verdict #7): the mild ±15° config
    # and the worst-case ±180° one, whose separable-warp canvases are the
    # widest (DESIGN.md "Augmentation") — so the train-side warp work is
    # driver-measurable round over round.
    if "--infer" not in sys.argv and (_STATE.get("no_deadline")
                                      or _since_claim() < TRAIN_BUDGET_S):
        try:
            tr = bench_train(rotation_range=15.0)
            _set_headline(fps, {
                "train_step_throughput": {
                    "value": round(tr, 1), "unit": "frames/sec/chip",
                    "rotation_range": 15.0,
                }
            })
            _log(f"train-step {tr:.0f} fps (rot ±15°)")
            if _STATE.get("no_deadline") or _since_claim() < TRAIN2_BUDGET_S:
                tr180 = bench_train(rotation_range=180.0)
                _set_headline(fps, {
                    "train_step_throughput_rot180": {
                        "value": round(tr180, 1), "unit": "frames/sec/chip",
                        "rotation_range": 180.0,
                    }
                })
                _log(f"train-step {tr180:.0f} fps (rot ±180°)")
            else:
                _log("skipping ±180° train variant (budget)")
        except Exception as e:
            _log(f"train bench failed (headline unaffected): {e!r}")
    elif "--infer" not in sys.argv:
        _log("skipping train-step metric (budget)")

    # headline goes out NOW; everything after can only append lines
    _emit(hard_exit=False)
    bench_zoo_spare_budget()


def _cli_zoo_family(name: str) -> None:
    """Offline helper: bench ONE zoo family by short name (vit / ftl /
    resnet / gptnet / multicam) and print its JSON line (same config +
    baselines as the driver-run schedule — shared _zoo_family_table)."""
    metric, mt, in_ch, out_ch, cams, batch, mode, baseline, kind = \
        _zoo_family_table()[name]
    sps = _bench_family(mt, in_ch, out_ch, batch, mode)
    frames = sps * cams
    print(json.dumps({
        "metric": metric, "value": round(frames, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames / baseline, 3),
        "baseline": baseline, "baseline_kind": kind,
        "samples_per_s": round(sps, 1), "path": mode, "batch": batch,
        "model_type": mt,
    }), flush=True)


def _flag_value(flag: str) -> str | None:
    """Parse ``--flag value`` or ``--flag=value`` from sys.argv; loud
    error when the flag is present without a value."""
    for i, a in enumerate(sys.argv):
        if a == flag:
            if i + 1 >= len(sys.argv):
                raise SystemExit(f"{flag} needs a value")
            return sys.argv[i + 1]
        if a.startswith(flag + "="):
            return a.split("=", 1)[1]
    return None


if __name__ == "__main__":
    if "--no-deadline" not in sys.argv:
        _start_watchdog()
    else:
        _STATE["no_deadline"] = True
    zoo_family = _flag_value("--zoo-family")
    if zoo_family is not None:
        _cli_zoo_family(zoo_family)
    elif "--train" in sys.argv:
        rot = 180.0 if "--rot180" in sys.argv else 15.0
        fps = bench_train(rotation_range=rot)
        _STATE["out"] = {
            "metric": "train_step_throughput",
            "value": round(fps, 1),
            "unit": "frames/sec/chip",
            "rotation_range": rot,
        }
        _emit(hard_exit=False)
    else:
        main()
