"""Reference-regime parity run (round-1 verdict #6).

Reproduces the EXACT training regime of the reference's committed flagship
run (reference: models/MODEL_18_POINTS_PER_WING_Feb 18_01/configuration.json
+ losses.csv — the BASELINE.md anchors: best val heatmap MSE 3.882e-4, best
val mean pixel L2 3.437 px): debug-mode 10-frame truncation, 50/50
train/val split, batch 5 x 10 batches/epoch, Adam lr 1e-3, dropout 0.5,
rotation +-30 deg / +-10 px shift / both flips augmentation,
ReduceLROnPlateau(factor 0.1, patience 3), integer-argmax L2 val metric,
torch-flavour architecture (the committed run is the PyTorch stack).

The real fly dataset (combined_dataset.h5) is lab-internal, so the run uses
the shipped geometry-consistent synthetic generator at the same shapes
(32 wing points + head/tail -> 18 heatmap channels per wing sample, 192px,
4 cameras). The config dict below is the reference file's dialect verbatim
(comment keys, 0/1 bools) so Config ingestion is exercised end to end.

Usage::

    python scripts/parity_reference_regime.py [--epochs N] [--out DIR]

Prints one summary line; exits 0 iff best val L2 <= 3.44 px.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# reference: models/MODEL_18_POINTS_PER_WING_Feb 18_01/configuration.json
# (keys + values verbatim; data_path replaced by the synthetic arrays)
REFERENCE_CONFIG = {
    "debug mode": 1,
    "// training parameters //": 0,
    "batch_size": 5,
    "epochs": 2000,
    "batches per epoch": 10,
    "do curriculum learning": 0,
    "loss_function": "mean_squared_error",
    "epochs pointwise loss": 0,
    "val_fraction": 0.5,
    "learning rate": 0.001,
    "accumulation_steps": 3,
    "// Network parameters //": 0,
    "dropout ratio": 0.5,
    "dilation rate": 2,
    "optimizer": "adam",
    "number of base filters": 64,
    "number of encoder decoder blocks": 2,
    "convolution kernel size": 3,
    "// preprocess parameters //": 0,
    "rank wing size": 2,
    "model type": "MODEL_18_POINTS_PER_WING",
    "test_path": "-",
    "mix_with_test": 0,
    "mask dilation": 1,
    "single time channel": 0,
    "// augmentations parameters //": 0,
    "do augmentations": 1,
    "augmentation shift x y": 10,
    "rotation range": 30,
    "seed": 1,
    "horizontal flip": 1,
    "vertical flip": 1,
    "zoom range": [1, 1],
    "interpolation order": 2,
    "// saving configurations //": 0,
    "base output path": "models",
    "clean": 0,
    "// callbacks parameters //": 0,
    "reduce_lr_factor": 0.1,
    "reduce_lr_patience": 3,
    "reduce_lr_min_delta": 1e-05,
    "reduce_lr_cooldown": 0,
    "reduce_lr_min_lr": 1e-10,
    "save_every_epoch": 0,
}

TARGET_L2_PX = 3.44  # BASELINE.md: best val mean pixel L2, epoch 1137/2000
TARGET_MSE = 3.882e-4  # BASELINE.md: best val heatmap MSE, epoch 1380/2000


def run(epochs: int | None, out_dir: str | None, arch_flavor: str = "torch",
        no_aug: bool = False):
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
    from pose_estimation_amitai_tpu.train.trainer import Trainer

    overrides = dict(REFERENCE_CONFIG)
    if epochs is not None:
        overrides["epochs"] = epochs
    cfg = Config.from_dict(overrides)
    cfg = cfg.replace(
        arch_flavor=arch_flavor,  # the committed run is the PyTorch stack
        eval_decode="argmax",  # the reference's integer-argmax L2 metric
        base_output_path=out_dir or tempfile.mkdtemp(prefix="parity_"),
        viz_every=0,  # CSV/MAT artifacts only; no per-epoch PNGs
        # The committed run's DE-FACTO dropout is zero: the torch encoder
        # casts the configured 0.5 with int() before building nn.Dropout
        # (pytorch/CNNs.py:14, 22) and the active Decoder2d forward never
        # calls its dropout module (pytorch/CNNs.py:151-157). Reproducing
        # the run means reproducing that behaviour, not the config string.
        dropout_ratio=0.0,
    )
    cfg = cfg.replace(checkpoint_every=50)
    if no_aug:
        # The cross-framework control regime (RESULTS.md): augmentation OFF
        # and constant LR. The torch replica of the reference loop
        # (scripts/parity_torch_replica.py) escapes the background plateau
        # and memorises this 40-train-sample task to sub-pixel under the
        # same control; this flag produces OUR framework's number for the
        # identical setting.
        cfg = cfg.replace(do_augmentations=False, reduce_lr_factor=1.0)
    # Long-regime wall-time guard: the best-on-val snapshot otherwise
    # serialises the full state every epoch (val improves by hairs each
    # epoch in this regime, and each device->host fetch through a remote
    # runtime costs seconds); metrics are the product here, so throttle
    # best saves to every 50 epochs.
    from pose_estimation_amitai_tpu.train import trainer as trainer_mod

    _real_save = trainer_mod.ckpt.save_checkpoint
    _count = {"n": 0}

    def _throttled(run_path, state, epoch, val_loss, scheduler_state=None,
                   best=False, **kw):
        if best:
            _count["n"] += 1
            if epoch % 50 != 0:
                return ""
        return _real_save(run_path, state, epoch, val_loss,
                          scheduler_state=scheduler_state, best=best, **kw)

    trainer_mod.ckpt.save_checkpoint = _throttled

    # 32 wing points + head/tail => per-wing samples carry 18 channels,
    # matching the flagship's 18 output heatmaps; debug mode truncates the
    # 14 generated frames to the reference's 10. motion="movie" is the
    # load-bearing choice: the reference's debug regime trains on 10
    # CONSECUTIVE high-speed-video frames with a 50/50 random split, so
    # val frames are near-duplicates of train frames bracketing them in
    # the wingbeat — that temporal correlation is what makes 3.44 px
    # reachable from ~20 training samples. IID per-frame poses (the
    # generator default) make the same regime a 20-shot generalisation
    # problem instead: the model collapses to background prediction
    # (val MSE ~7.4e-4 = the all-zeros MSE) and the plateau scheduler
    # freezes the LR. Cached: generation costs ~3 min per process.
    # layout="outline" is equally load-bearing: real annotations are ORDERED
    # landmarks along the wing planform boundary, so keypoint identity is
    # geometric position on a smooth curve. The original random-cloud wings
    # made identity a ~3%-amplitude contrast between overlapping speckles —
    # measured unlearnable in this regime (train loss pinned at the
    # all-zeros MSE for 300 epochs at constant lr; outline data descends
    # from epoch ~30 under the reference's own plateau schedule).
    # stroke_period=100: real debug clips are ~10 frames of 20k-fps video,
    # i.e. ~0.1 wingbeat — inter-frame motion is a few px, and the 50/50
    # split's val frames are near-duplicates of train frames.
    cache = (
        pathlib.Path(tempfile.gettempdir()) / "parity_arrays_outline_v7.npz"
    )
    if cache.exists():
        with np.load(cache) as z:
            arrays = {k: z[k] for k in z.files}
    else:
        arrays = make_synthetic_arrays(
            num_frames=14, num_points=32, image_size=192, seed=1,
            wing_spread=0.008, feature_amp=1.3, motion="movie",
            stroke_period=100.0, layout="outline",
        )
        np.savez(cache, **arrays)
    t0 = time.time()
    trainer = Trainer(cfg, arrays=arrays)
    hist = trainer.train()
    l2 = np.asarray(hist["l2"], np.float64)
    mse = np.asarray(hist["val_loss"], np.float64)
    best_l2_ep = int(np.argmin(l2))
    summary = {
        "regime": "reference debug (10 frames, 50/50 split, batch 5 x 10)"
                  + (" [aug OFF, constant LR]" if no_aug else ""),
        "epochs_run": len(l2),
        "best_val_l2_px": round(float(l2[best_l2_ep]), 3),
        "best_val_l2_epoch": best_l2_ep + 1,
        "best_val_mse": float(np.min(mse)),
        "final_val_l2_px": round(float(l2[-1]), 3),
        "target_l2_px": TARGET_L2_PX,
        "target_mse": TARGET_MSE,
        "l2_target_met": bool(np.min(l2) <= TARGET_L2_PX),
        "mse_target_met": bool(np.min(mse) <= TARGET_MSE),
        "wall_minutes": round((time.time() - t0) / 60.0, 1),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the reference's 2000 (early-stop budget)")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--no-aug", action="store_true",
                    help="control regime: augmentation OFF + constant LR "
                         "(cross-framework comparison vs the torch replica)")
    args = ap.parse_args()
    s = run(args.epochs, args.out, no_aug=args.no_aug)
    sys.exit(0 if s["l2_target_met"] else 1)
