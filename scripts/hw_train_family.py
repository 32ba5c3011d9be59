"""Hardware training validation for any zoo family on synthetic data.

Generates a geometry-consistent synthetic H5 (data/synthetic.py, outline
wing landmarks), writes a reference-dialect config for the requested model
type, runs the standard CLI training path end to end (same Trainer,
artifacts, checkpoints as production), and prints the best validation
metrics from the run dir's losses.csv.

This is the harness behind RESULTS.md's per-family "training on hardware"
rows — the reference trains every family through one loop too
(pytorch/train_pytorch.py); here each family goes through the identical
jitted step + on-device augmentation.

Run: python scripts/hw_train_family.py MODEL_TYPE [epochs] [batches] [batch]
       [config-overrides-JSON]

The optional 5th arg merges into the generated config — e.g.
'{"checkpoint_every": 50}' keeps long runs cheap through a remote-attached
runtime (the every-epoch full-state fetch dominates a 1.5 s/epoch run).
"""

from __future__ import annotations

import csv
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    model_type = sys.argv[1]
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    batches = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    overrides = json.loads(sys.argv[5]) if len(sys.argv) > 5 else {}

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from pose_estimation_amitai_tpu.cli import main as cli_main
    from pose_estimation_amitai_tpu.data.synthetic import write_synthetic_h5

    work = tempfile.mkdtemp(prefix=f"hw_{model_type}_")
    h5 = os.path.join(work, "data.h5")
    write_synthetic_h5(h5, num_frames=48, num_points=16, image_size=192,
                       seed=11, layout="outline", motion="movie")

    cfg = {
        "model type": model_type,
        "data_path": h5,
        "base output path": os.path.join(work, "models"),
        "epochs": epochs,
        "batch_size": batch,
        "batches per epoch": batches,
        "val_fraction": 0.3,
        "learning rate": 1e-3,
        "dropout ratio": 0.0,
        "do augmentations": 1,
        "rotation range": 30,
        "augmentation shift x y": 5,
        "horizontal flip": 1,
        "vertical flip": 1,
        "seed": 0,
        "sigma": 3.0,
        "save_every_epoch": 0,
        "compute_dtype": "bfloat16",
    }
    cfg.update(overrides)
    cfg_path = os.path.join(work, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    t0 = time.perf_counter()
    rc = cli_main(["train", cfg_path])
    wall = time.perf_counter() - t0
    assert rc == 0, rc

    run_dir = next(
        os.path.join(cfg["base output path"], d)
        for d in sorted(os.listdir(cfg["base output path"]))
    )
    with open(os.path.join(run_dir, "losses.csv")) as f:
        rows = list(csv.DictReader(f))
    # trainer columns: Epoch, Train Loss, Val Loss, L2 Loss, L2 Std,
    # L2 Max Outlier, Epoch Seconds (train/trainer.py _save_run_csvs)
    best_mse = min(float(r["Val Loss"]) for r in rows)
    best_l2 = min(float(r["L2 Loss"]) for r in rows)
    print(json.dumps({
        "model_type": model_type,
        "epochs": epochs, "batches_per_epoch": batches, "batch": batch,
        "best_val_mse": best_mse,
        "best_val_l2_px": best_l2,
        "wall_s": round(wall, 1),
        "run_dir": run_dir,
    }), flush=True)


if __name__ == "__main__":
    main()
