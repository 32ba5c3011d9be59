"""Command-line interface: train / pretrain / infer / eval.

The reference's CLI surface is two bare scripts taking a JSON config path as
``argv[1]`` (reference: tensorflow/train.py:149-153,
pytorch/train_pytorch.py:393-397) plus a Slurm job wrapper (run1.job). The
rebuild keeps that config-file-first shape under one typed entry point:

    python -m pose_estimation_amitai_tpu train    <config.json>
    python -m pose_estimation_amitai_tpu pretrain <config.json> [crops]
    python -m pose_estimation_amitai_tpu infer    <config.json> <ckpt> <data.h5> [out.npz]
    python -m pose_estimation_amitai_tpu eval     <config.json> <ckpt> <data.h5>
    python -m pose_estimation_amitai_tpu export   <config.json> <ckpt> <out.pexp>

``infer`` runs the full on-device pipeline (heatmaps -> peak decode ->
multi-view 3D lift when camera matrices are present) and writes an .npz with
``points_2d`` (F, 3, K) and, when liftable, ``points_3d`` (F, K, 3).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (first compiles are 20-60s)."""
    import jax

    cache_dir = os.environ.get("POSE_TPU_JAX_CACHE", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compilation_cache()


def cmd_train(args) -> int:
    from .train.trainer import Trainer

    Trainer(args.config).train()
    return 0


def cmd_pretrain(args) -> int:
    from .train import selfsup

    argv = [args.config] + ([args.data] if args.data else [])
    selfsup.main(argv)
    return 0


def _preprocessed(args):
    """Run the training-time preprocessing on the eval/infer dataset.

    Inference must see exactly what training saw (per-wing split, mask
    repair, per-model reshape — SURVEY §3.5), so both CLI paths go through
    the same Preprocessor instead of feeding raw H5 boxes to the model.
    """
    from .config import Config
    from .data.preprocess import Preprocessor
    from .infer import Predictor

    from .models import needs_camera_matrices

    cfg = Config.from_json(args.config).replace(
        data_path=args.data, debug_mode=False
    )
    pre = Preprocessor(cfg)
    pre.do_preprocess()
    cameras = None
    if needs_camera_matrices(cfg.model_type):
        # disentangled family: same sample assembly + per-sample crop-
        # adjusted cameras the trainer fed (data/pipeline.py build_dataset)
        from .data.pipeline import _assemble_disentangled, _camera_matrix_arrays

        box, confmaps = _assemble_disentangled(pre)
        box = box.astype(np.float32)
        confmaps = confmaps.astype(np.float32)
        P, P_inv = _camera_matrix_arrays(pre)
        cameras = (
            np.concatenate([P, P], axis=0),
            np.concatenate([P_inv, P_inv], axis=0),
        )
    else:
        box = pre.get_box().astype(np.float32)
        confmaps = pre.get_confmaps().astype(np.float32)
    use_q = bool(getattr(args, "quantized", False))
    # tri-state --fast-softmax: auto = Predictor's serving heuristic
    # (engage for argmax peaks-only), on/off = explicit. ``eval`` defaults
    # to OFF: its L2/confidence numbers are the accuracy surface, so the
    # approximate bf16 softmax chain must be an opt-in there, not a
    # serving auto-engagement (advisor r4).
    fast_sm = {"auto": None, "on": True, "off": False}[
        getattr(args, "fast_softmax", "auto")
    ]
    predictor = Predictor.from_checkpoint(
        cfg, args.checkpoint,
        image_shape=tuple(box.shape[1:]),
        num_output_channels=confmaps.shape[-1],
        chunk_size=args.chunk_size,
        decode=getattr(args, "decode", "argmax"),
        use_quantized=use_q,
        calibration_frames=box[:32] if use_q else None,
        cameras=cameras,
        quantized_layers=getattr(args, "quantized_layers", None),
        import_reference=bool(getattr(args, "import_reference", False)),
        dim_head=getattr(args, "dim_head", None),
        fast_softmax=fast_sm,
    )
    return cfg, pre, box, confmaps, predictor


def cmd_infer(args) -> int:
    from . import constants as C
    from .infer import lift_to_3d

    cfg, pre, box, _, predictor = _preprocessed(args)
    pts = predictor.predict_movie(box)  # (S, 3, K)

    out = {"points_2d": pts}
    # Per-wing flagship layout: samples are (2F wing-frames) x cams; lift
    # each wing-frame's peaks to 3D through the DLT cameras. Covers every
    # model type that keeps the 4-camera per-wing sample layout (CNN, ViT,
    # GPTNET, all-points) — the 3-good-cameras variants drop a
    # frame-dependent camera so their samples cannot be paired with fixed
    # DLT matrices.
    per_wing_types = (
        C.MODEL_18_POINTS_PER_WING, C.MODEL_18_POINTS_PER_WING_VIT,
        C.MODEL_18_POINTS_PER_WING_VIT_TO_POINTS, C.GPTNET,
        C.PER_WING_MODEL, C.ALL_POINTS_MODEL, C.ALL_POINTS_MODEL_VIT,
    )
    ncams = 4
    if (
        cfg.model_type in per_wing_types
        and pre.camera_matrices is not None
        and pts.shape[0] % ncams == 0
    ):
        per_cam = pts.reshape(-1, ncams, 3, pts.shape[-1])
        pts2d = np.transpose(per_cam[:, :, :2, :], (0, 1, 3, 2))  # (2F,4,K,2)
        # crop offsets in per-wing sample order (block-tiled, preprocess.py);
        # frames mixed in from a test file carry FABRICATED offsets — their
        # 3D rows are masked to NaN and flagged in points_3d_valid
        cz_all = pre.get_cropzone_per_wing(allow_invalid=True)
        cz_valid = pre.get_cropzone_valid_per_wing()[: pts2d.shape[0]]
        cz_all = cz_all[: pts2d.shape[0]]
        pts3d = np.array(lift_to_3d(pts2d, cz_all, pre.camera_matrices))
        pts3d[~cz_valid] = np.nan
        out["points_3d"] = pts3d
        out["points_3d_valid"] = cz_valid
    dest = args.out or "predictions.npz"
    np.savez(dest, **out)
    written = [dest]
    if getattr(args, "mat", False):
        # MATLAB-dialect artifact for the lab's downstream tooling — the
        # reference ecosystem's native format (history.mat via savemat,
        # tensorflow/CallBacks.py:26-27; the H5 datasets themselves are
        # MATLAB column-major exports)
        from scipy.io import savemat

        mat_dest = os.path.splitext(dest)[0] + ".mat"
        savemat(mat_dest, {k: np.asarray(v) for k, v in out.items()})
        written.append(mat_dest)
    print("wrote " + " + ".join(written) + ": " + ", ".join(
        f"{k} {v.shape}" for k, v in out.items()
    ))
    return 0


def cmd_eval(args) -> int:
    from .infer import evaluate_l2

    _, _, box, confmaps, predictor = _preprocessed(args)
    stats = evaluate_l2(predictor, box, confmaps)
    # document which softmax chain produced these numbers (the bf16
    # fast chain is approximate; eval defaults to the exact one)
    stats["softmax"] = (
        "fast_bf16"
        if getattr(predictor.model, "fast_softmax", None) is True
        else "exact"
    )
    print(json.dumps(stats, indent=2))
    return 0


def cmd_export(args) -> int:
    """Write a self-contained serving artifact (StableHLO + weights) —
    the TPU-native analog of the reference's TorchScript ``best_model.pth``
    (pytorch/train_pytorch.py:177-181)."""
    from .config import Config
    from .deploy import export_predictor
    from .infer import Predictor

    cfg = Config.from_json(args.config)
    use_q = bool(args.quantized)
    calibration = None
    image_shape = tuple(args.image_shape)
    if use_q:
        rng = np.random.default_rng(0)
        if args.data:
            from .data.preprocess import Preprocessor

            pre = Preprocessor(cfg.replace(data_path=args.data,
                                           debug_mode=False))
            pre.do_preprocess()
            calibration = pre.get_box().astype(np.float32)[:32]
            image_shape = tuple(calibration.shape[1:])
        else:
            # shape-only calibration (uniform [0,1) like normalized frames);
            # pass real data for production scales
            calibration = rng.random(
                (32, *image_shape), dtype=np.float32
            )
    predictor = Predictor.from_checkpoint(
        cfg, args.checkpoint,
        image_shape=image_shape,
        num_output_channels=args.out_channels,
        chunk_size=args.chunk_size,
        decode=args.decode,
        use_quantized=use_q,
        calibration_frames=calibration,
        quantized_layers=args.quantized_layers,
    )
    header = export_predictor(predictor, args.out)
    print(json.dumps(header))
    return 0


def cmd_import(args) -> int:
    """Convert a reference checkpoint to the rebuild's native msgpack
    snapshot (loadable by Predictor.from_checkpoint, which rebuilds the
    exact model from the embedded architecture metadata).

    The payload carries params + BatchNorm running stats + model_kind /
    arch_flavor / arch_kwargs — NOT params alone, which would be
    shape-compatible with a config-built model yet silently wrong
    (flavour / dilation / ref_token_grid drift) or broken for the BN
    families (importers.save_imported_snapshot)."""
    from .importers import (
        import_reference_checkpoint,
        save_imported_snapshot,
    )

    imported = import_reference_checkpoint(
        args.checkpoint, dim_head=args.dim_head
    )
    save_imported_snapshot(imported, args.out)
    print(json.dumps({
        "written": args.out,
        "format": "imported_reference_v1",
        "model_kind": imported.model_kind,
        "arch_flavor": imported.arch_flavor,
        "arch_kwargs": imported.arch_kwargs,
        "has_batch_stats": bool(imported.batch_stats),
    }))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pose_estimation_amitai_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="supervised training")
    t.add_argument("config")
    t.set_defaults(fn=cmd_train)

    pre = sub.add_parser("pretrain", help="self-supervised inpainting")
    pre.add_argument("config")
    pre.add_argument("data", nargs="?", default="")
    pre.set_defaults(fn=cmd_pretrain)

    for name, fn in (("infer", cmd_infer), ("eval", cmd_eval)):
        s = sub.add_parser(name)
        s.add_argument("config")
        s.add_argument("checkpoint")
        s.add_argument("data")
        if name == "infer":
            s.add_argument("out", nargs="?", default="")
        s.add_argument("--chunk-size", type=int, default=256)
        s.add_argument(
            "--decode", choices=("argmax", "soft", "refined"),
            default="argmax",
            help="peak decoder: hard argmax, differentiable soft-argmax, or "
                 "sub-pixel log-parabola refinement (exact for Gaussian "
                 "targets)",
        )
        s.add_argument(
            "--quantized", action="store_true",
            help="calibrated int8 serving path (~2x throughput on v5e; "
                 "peak parity verified in tests/test_quantized.py)",
        )
        s.add_argument(
            "--quantized-layers", choices=("all", "conv_only"),
            default=None,
            help="with --quantized: 'conv_only' is the ViT mixed-precision "
                 "mode (int8 conv decoder, bf16 transformer trunk — "
                 "DESIGN.md serving findings)",
        )
        s.add_argument(
            "--dim-head", type=int, default=None,
            help="explicit attention head width for imported torch ViT "
                 "checkpoints whose (heads, dim_head) split is "
                 "shape-ambiguous (pytorch/VITs.py:212)",
        )
        s.add_argument(
            "--fast-softmax", choices=("auto", "on", "off"),
            default=("off" if name == "eval" else "auto"),
            help="ViT bf16 softmax chain (approximate, ~3 significant "
                 "digits; argmax-parity pinned on random-init fixtures "
                 "only). 'auto' engages it for argmax peaks-only serving; "
                 "eval defaults to 'off' so reported L2/confidence is "
                 "computed with the exact f32 chain",
        )
        s.add_argument(
            "--import-reference", action="store_true",
            help="treat <checkpoint> as a REFERENCE checkpoint (keras .h5 / "
                 "torch checkpoint.pth / TorchScript best_model.pth) and "
                 "convert it on the fly (auto-detected even without this "
                 "flag; see pose_estimation_amitai_tpu/importers.py)",
        )
        if name == "infer":
            s.add_argument(
                "--mat", action="store_true",
                help="also write a MATLAB .mat next to the .npz "
                     "(points_2d/points_3d via scipy.io.savemat) for the "
                     "lab's downstream tooling",
            )
        s.set_defaults(fn=fn)

    e = sub.add_parser(
        "export",
        help="write a self-contained serving artifact (StableHLO + weights)",
    )
    e.add_argument("config")
    e.add_argument("checkpoint")
    e.add_argument("out")
    e.add_argument("--chunk-size", type=int, default=256)
    e.add_argument("--decode", choices=("argmax", "soft", "refined"),
                   default="argmax")
    e.add_argument("--quantized", action="store_true",
                   help="export the calibrated int8 serving program "
                        "(pass --data for real calibration frames)")
    e.add_argument("--quantized-layers", choices=("all", "conv_only"),
                   default=None,
                   help="with --quantized: 'conv_only' = int8 conv decoder "
                        "+ bf16 transformer trunk (ViT mixed precision)")
    e.add_argument("--data", default="",
                   help="H5 dataset for int8 calibration (optional)")
    e.add_argument("--image-shape", type=int, nargs=3,
                   default=(192, 192, 4), metavar=("H", "W", "C"))
    e.add_argument("--out-channels", type=int, default=18)
    e.set_defaults(fn=cmd_export)

    imp = sub.add_parser(
        "import",
        help="convert a reference checkpoint (keras .h5 / torch .pth) to a "
             "native msgpack weights snapshot",
    )
    imp.add_argument("checkpoint", help="reference checkpoint file")
    imp.add_argument("out", help="output .msgpack path")
    imp.add_argument(
        "--dim-head", type=int, default=None,
        help="explicit attention head width for torch ViT checkpoints "
             "whose (heads, dim_head) split is shape-ambiguous (the "
             "reference's 'dim head' config flag, pytorch/VITs.py:212)",
    )
    imp.set_defaults(fn=cmd_import)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
