"""Inference pipeline: chunked Predictor, movie path, 3D lifting, eval.

The rebuild's first-class inference surface (SURVEY §3.5 — the reference has
no predict entry point; this is its formalisation)."""

import numpy as np
import pytest

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
from pose_estimation_amitai_tpu.infer import Predictor, evaluate_l2, lift_to_3d
from pose_estimation_amitai_tpu.models import build_model
from pose_estimation_amitai_tpu.ops import geometry

import jax
import jax.numpy as jnp

HW, IN_CH, OUT_CH = 48, 4, 6


@pytest.fixture(scope="module")
def predictor():
    cfg = Config(num_base_filters=8)
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, IN_CH)), train=False,
    )["params"]
    return Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=4)


def test_chunk_padding_consistency(predictor):
    """Decodes must be identical whether or not the tail chunk is padded."""
    rng = np.random.default_rng(0)
    frames = rng.random((10, HW, HW, IN_CH)).astype(np.float32)
    pts = predictor(frames)  # 2 full chunks + padded tail of 2
    assert pts.shape == (10, 3, OUT_CH)
    pts_movie = predictor.predict_movie(frames)
    np.testing.assert_allclose(pts, pts_movie, atol=1e-5)


def test_heatmap_return():
    cfg = Config(num_base_filters=8)
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, IN_CH)), train=False,
    )["params"]
    p = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=4,
                  return_heatmaps=True)
    frames = np.random.default_rng(1).random((5, HW, HW, IN_CH)).astype(np.float32)
    maps, pts = p(frames)
    assert maps.shape == (5, HW, HW, OUT_CH)
    assert pts.shape == (5, 3, OUT_CH)


def test_mesh_sharded_inference_matches_single(predictor):
    """Predictor on an 8-device mesh must decode identically."""
    from pose_estimation_amitai_tpu.parallel.mesh import make_mesh

    cfg = Config(num_base_filters=8)
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, IN_CH)), train=False,
    )["params"]
    mesh = make_mesh((8,))
    p_mesh = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=8,
                       mesh=mesh)
    frames = np.random.default_rng(4).random((16, HW, HW, IN_CH)).astype(
        np.float32
    )
    single = predictor(frames)
    sharded = p_mesh(frames)
    np.testing.assert_allclose(sharded, single, atol=1e-4)


def test_quantized_predictor_option():
    cfg = Config(num_base_filters=8, compute_dtype="float32")
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, IN_CH)), train=False,
    )["params"]
    frames = np.random.default_rng(7).random((8, HW, HW, IN_CH)).astype(
        np.float32
    )
    p_q = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=4,
                    use_quantized=True, calibration_frames=frames[:4])
    pts = p_q(frames)
    assert pts.shape == (8, 3, OUT_CH)
    assert np.isfinite(pts).all()


def test_soft_argmax_decode_option():
    cfg = Config(num_base_filters=8)
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, IN_CH)), train=False,
    )["params"]
    p = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=4,
                  decode="soft")
    frames = np.random.default_rng(3).random((5, HW, HW, IN_CH)).astype(
        np.float32
    )
    pts = p(frames)
    assert pts.shape == (5, 3, OUT_CH)
    # soft-argmax coordinates stay within image bounds (clamped)
    assert (pts[:, 0] >= 0).all() and (pts[:, 0] <= HW - 1).all()
    assert (pts[:, 1] >= 0).all() and (pts[:, 1] <= HW - 1).all()


def test_lift_to_3d_recovers_synthetic_geometry():
    """Project synthetic 3D points through the synthetic cameras, decode the
    crop-local ground-truth peaks, and triangulate back: the lift must
    recover points_3D to sub-millimetre accuracy."""
    arrs = make_synthetic_arrays(num_frames=4, num_points=6, seed=3)
    confmaps = arrs["confmaps"]  # (F, 4, H, W, K)
    f, ncams, h, w, k = confmaps.shape
    # ground-truth crop-local peaks from the synthetic confmaps
    from pose_estimation_amitai_tpu.ops import peaks as peaks_ops

    flat = confmaps.reshape(-1, h, w, k)
    pts = np.asarray(peaks_ops.find_peaks(jnp.asarray(flat)))  # (F*4, K, 2)
    pts = pts.reshape(f, ncams, k, 2)
    lifted = lift_to_3d(pts, arrs["cropZone"], arrs["cameras_dlt_array"])
    err = np.linalg.norm(lifted - arrs["points_3D"], axis=-1)
    # synthetic flies are ~20mm; peaks quantised to integer pixels
    assert np.median(err) < 5e-4, f"median 3D error {np.median(err)}"


def test_evaluate_l2_perfect_predictor_is_zero(predictor):
    """Evaluating against the model's own outputs gives L2 == 0."""
    rng = np.random.default_rng(2)
    frames = rng.random((6, HW, HW, IN_CH)).astype(np.float32)
    # use model outputs as "ground truth" confmaps: distances must be 0
    cfg = Config(num_base_filters=8)
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    heat = np.asarray(
        model.apply({"params": predictor.params}, jnp.asarray(frames),
                    train=False)
    )
    stats = evaluate_l2(predictor, frames, heat)
    assert stats["l2_mean"] == 0.0
    assert len(stats["l2_per_point"]) == OUT_CH


def test_predict_movie_streaming_matches_call(predictor):
    """The bounded-prefetch streaming movie path must agree with the plain
    chunked __call__ on an odd-length movie (window smaller than the chunk
    count, so eviction is exercised)."""
    rng = np.random.default_rng(5)
    frames = rng.random(
        (predictor.chunk_size * 3 + 3, HW, HW, IN_CH)
    ).astype(np.float32)
    a = predictor.predict_movie(frames, prefetch=2)
    b = predictor(frames)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_lift_to_3d_refined_decode_removes_quantisation_floor():
    """Refined sub-pixel decode of GT maps triangulates back to the true 3D
    points essentially exactly (micron scale), vs argmax's ~0.07 mm pixel
    quantisation floor."""
    arrs = make_synthetic_arrays(num_frames=4, num_points=6, seed=3)
    confmaps = arrs["confmaps"]
    f, ncams, h, w, k = confmaps.shape
    from pose_estimation_amitai_tpu.ops import peaks as peaks_ops

    flat = jnp.asarray(confmaps.reshape(-1, h, w, k))
    ref = np.transpose(
        np.asarray(peaks_ops.find_peaks_refined(flat))[:, :2, :], (0, 2, 1)
    ).reshape(f, ncams, k, 2)
    lifted = lift_to_3d(ref, arrs["cropZone"], arrs["cameras_dlt_array"])
    err = np.linalg.norm(lifted - arrs["points_3D"], axis=-1)
    assert np.median(err) < 1e-6, np.median(err)


def test_bn_model_predictor_with_batch_stats(tmp_path):
    """ResNet (BatchNorm) family through the Predictor: batch_stats must be
    threaded into apply for both the float and generic-int8 paths (round-1
    advisor finding: bare params crashed on missing batch_stats)."""
    cfg = Config(model_type="RESNET_18_POINTS_PER_WING", num_base_filters=8)
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, IN_CH)), train=False,
    )
    params, stats = variables["params"], variables["batch_stats"]
    frames = np.random.default_rng(3).random((5, HW, HW, IN_CH)).astype(
        np.float32)

    p = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=4,
                  batch_stats=stats)
    pts = p(frames)
    assert pts.shape == (5, 3, OUT_CH)
    assert np.isfinite(pts).all()

    q = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=4,
                  batch_stats=stats, use_quantized=True,
                  calibration_frames=frames[:2])
    qpts = q(frames)
    assert qpts.shape == (5, 3, OUT_CH)
    assert np.isfinite(qpts).all()


def test_from_checkpoint_restores_batch_stats(tmp_path):
    """A full checkpoint payload round-trips BN running stats into the
    Predictor (train/checkpoint.py load_variables)."""
    import jax.numpy as jnp
    from pose_estimation_amitai_tpu.train import checkpoint as ckpt
    from pose_estimation_amitai_tpu.train.loop import create_train_state

    cfg = Config(model_type="RESNET_18_POINTS_PER_WING", num_base_filters=8)
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    sample = {
        "image": jnp.zeros((2, HW, HW, IN_CH)),
        "confmaps": jnp.zeros((2, HW, HW, OUT_CH)),
    }
    state = create_train_state(model, cfg, sample, seed=0)
    # make the running stats distinguishable from a fresh init
    state = state.replace(batch_stats=jax.tree_util.tree_map(
        lambda v: v + 1.0, state.batch_stats))
    ckpt.save_checkpoint(str(tmp_path), state, epoch=0, val_loss=1.0)

    p = Predictor.from_checkpoint(
        cfg, str(tmp_path), image_shape=(HW, HW, IN_CH),
        num_output_channels=OUT_CH, chunk_size=4)
    assert "batch_stats" in p.variables
    leaf = jax.tree_util.tree_leaves(p.variables["batch_stats"])[0]
    restored = jax.tree_util.tree_leaves(state.batch_stats)[0]
    np.testing.assert_allclose(np.asarray(leaf), np.asarray(restored))


def test_disentangled_predictor_end_to_end(tmp_path):
    """The camera-matrix (FTL) family serves through the standard path:
    from_checkpoint on a trained run dir, per-sample cameras threaded
    through the chunked forward, finite L2 stats."""
    from pose_estimation_amitai_tpu import constants as C
    from pose_estimation_amitai_tpu.data.pipeline import (
        _assemble_disentangled, _camera_matrix_arrays,
    )
    from pose_estimation_amitai_tpu.train.trainer import Trainer

    arrays = make_synthetic_arrays(num_frames=4, num_points=8, image_size=48)
    cfg = Config(
        model_type=C.ALL_CAMS_DISENTANGLED_PER_WING_CNN,
        epochs=1, batch_size=4, batches_per_epoch=1, num_base_filters=8,
        base_output_path=str(tmp_path), do_augmentations=False,
        val_fraction=0.5, seed=0,
    )
    trainer = Trainer(cfg, arrays=arrays)
    trainer.train()

    pre = trainer.preprocessor
    box, confmaps = _assemble_disentangled(pre)
    P, P_inv = _camera_matrix_arrays(pre)
    cams = (np.concatenate([P, P], axis=0), np.concatenate([P_inv, P_inv], axis=0))

    pred = Predictor.from_checkpoint(
        cfg, trainer.run_path,
        image_shape=tuple(box.shape[1:]),
        num_output_channels=confmaps.shape[-1],
        chunk_size=4, cameras=cams,
    )
    stats = evaluate_l2(
        pred, box.astype(np.float32), confmaps.astype(np.float32)
    )
    assert np.isfinite(stats["l2_mean"])

    # cameras are required: a bare call must fail loudly, not crash deep
    bare = Predictor.from_checkpoint(
        cfg, trainer.run_path, image_shape=tuple(box.shape[1:]),
        num_output_channels=confmaps.shape[-1], chunk_size=4,
    )
    with pytest.raises(ValueError, match="camera"):
        bare(box[:2].astype(np.float32))


def test_checkpoint_meta_keeps_best_loss(tmp_path):
    """Resume must restore the best-so-far val loss, not the last epoch's
    (a worse post-resume epoch would overwrite best_model.msgpack)."""
    import json as _json

    from pose_estimation_amitai_tpu.train import checkpoint as ckpt
    from pose_estimation_amitai_tpu.train.loop import (
        TrainState, create_optimizer, create_train_state,
    )

    cfg = Config(num_base_filters=8)
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    batch = {
        "image": jnp.zeros((1, HW, HW, IN_CH)),
        "confmaps": jnp.zeros((1, HW, HW, OUT_CH)),
    }
    state = create_train_state(model, cfg, batch, 0)
    ckpt.save_checkpoint(str(tmp_path), state, epoch=20, val_loss=0.05,
                         best_loss=0.01)
    with open(tmp_path / "checkpoint_meta.json") as f:
        meta = _json.load(f)
    assert meta["best_loss"] == 0.01 and meta["val_loss"] == 0.05


def test_vit_peaks_only_serving_skips_normalisation():
    """The ViT-family Predictor's argmax path disables the decoder's
    per-sample min-max normalisation (monotonic -> argmax-invariant):
    peak [x, y] match the normalised model's exactly, and the
    heatmap-returning / refined-decode Predictors keep the reference
    normalisation."""
    cfg = Config(model_type="MODEL_18_POINTS_PER_WING_VIT", patch_size=16,
                 projection_dim=64, transformer_layers=2, num_heads=4,
                 dropout_ratio=0.0)
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    assert model.normalize_output is True
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, IN_CH)), train=False,
    )["params"]
    rng = np.random.default_rng(0)
    frames = rng.random((6, HW, HW, IN_CH)).astype(np.float32)

    # fast_softmax=False isolates the min-max-skip property (EXACT) from
    # the approximate bf16 softmax chain, which has its own parity test
    # (tests/test_models.py::test_vit_fast_softmax_argmax_parity)
    p_fast = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=4,
                       fast_softmax=False)
    assert p_fast.model.normalize_output is False
    assert p_fast.model.fast_softmax is False
    p_maps = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=4,
                       return_heatmaps=True)
    assert p_maps.model.normalize_output is True
    p_ref = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=4,
                      decode="refined")
    assert p_ref.model.normalize_output is True

    maps, pts_norm = p_maps(frames)
    pts_fast = p_fast(frames)
    # [x, y] identical AND vals identical: the fast path recovers the
    # normalised-model val channel from the raw maps (one read-only
    # min/max reduce — the public output contract is unchanged)
    np.testing.assert_array_equal(pts_fast[:, :2], pts_norm[:, :2])
    np.testing.assert_array_equal(pts_fast[:, 2], pts_norm[:, 2])
    # normalised heatmaps stay the reference contract: per-sample [0, 1]
    flat = maps.reshape(maps.shape[0], -1)
    np.testing.assert_allclose(flat.min(axis=1), 0.0, atol=1e-6)
    np.testing.assert_allclose(flat.max(axis=1), 1.0, atol=1e-6)


def test_vit4cam_peaks_only_val_channel_parity():
    """ViT4Cameras normalises each camera view's channel block
    independently — the peaks-only val recovery must match per view."""
    cfg = Config(model_type="ALL_CAMS_18_POINTS_VIT", patch_size=16,
                 projection_dim=32, transformer_layers=1, num_heads=2,
                 dropout_ratio=0.0)
    in_ch, out_ch = 16, 8  # 4 views x 4 image channels / x 2 maps
    model = build_model(cfg, (HW, HW, in_ch), out_ch)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, in_ch)), train=False,
    )["params"]
    frames = np.random.default_rng(2).random((5, HW, HW, in_ch)).astype(
        np.float32
    )
    # fast_softmax=False: this pins the EXACT per-view val recovery (the
    # bf16 softmax chain is approximate and tested separately)
    p_fast = Predictor(cfg, params, (HW, HW, in_ch), out_ch, chunk_size=4,
                       fast_softmax=False)
    assert p_fast._val_renorm_views == 4
    p_norm = Predictor(cfg, params, (HW, HW, in_ch), out_ch, chunk_size=4,
                       return_heatmaps=True)
    _, pts_norm = p_norm(frames)
    pts_fast = p_fast(frames)
    np.testing.assert_array_equal(pts_fast, pts_norm)


def test_quantized_layers_conv_only_predictor():
    """`quantized_layers='conv_only'` (the ViT mixed-precision serving
    mode) is reachable from the Predictor and decodes finite peaks close
    to the float model's."""
    cfg = Config(model_type="MODEL_18_POINTS_PER_WING_VIT", patch_size=16,
                 projection_dim=64, transformer_layers=2, num_heads=4,
                 dropout_ratio=0.0, compute_dtype="float32")
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, IN_CH)), train=False,
    )["params"]
    frames = np.random.default_rng(5).random((6, HW, HW, IN_CH)).astype(
        np.float32
    )
    p_mixed = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=4,
                        use_quantized=True, calibration_frames=frames[:4],
                        quantized_layers="conv_only")
    p_float = Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH, chunk_size=4)
    pts_m, pts_f = p_mixed(frames), p_float(frames)
    assert np.isfinite(pts_m).all()
    d = np.linalg.norm(pts_m[:, :2] - pts_f[:, :2], axis=1)
    assert np.median(d) <= 2.0, np.median(d)
    with pytest.raises(ValueError):
        Predictor(cfg, params, (HW, HW, IN_CH), OUT_CH,
                  use_quantized=True, calibration_frames=frames[:4],
                  quantized_layers="bogus")


def test_quantized_disentangled_predictor_builds_and_runs():
    """The generic-int8 Predictor path for camera-matrix models calibrates
    on (frames, P, P_inv) positional tuples — regression for the
    list-of-tuples-through-np.asarray crash."""
    cfg = Config(model_type="ALL_CAMS_DISENTANGLED_PER_WING_CNN",
                 num_base_filters=8, compute_dtype="float32")
    in_ch, out_ch, S = 16, 8, 6
    rng = np.random.default_rng(11)
    frames = rng.random((S, HW, HW, in_ch)).astype(np.float32)
    # plausible random cameras: finite P with well-conditioned pinv
    P = rng.standard_normal((S, 4, 3, 4)).astype(np.float32)
    P_inv = np.stack([np.linalg.pinv(P[i]) for i in range(S)]).astype(
        np.float32
    )
    model = build_model(cfg, (HW, HW, in_ch), out_ch)
    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, in_ch)),
        jnp.asarray(P[:1]), jnp.asarray(P_inv[:1]), train=False,
    )
    p = Predictor(
        cfg, variables["params"], (HW, HW, in_ch), out_ch, chunk_size=4,
        cameras=(P, P_inv), use_quantized=True,
        calibration_frames=frames[:4],
        batch_stats=variables.get("batch_stats"),
    )
    pts = p(frames)
    assert pts.shape == (S, 3, out_ch)
    assert np.isfinite(pts[:, :2]).all()


@pytest.mark.quick
def test_cli_eval_defaults_to_exact_softmax(tmp_path, capsys):
    """advisor r4: ``cli eval`` is the accuracy surface — the approximate
    bf16 fast-softmax chain must NOT auto-engage there (it remains an
    explicit opt-in via --fast-softmax on), and the emitted JSON documents
    which chain produced the numbers."""
    import json as _json

    from pose_estimation_amitai_tpu import constants as C
    from pose_estimation_amitai_tpu.cli import main as cli_main
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.data.synthetic import write_synthetic_h5
    from pose_estimation_amitai_tpu.models import build_model
    from pose_estimation_amitai_tpu.train import checkpoint as ckpt

    data = str(tmp_path / "data.h5")
    write_synthetic_h5(data, num_frames=3, num_points=8, image_size=48)

    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        _json.dump({"model type": C.MODEL_18_POINTS_PER_WING_VIT,
                    "batch size": 4, "model parameters": {
                        "patch size": 16, "projection dim": 32,
                        "num heads": 2, "transformer layers": 1}}, f)
    cfg = Config.from_json(cfg_path)
    # mirror cmd_eval's channel derivation (same Preprocessor)
    from pose_estimation_amitai_tpu.data.preprocess import Preprocessor

    pre = Preprocessor(cfg.replace(data_path=data, debug_mode=False))
    pre.do_preprocess()
    in_shape = tuple(pre.get_box().shape[1:])
    out_ch = pre.get_confmaps().shape[-1]
    model = build_model(cfg, in_shape, out_ch)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, *in_shape), jnp.bfloat16), train=False,
    )["params"]
    ckpt_path = str(tmp_path / "params.msgpack")
    ckpt.save_params(ckpt_path, params)

    assert cli_main(["eval", cfg_path, ckpt_path, data,
                     "--chunk-size", "8"]) == 0
    stats = _json.loads(capsys.readouterr().out)
    assert stats["softmax"] == "exact"

    assert cli_main(["eval", cfg_path, ckpt_path, data,
                     "--chunk-size", "8", "--fast-softmax", "on"]) == 0
    stats = _json.loads(capsys.readouterr().out)
    assert stats["softmax"] == "fast_bf16"
