"""Device dataset: split semantics, epoch batch ring, gather.

Parity targets: pytorch/Datagenerators.py:39-65 (wrap-around index ring) and
:109-115 (val split)."""

import numpy as np

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.pipeline import DeviceDataset, build_dataset
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays


def _dataset(n=10, val_fraction=0.3):
    rng = np.random.default_rng(0)
    data = {
        "box": rng.random((n, 8, 8, 4)).astype(np.float32),
        "confmaps": rng.random((n, 8, 8, 3)).astype(np.float32),
    }
    cfg = Config(val_fraction=val_fraction, seed=1)
    return DeviceDataset(cfg, data), data


def test_split_disjoint_and_complete():
    ds, _ = _dataset(10, 0.3)
    assert len(ds.val_inds) == 3
    assert len(ds.train_inds) == 7
    assert set(ds.val_inds) | set(ds.train_inds) == set(range(10))
    assert not set(ds.val_inds) & set(ds.train_inds)


def test_epoch_ring_wraps_and_covers():
    ds, _ = _dataset(10, 0.3)  # 7 train samples
    ds.shuffle_train_indices()
    seen = []
    for _ in range(3):  # 3 batches of 4 > 7 -> wrap
        seen.extend(ds.next_batch_indices(4).tolist())
    assert len(seen) == 12
    # first 7 draws cover every train index exactly once
    assert sorted(seen[:7]) == sorted(ds.train_inds.tolist())
    # all draws stay within the train split
    assert set(seen) <= set(ds.train_inds.tolist())


def test_step_indices_shape():
    ds, _ = _dataset(10)
    idx = ds.step_indices(batch_size=3, accum_steps=2)
    assert idx.shape == (2, 3)
    assert idx.dtype == np.int32


def test_gather_matches_source():
    ds, data = _dataset(10)
    ids = np.asarray([2, 5], np.int32)
    batch = ds.gather(ids)
    np.testing.assert_allclose(np.asarray(batch["image"]), data["box"][[2, 5]])
    np.testing.assert_allclose(
        np.asarray(batch["confmaps"]), data["confmaps"][[2, 5]]
    )


def test_estimate_cameras_from_peaks():
    """DLT cameras re-estimated from decoded GT peaks must reproject the
    3D points close to the decoded peaks (CustomDataGenerator parity,
    tensorflow/Custom_data_generator.py:216-241)."""
    import jax.numpy as jnp

    from pose_estimation_amitai_tpu.data.pipeline import (
        estimate_cameras_from_peaks,
    )
    from pose_estimation_amitai_tpu.data.preprocess import Preprocessor
    from pose_estimation_amitai_tpu.ops import geometry

    arrays = make_synthetic_arrays(num_frames=3, num_points=8, image_size=96)
    confmaps = arrays["confmaps"]
    cropzone = arrays["cropZone"]
    pts3d = arrays["points_3D"]
    P, P_inv = estimate_cameras_from_peaks(confmaps, cropzone, pts3d)
    assert P.shape == (3, 4, 3, 4)
    assert P_inv.shape == (3, 4, 4, 3)
    # reproject: estimated cameras must map the 3D points back onto the
    # decoded full-sensor peaks (integer-pixel decode tolerance)
    from pose_estimation_amitai_tpu.data.preprocess import find_peaks_np

    for f in range(3):
        for c in range(4):
            pk = find_peaks_np(confmaps[f : f + 1, c])[0, :2, :].T  # (K, 2)
            full = np.asarray(
                geometry.uncrop_points(
                    jnp.asarray(pk, jnp.float32),
                    jnp.asarray(cropzone[f, c], jnp.float32),
                )
            )
            proj = np.asarray(
                geometry.reproject(jnp.asarray(P[f, c]),
                                   jnp.asarray(pts3d[f]))
            )
            err = np.linalg.norm(proj - full, axis=-1)
            assert np.median(err) < 3.0, np.median(err)


def test_build_dataset_flagship_per_wing():
    """build_dataset on the flagship model yields per-wing samples with
    4-channel inputs (3 time + 1 mask) — reference do_preprocess_18_pnts."""
    arrays = make_synthetic_arrays(num_frames=4, num_points=8, image_size=48)
    cfg = Config(batch_size=2, val_fraction=0.5)
    ds, pre = build_dataset(cfg, arrays)
    box = np.asarray(ds.data["box"])
    cm = np.asarray(ds.data["confmaps"])
    assert box.shape[0] == cm.shape[0]
    assert box.shape[-1] == 4
    assert box.shape[1:3] == (48, 48)
    # per-wing: half the wing points + head/tail
    assert cm.shape[-1] == 8 // 2 + 2


def test_host_dataset_matches_device_dataset_training():
    """HostDataset (streaming feed for datasets beyond the HBM budget) must
    train equivalently to DeviceDataset: same split, same batches, matching
    losses over several steps."""
    import jax.numpy as jnp

    from pose_estimation_amitai_tpu.data.pipeline import (
        DeviceDataset, HostDataset,
    )
    from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
    from pose_estimation_amitai_tpu.models import build_model
    from pose_estimation_amitai_tpu.train import loop as L

    cfg = Config(
        model_type="MODEL_18_POINTS_PER_WING", batch_size=4,
        num_base_filters=8, dropout_ratio=0.0, do_augmentations=True,
        rotation_range=20.0, xy_shifts=3.0,
    )
    arrays = make_synthetic_arrays(num_frames=6, num_points=6, image_size=48,
                                   seed=3)
    ds_dev, _ = build_dataset(cfg, dict(arrays))
    assert type(ds_dev) is DeviceDataset
    # build the host twin from the SAME preprocessed arrays
    from pose_estimation_amitai_tpu.data.preprocess import Preprocessor

    pre = Preprocessor(cfg, dict(arrays))
    pre.do_preprocess()
    data_np = {"box": pre.get_box(), "confmaps": pre.get_confmaps()}
    ds_host = HostDataset(cfg, data_np)

    np.testing.assert_array_equal(ds_dev.train_inds, ds_host.train_inds)

    model = build_model(cfg, ds_dev.data["box"].shape[1:],
                        ds_dev.data["confmaps"].shape[-1])
    sample = ds_dev.gather(np.asarray(ds_dev.train_inds[:2], np.int32))
    state_a = L.create_train_state(model, cfg, sample, seed=0)
    state_b = state_a
    step = L.make_train_step(model, cfg)

    for _ in range(3):
        idx = ds_dev.step_indices(cfg.batch_size, 1)
        da, ia = ds_dev.step_payload(idx)
        state_a, loss_a = step(state_a, da, ia, jnp.float32(1.0))
        db, ib = ds_host.step_payload(idx)
        state_b, loss_b = step(state_b, db, ib, jnp.float32(1.0))
        assert abs(float(loss_a) - float(loss_b)) < 1e-5, (
            float(loss_a), float(loss_b),
        )


def test_build_dataset_auto_switches_to_host():
    from pose_estimation_amitai_tpu.data.pipeline import HostDataset
    from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays

    cfg = Config(model_type="MODEL_18_POINTS_PER_WING",
                 device_dataset_budget_mb=1)
    arrays = make_synthetic_arrays(num_frames=6, num_points=6, image_size=48,
                                   seed=3)
    ds, _ = build_dataset(cfg, arrays)
    assert type(ds) is HostDataset
    assert isinstance(ds.data["box"], np.ndarray)


def test_estimate_cameras_config_knob():
    """`estimate_cameras: 1` swaps the disentangled camera source from the
    calibrated cameras_dlt_array to per-frame DLT estimation from GT peaks
    (tensorflow/Custom_data_generator.py:216-241). The estimated cameras
    must agree with the calibrated ones up to decode quantisation: both
    project the 3D points to nearly the same full-sensor pixels."""
    import jax.numpy as jnp

    from pose_estimation_amitai_tpu import constants as C
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.data.pipeline import build_dataset
    from pose_estimation_amitai_tpu.ops import geometry

    arrays = make_synthetic_arrays(num_frames=3, num_points=8, image_size=96,
                                   seed=3)
    base = dict(model_type=C.ALL_CAMS_DISENTANGLED_PER_WING_CNN,
                val_fraction=0.5, seed=0)
    ds_cal, pre = build_dataset(Config(**base),
                                {k: v.copy() for k, v in arrays.items()})
    ds_est, _ = build_dataset(Config(estimate_cameras=True, **base),
                              {k: v.copy() for k, v in arrays.items()})
    P_cal = np.asarray(ds_cal.data["P"])  # (2F, 4, 3, 4)
    P_est = np.asarray(ds_est.data["P"])
    assert P_est.shape == P_cal.shape
    pts = jnp.asarray(pre.points_3d, jnp.float32)  # (F, K, 3)
    F = pts.shape[0]
    errs = []
    for s in range(P_cal.shape[0]):
        f = s % F
        for c in range(4):
            a = np.asarray(geometry.reproject(jnp.asarray(P_cal[s, c]), pts[f]))
            b = np.asarray(geometry.reproject(jnp.asarray(P_est[s, c]), pts[f]))
            errs.append(np.linalg.norm(a - b, axis=-1))
    med = np.median(np.concatenate(errs))
    assert med < 3.0, med
