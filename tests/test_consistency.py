"""Left/right 3D consistency checker (reference:
pytorch/preprocessor.py:271-346 — score all 8 flip combinations of cameras
1-3 by multi-view reprojection error, pick the best)."""

import pytest
import numpy as np

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.preprocess import (
    Preprocessor,
    find_peaks_np,
)
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays

pytestmark = pytest.mark.quick  # gate-style subset: python -m pytest -m quick


def _gt_points_2d(arrays):
    """(F, cams, K, 2) crop-local ground-truth peaks from the confmaps."""
    cm = arrays["confmaps"]
    f, ncams, h, w, k = cm.shape
    pk = find_peaks_np(cm.reshape(-1, h, w, k))[:, :2, :]  # (F*cams, 2, K)
    return np.transpose(pk.reshape(f, ncams, 2, k), (0, 1, 3, 2))


def test_consistent_input_needs_no_flip():
    arrays = make_synthetic_arrays(num_frames=3, num_points=8, image_size=96)
    pre = Preprocessor(Config(model_type=C.MODEL_18_POINTS_PER_WING), arrays)
    pts = _gt_points_2d(arrays)[..., :-2, :]  # wing points only
    flips = pre.ensure_right_left_consistency(pts)
    assert flips.shape == (3, 3)
    assert not flips.any(), flips


def test_swapped_camera_detected():
    arrays = make_synthetic_arrays(num_frames=3, num_points=8, image_size=96)
    pre = Preprocessor(Config(model_type=C.MODEL_18_POINTS_PER_WING), arrays)
    pts = _gt_points_2d(arrays)[..., :-2, :].copy()
    # swap left/right wings in camera 2 for every frame
    li, ri = pre.left_inds, pre.right_inds
    tmp = pts[:, 2, li].copy()
    pts[:, 2, li] = pts[:, 2, ri]
    pts[:, 2, ri] = tmp
    flips = pre.ensure_right_left_consistency(pts)
    # camera 2 (index 1 of cams_to_check [1,2,3]) must be flagged, alone
    expected = np.zeros((3, 3), bool)
    expected[:, 1] = True
    np.testing.assert_array_equal(flips, expected)


def test_config_reachable_repair_restores_swapped_camera():
    """Round-2 verdict #4: with ``ensure_3d_consistency`` on, a dataset
    whose camera 2 carries deliberately swapped left/right wings (masks AND
    confmap channel blocks) preprocesses to the SAME samples as the clean
    dataset — the repair is applied before the per-wing split, resolving
    the reference's dead code (pytorch/preprocessor.py:237-241)
    consciously."""
    arrays = make_synthetic_arrays(num_frames=3, num_points=8, image_size=96)

    def run(arrs, **cfg_kw):
        p = Preprocessor(
            Config(model_type=C.MODEL_18_POINTS_PER_WING, **cfg_kw),
            {k: v.copy() for k, v in arrs.items()},
        )
        p.do_preprocess()
        return p

    clean = run(arrays)

    swapped = {k: v.copy() for k, v in arrays.items()}
    pre_probe = Preprocessor(
        Config(model_type=C.MODEL_18_POINTS_PER_WING),
        {k: v.copy() for k, v in arrays.items()},
    )
    li, ri = pre_probe.left_inds, pre_probe.right_inds
    lm, rm = pre_probe.left_mask_ind, pre_probe.right_mask_ind
    cam = 2
    cm = swapped["confmaps"]
    tmp = cm[:, cam, ..., li].copy()
    cm[:, cam, ..., li] = cm[:, cam, ..., ri]
    cm[:, cam, ..., ri] = tmp
    bx = swapped["box"]
    bx[:, cam, ..., [lm, rm]] = bx[:, cam, ..., [rm, lm]]

    # without the repair, the swap leaks into the samples
    broken = run(swapped)
    assert np.abs(broken.get_confmaps() - clean.get_confmaps()).max() > 1e-3

    repaired = run(swapped, ensure_3d_consistency=True)
    np.testing.assert_allclose(repaired.get_box(), clean.get_box())
    np.testing.assert_allclose(repaired.get_confmaps(), clean.get_confmaps())
