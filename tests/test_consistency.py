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
