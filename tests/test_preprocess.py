"""Offline preprocessing semantics vs the reference's contracts."""

import numpy as np
import pytest

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.preprocess import Preprocessor
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays

pytestmark = pytest.mark.quick  # gate-style subset: python -m pytest -m quick


@pytest.fixture(scope="module")
def arrays():
    return make_synthetic_arrays(num_frames=5, num_points=8, image_size=48,
                                 seed=1)


def _pre(arrays, model_type, **kw):
    cfg = Config(model_type=model_type, **kw)
    p = Preprocessor(cfg, {k: v.copy() for k, v in arrays.items()})
    p.do_preprocess()
    return p


def test_per_wing_split_shapes(arrays):
    p = _pre(arrays, C.MODEL_18_POINTS_PER_WING)
    box, cm = p.get_box(), p.get_confmaps()
    # 2 wings x 5 frames x 4 cams samples; 4 = 3 time + 1 mask channels
    assert box.shape == (2 * 5 * 4, 48, 48, 4)
    # half the wing points + head/tail
    assert cm.shape == (2 * 5 * 4, 48, 48, 4 + 2)
    assert box.dtype == np.float32
    assert 0.0 <= box.min() and box.max() <= 1.0


def test_mask_matches_wing_confmaps(arrays):
    """Each per-wing sample's mask must cover its own wing's peaks
    (split_per_wing contract, pytorch/preprocessor.py:151-269)."""
    p = _pre(arrays, C.MODEL_18_POINTS_PER_WING)
    box, cm = p.get_box(), p.get_confmaps()
    covered = 0
    for s in range(box.shape[0]):
        mask = box[s, :, :, 3] > 0
        wing_cm = cm[s, :, :, :-2]
        ys, xs, _ = np.unravel_index(
            np.argmax(wing_cm.reshape(-1, wing_cm.shape[-1]), axis=0)
            * wing_cm.shape[-1] + np.arange(wing_cm.shape[-1]),
            wing_cm.shape,
        )
        hits = mask[ys, xs].mean()
        covered += hits
    # synthetic masks are coarse ellipses; most peaks must fall inside
    assert covered / box.shape[0] > 0.6


def test_all_cams_18_points(arrays):
    p = _pre(arrays, C.ALL_CAMS_18_POINTS)
    box, cm = p.get_box(), p.get_confmaps()
    assert box.shape == (2 * 5, 48, 48, 4 * 4)
    assert cm.shape == (2 * 5, 48, 48, 4 * (4 + 2))


def test_head_tail_per_cam(arrays):
    p = _pre(arrays, C.HEAD_TAIL_PER_CAM)
    box, cm = p.get_box(), p.get_confmaps()
    assert box.shape == (5 * 4, 48, 48, 3)  # time channels only
    assert cm.shape == (5 * 4, 48, 48, 2)  # head + tail


def test_head_tail_all_cams(arrays):
    p = _pre(arrays, C.HEAD_TAIL_ALL_CAMS)
    box, cm = p.get_box(), p.get_confmaps()
    assert box.shape == (5, 48, 48, 4 * 5)
    assert cm.shape == (5, 48, 48, 4 * 2)


def test_head_tail_native_movie_pair(arrays):
    """Head-tail datasets may ship a leading movie-pair dim (2, F, cams,
    H, W, C) (tensorflow/preprocessor.py:48-63): the loader flattens pairs
    into frames for both head-tail layouts."""
    paired = dict(arrays)
    paired["box"] = np.stack([arrays["box"], arrays["box"][::-1]])
    paired["confmaps"] = np.stack(
        [arrays["confmaps"], arrays["confmaps"][::-1]]
    )
    p = _pre(paired, C.HEAD_TAIL_PER_CAM)
    assert p.get_box().shape == (2 * 5 * 4, 48, 48, 3)
    assert p.get_confmaps().shape == (2 * 5 * 4, 48, 48, 2)

    p = _pre(paired, C.HEAD_TAIL_ALL_CAMS)
    assert p.get_box().shape == (2 * 5, 48, 48, 4 * 5)
    assert p.get_confmaps().shape == (2 * 5, 48, 48, 4 * 2)
    # pair flattening preserves frame content: movie 0 frame 0 == unpaired
    single = _pre(arrays, C.HEAD_TAIL_ALL_CAMS)
    np.testing.assert_array_equal(p.get_box()[:5], single.get_box())


def test_three_good_cameras(arrays):
    p = _pre(arrays, C.MODEL_18_POINTS_3_GOOD_CAMERAS)
    box, cm = p.get_box(), p.get_confmaps()
    assert box.shape == (2 * 5 * 3, 48, 48, 4)
    assert cm.shape[0] == 2 * 5 * 3


def test_debug_mode_truncates():
    arrays = make_synthetic_arrays(num_frames=14, num_points=8, image_size=48)
    p = _pre(arrays, C.MODEL_18_POINTS_PER_WING, debug_mode=True)
    # 10-frame truncation (pytorch/preprocessor.py:42-51) -> 2*10*4 samples
    assert p.get_box().shape[0] == 2 * 10 * 4


def test_fix_movie_masks_fills_from_neighbours(arrays):
    cfg = Config(model_type=C.MODEL_18_POINTS_PER_WING)
    p = Preprocessor(cfg, {k: v.copy() for k, v in arrays.items()})
    box = p.box.copy()
    # blank the left wing mask of frame 2, camera 1
    t = p.num_time_channels
    box[2, 1, :, :, t] = 0.0
    fixed, problematic = p.fix_movie_masks(box)
    assert (2, 1, 0) in problematic
    repaired = fixed[2, 1, :, :, t]
    assert repaired.any(), "mask not repaired"
    # union of the neighbour masks, binarised
    neighbours = (p.box[1, 1, :, :, t] + p.box[3, 1, :, :, t] > 0)
    np.testing.assert_array_equal(repaired > 0, neighbours)


def test_curriculum_sorting(arrays):
    p = _pre(arrays, C.PER_WING_MODEL, do_curriculum_learning=True)
    assert p.get_box().shape[0] == 2 * 5 * 4


def test_points3d_matches_sample_channels(arrays):
    """get_points_3D_per_wing()[s, k] must be the 3D point whose projection
    is sample s's confmap channel k — i.e. the per-wing 3D split follows
    split_per_wing's cross-wiring."""
    import jax.numpy as jnp

    from pose_estimation_amitai_tpu.ops import geometry
    from pose_estimation_amitai_tpu.data.preprocess import find_peaks_np

    # 96px crops: at 48px many synthetic keypoints clip at crop borders
    arrays = make_synthetic_arrays(num_frames=4, num_points=8, image_size=96,
                                   seed=2)
    p = _pre(arrays, C.MODEL_18_POINTS_PER_WING)
    cm = p.get_confmaps()  # (2F*cams, H, W, K)
    pts3d = p.get_points_3D_per_wing()  # (2F, K, 3)
    cz = p.get_cropzone()  # (F, cams, 2)
    cams = p.camera_matrices
    ncams = cz.shape[1]
    F = cz.shape[0]
    errs = []
    for s in range(cm.shape[0]):
        wf, cam = divmod(s, ncams)
        f = wf % F
        pk = find_peaks_np(cm[s : s + 1])[0, :2, :].T  # (K, 2) crop-local
        full = np.asarray(geometry.uncrop_points(
            jnp.asarray(pk, jnp.float32), jnp.asarray(cz[f, cam], jnp.float32)
        ))
        proj = np.asarray(geometry.reproject(
            jnp.asarray(cams[cam]), jnp.asarray(pts3d[wf])
        ))
        errs.append(np.linalg.norm(full - proj, axis=-1))
    errs = np.concatenate(errs)
    # integer-pixel decode + crop-clipped outliers; the bulk must match
    assert np.median(errs) < 2.0, np.median(errs)


def test_single_time_channel(arrays):
    p = _pre(arrays, C.MODEL_18_POINTS_PER_WING, single_time_channel=True)
    # centre time channel + one wing mask per sample
    assert p.get_box().shape[-1] == 2


def test_single_time_channel_ranking_and_curriculum(arrays):
    """Net-wing ranking + curriculum sort with the 2-channel per-wing
    layout: channel indices must be derived, not the reference's
    hard-coded 3-time-channel values (which index out of bounds here)."""
    p = _pre(arrays, C.MODEL_18_POINTS_3_GOOD_CAMERAS,
             single_time_channel=True, do_curriculum_learning=True)
    box = p.get_box()
    assert box.shape[-1] == 2 and box.shape[0] == 2 * 5 * 3


def test_cropzone_per_wing_follows_sample_order(arrays):
    """Per-wing samples are block-ordered (all left wings, then all right
    wings — same contract test_points3d_matches_sample_channels pins), so
    sample wf's crop offsets are frame ``wf % F``'s."""
    p = _pre(arrays, C.MODEL_18_POINTS_PER_WING)
    cz = p.get_cropzone()
    czpw = p.get_cropzone_per_wing()
    F = cz.shape[0]
    assert czpw.shape[0] == 2 * F
    for wf in range(2 * F):
        np.testing.assert_array_equal(czpw[wf], cz[wf % F])


def test_mix_with_test(arrays, tmp_path):
    from pose_estimation_amitai_tpu.data.synthetic import write_synthetic_h5

    test_h5 = str(tmp_path / "test.h5")
    write_synthetic_h5(test_h5, num_frames=3, num_points=8, image_size=48,
                       seed=9)
    cfg = Config(model_type=C.MODEL_18_POINTS_PER_WING, mix_with_test=True,
                 test_path=test_h5)
    p = Preprocessor(cfg, {k: v.copy() for k, v in arrays.items()})
    p.do_preprocess()
    # 5 train + 3 test frames -> 2 wings x 8 frames x 4 cams samples
    assert p.get_box().shape[0] == 2 * (5 + 3) * 4


def test_all_cams_all_points_reshape(arrays):
    """ALL_CAMS_ALL_POINTS concatenates all 4 cameras on channels for both
    box and confmaps (tensorflow/preprocessor.py:163-185); every camera
    block keeps its full (T + 2 masks) channel set."""
    p = _pre(arrays, C.ALL_CAMS_ALL_POINTS)
    box, cm = p.get_box(), p.get_confmaps()
    # 5 frames; 4 cams x (3 time + 2 masks) box channels
    assert box.shape == (5, 48, 48, 4 * 5)
    # 4 cams x (8 wing points + head/tail) confmap channels
    assert cm.shape == (5, 48, 48, 4 * (8 + 2))
    # mask channels stay binary-ish after adjust_mask
    for cam in range(4):
        for m in (3, 4):
            vals = np.unique(box[..., cam * 5 + m])
            assert set(vals).issubset({0.0, 1.0})


def test_dispatch_matches_reference_routing(arrays):
    """Every reference-dispatchable string routes to the reference's
    preprocess path (tensorflow/preprocessor.py:119-146 union
    pytorch/preprocessor.py:120-134). Regression: RESNET/VIT_TO_POINTS fell
    to the per-wing path, ALL_CAMS_VIT to per-wing, TWO_WINGS_TOGATHER and
    HEAD_TAIL to the wrong families."""
    routes = {
        C.RESNET_18_POINTS_PER_WING: "do_preprocess_18_pnts",
        C.MODEL_18_POINTS_PER_WING_VIT_TO_POINTS: "do_preprocess_18_pnts",
        C.ALL_CAMS_VIT: "reshape_for_all_cams_18_points",
        C.VIT_4_CAMERAS: "reshape_for_all_cams_18_points",
        C.TWO_WINGS_TOGATHER: "reshape_to_cnn_input",
        C.HEAD_TAIL: "reshape_to_cnn_input",
        C.ALL_CAMS_ALL_POINTS: "reshape_to_all_cams_all_points",
        C.HEAD_TAIL_PER_CAM: "do_preprocess_head_tail_per_cam",
    }
    for mt, fn_name in routes.items():
        cfg = Config(model_type=mt)
        p = Preprocessor(cfg, {k: v.copy() for k, v in arrays.items()})
        assert p._dispatch().__func__.__name__ == fn_name, mt


def test_resnet_18_points_shapes(arrays):
    """RESNET_18_POINTS_PER_WING gets the 18-pnts layout (per-wing samples
    with head/tail target channels), not the plain per-wing one."""
    p = _pre(arrays, C.RESNET_18_POINTS_PER_WING)
    box, cm = p.get_box(), p.get_confmaps()
    assert box.shape == (2 * 5 * 4, 48, 48, 4)
    assert cm.shape == (2 * 5 * 4, 48, 48, 4 + 2)


def test_all_cams_vit_shapes(arrays):
    """ALL_CAMS_VIT consumes the 4-camera channel-concat layout
    (tensorflow/preprocessor.py:142-146)."""
    p = _pre(arrays, C.ALL_CAMS_VIT)
    box, cm = p.get_box(), p.get_confmaps()
    assert box.shape == (2 * 5, 48, 48, 4 * 4)
    assert cm.shape == (2 * 5, 48, 48, 4 * (4 + 2))


def test_two_wings_togather_shapes(arrays):
    """TWO_WINGS_TOGATHER keeps the ALL_POINTS layout: per-camera samples
    with both wing masks + all wing points."""
    p = _pre(arrays, C.TWO_WINGS_TOGATHER)
    box, cm = p.get_box(), p.get_confmaps()
    assert box.shape == (5 * 4, 48, 48, 5)
    assert cm.shape == (5 * 4, 48, 48, 8 + 2)


def test_two_good_cameras(arrays):
    """TRAIN_ON_2_GOOD_CAMERAS_MODEL keeps the 2 best cameras per frame
    (tensorflow/preprocessor.py:453-455)."""
    p = _pre(arrays, C.TRAIN_ON_2_GOOD_CAMERAS_MODEL)
    box, cm = p.get_box(), p.get_confmaps()
    assert box.shape == (2 * 5 * 2, 48, 48, 4)
    assert cm.shape[0] == 2 * 5 * 2


def test_all_cams_and_3_good_cams(arrays):
    """ALL_CAMS_AND_3_GOOD_CAMS selects the 3 best cameras then concats
    them on channels (tensorflow/preprocessor.py:457-463)."""
    p = _pre(arrays, C.ALL_CAMS_AND_3_GOOD_CAMS)
    box, cm = p.get_box(), p.get_confmaps()
    assert box.shape == (2 * 5, 48, 48, 3 * 4)
    # per-wing split halves the 10 confmap channels -> 5 per camera
    assert cm.shape == (2 * 5, 48, 48, 3 * 5)


def test_per_wing_movie_pair_and_debug_truncation(arrays):
    """6-D movie-pair files work through the per-wing path, and debug mode
    truncates the FRAME axis of pair files, not the pair axis
    (tensorflow/preprocessor.py:52-58, 444-449)."""
    paired = dict(arrays)
    paired["box"] = np.stack([arrays["box"], arrays["box"][::-1]])
    paired["confmaps"] = np.stack(
        [arrays["confmaps"], arrays["confmaps"][::-1]]
    )
    p = _pre(paired, C.PER_WING_MODEL)
    assert p.get_box().shape == (2 * 2 * 5 * 4, 48, 48, 4)

    p = _pre(paired, C.PER_WING_MODEL, debug_mode=True)
    # 5 frames/movie < 10-frame cap: nothing lost, pair axis intact
    assert p.get_box().shape == (2 * 2 * 5 * 4, 48, 48, 4)


def test_pair_file_camera_getters_refuse(arrays):
    """6-D movie-pair files only define box/confmaps per (movie, frame);
    cropzone/points_3D are not movie-resolved, so camera/3D consumption of
    a pair file must hard-fail instead of silently using misaligned
    offsets (round-2 ADVICE, data/preprocess.py debug truncation)."""
    paired = dict(arrays)
    paired["box"] = np.stack([arrays["box"], arrays["box"][::-1]])
    paired["confmaps"] = np.stack(
        [arrays["confmaps"], arrays["confmaps"][::-1]]
    )
    p = _pre(paired, C.PER_WING_MODEL)
    for getter in (p.get_cropzone, p.get_cropzone_per_wing,
                   p.get_points_3D_per_wing):
        with pytest.raises(ValueError, match="movie-pair"):
            getter()
    # non-pair datasets keep working
    q = _pre(arrays, C.PER_WING_MODEL)
    assert q.get_cropzone().shape[0] == arrays["box"].shape[0]


def test_mix_with_test_poisons_cropzone_consumption(arrays, tmp_path):
    """Round-2 verdict #7: frames mixed in from a test file carry
    replicated (fabricated) crop offsets — they must not silently reach
    3D lift. The plain getter refuses; the explicit escape hatch exposes a
    validity mask marking exactly the mixed-in tail."""
    from pose_estimation_amitai_tpu.data.synthetic import write_synthetic_h5

    test_h5 = str(tmp_path / "test.h5")
    write_synthetic_h5(test_h5, num_frames=3, num_points=8, image_size=48,
                       seed=9)
    cfg = Config(model_type=C.MODEL_18_POINTS_PER_WING, mix_with_test=True,
                 test_path=test_h5)
    p = Preprocessor(cfg, {k: v.copy() for k, v in arrays.items()})
    p.do_preprocess()

    with pytest.raises(ValueError, match="fabricated"):
        p.get_cropzone_per_wing()

    valid = p.get_cropzone_valid_per_wing()
    F = 5 + 3
    assert valid.shape == (2 * F,)
    # per-wing order is block-tiled: [frames, frames]; the 3 mixed-in
    # frames sit at the tail of each block
    expected = np.ones(F, bool)
    expected[5:] = False
    np.testing.assert_array_equal(valid, np.tile(expected, 2))

    # unmixed datasets keep the plain getter working
    q = _pre(arrays, C.MODEL_18_POINTS_PER_WING)
    assert q.get_cropzone_per_wing().shape[0] == 10


def test_body_parts_mask_swap_repair(arrays):
    """reshape_to_body_parts must SWAP mislabeled part masks (peak 0 sits
    in the channel-4 mask and peak 1 in the channel-3 mask) and leave
    consistent images untouched. Also pins the aliasing fix: the swap
    assigns from copies, not from views of the channels being overwritten
    (the reference's in-place swap pattern, pytorch/preprocessor.py:551-588,
    silently wrote the same mask into both channels)."""
    p = Preprocessor(Config(model_type=C.BODY_PARTS_MODEL),
                     {k: v.copy() for k, v in arrays.items()})
    f, c, h, w, _ = p.box.shape
    box = np.zeros_like(p.box)
    cm = np.zeros_like(p.confmaps)
    # two disjoint square masks: A (top-left), B (bottom-right)
    A = (slice(4, 12), slice(4, 12))
    B = (slice(30, 40), slice(30, 40))
    box[:, :, A[0], A[1], 3] = 1.0  # channel 3 = "left" part mask at A
    box[:, :, B[0], B[1], 4] = 1.0  # channel 4 = "right" part mask at B
    # frame 0: consistent (peak 0 in A, peak 1 in B)
    cm[0, :, 8, 8, 0] = 1.0
    cm[0, :, 34, 34, 1] = 1.0
    # frame 1: mislabeled (peak 0 in B, peak 1 in A) -> masks must swap
    cm[1, :, 34, 34, 0] = 1.0
    cm[1, :, 8, 8, 1] = 1.0
    for fr in range(2, f):
        cm[fr, :, 8, 8, 0] = 1.0
        cm[fr, :, 34, 34, 1] = 1.0
    p.box, p.confmaps = box.copy(), cm
    p.do_preprocess()
    out = p.get_box()  # (F*C, H, W, 5)
    out = out.reshape(f, c, h, w, -1)
    # frame 0 untouched
    np.testing.assert_array_equal(out[0, 0, ..., 3], box[0, 0, ..., 3])
    np.testing.assert_array_equal(out[0, 0, ..., 4], box[0, 0, ..., 4])
    # frame 1 swapped — and NOT the same mask in both channels
    np.testing.assert_array_equal(out[1, 0, ..., 3], box[1, 0, ..., 4])
    np.testing.assert_array_equal(out[1, 0, ..., 4], box[1, 0, ..., 3])
    assert np.abs(out[1, 0, ..., 3] - out[1, 0, ..., 4]).max() > 0
