"""Fused affine warp vs scipy reference transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import rotate as scipy_rotate
from scipy.ndimage import shift as scipy_shift

from pose_estimation_amitai_tpu.ops import affine


def _params(b=1, **kw):
    d = dict(
        angle_deg=np.zeros(b),
        scale=np.ones(b),
        shift_x=np.zeros(b),
        shift_y=np.zeros(b),
        flip_h=np.zeros(b, bool),
        flip_v=np.zeros(b, bool),
    )
    d.update({k: np.asarray(v).reshape(b) for k, v in kw.items()})
    # shear_deg defaults to None (no shear factor) unless explicitly given
    return affine.AugmentParams(
        *[jnp.asarray(d[f]) for f in affine.AugmentParams._fields if f in d]
    )


def _warp(img_hwc, params, order=1):
    mats = affine.make_affine_matrix(params, img_hwc.shape[0], img_hwc.shape[1])
    return np.asarray(
        affine.affine_warp_batch(jnp.asarray(img_hwc)[None], mats, order)[0]
    )


def test_identity_warp(rng):
    img = rng.random((32, 32, 3)).astype(np.float32)
    out = _warp(img, _params())
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_flip_h(rng):
    img = rng.random((16, 16, 2)).astype(np.float32)
    out = _warp(img, _params(flip_h=True))
    np.testing.assert_allclose(out, img[:, ::-1], atol=1e-5)


def test_flip_v(rng):
    img = rng.random((16, 16, 2)).astype(np.float32)
    out = _warp(img, _params(flip_v=True))
    np.testing.assert_allclose(out, img[::-1], atol=1e-5)


def test_integer_shift_matches_scipy(rng):
    img = np.zeros((32, 32, 1), dtype=np.float32)
    img[10:20, 12:22, 0] = rng.random((10, 10))
    out = _warp(img, _params(shift_x=3, shift_y=-2))
    want = scipy_shift(img[..., 0], (-2, 3), order=1, cval=0.0)
    np.testing.assert_allclose(out[..., 0], want, atol=1e-4)


def test_rotation_direction_matches_scipy():
    """Positive angle must rotate the same way scipy.ndimage.rotate does
    (reference rotates with scipy order=3, pytorch/Augmentor.py:92-94)."""
    img = np.zeros((33, 33, 1), dtype=np.float32)
    img[16, 24, 0] = 1.0  # point to the right of centre
    out = _warp(img, _params(angle_deg=90.0))
    want = scipy_rotate(img[..., 0], 90.0, reshape=False, order=1)
    got_pos = np.unravel_index(np.argmax(out[..., 0]), out[..., 0].shape)
    want_pos = np.unravel_index(np.argmax(want), want.shape)
    assert got_pos == want_pos, (got_pos, want_pos)


def test_rotation_small_angle_close_to_scipy(rng):
    img = np.zeros((64, 64, 1), dtype=np.float32)
    img[24:40, 24:40, 0] = rng.random((16, 16)).astype(np.float32)
    out = _warp(img, _params(angle_deg=17.0))
    want = scipy_rotate(img[..., 0], 17.0, reshape=False, order=1)
    # Bilinear vs bilinear: should agree closely in the interior (tiny
    # rounding differences at block edges are expected; SURVEY §7 hard part 1
    # pins statistics parity, not pixel parity).
    np.testing.assert_allclose(out[4:-4, 4:-4, 0], want[4:-4, 4:-4], atol=5e-2)
    assert np.mean(np.abs(out[4:-4, 4:-4, 0] - want[4:-4, 4:-4])) < 2e-3


def test_scale_about_center():
    img = np.zeros((33, 33, 1), dtype=np.float32)
    img[16, 16, 0] = 1.0
    out = _warp(img, _params(scale=1.5))
    # centre point stays put under scaling about the centre
    assert out[16, 16, 0] > 0.9


def test_zero_boundary():
    img = np.ones((16, 16, 1), dtype=np.float32)
    out = _warp(img, _params(shift_x=8))
    assert np.all(out[:, :7, 0] < 1e-5)  # vacated region is zero-filled


def test_cubic_order_runs_and_interpolates(rng):
    img = rng.random((32, 32, 2)).astype(np.float32)
    out = _warp(img, _params(shift_x=0.5), order=3)
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    # identity check for cubic
    out_id = _warp(img, _params(), order=3)
    np.testing.assert_allclose(out_id[2:-2, 2:-2], img[2:-2, 2:-2], atol=1e-4)


def test_augment_pair_same_transform_for_image_and_confmap(rng):
    imgs = rng.random((4, 32, 32, 5)).astype(np.float32)
    key = jax.random.key(0)
    a_img, a_cm = affine.augment_pair(
        key, jnp.asarray(imgs), jnp.asarray(imgs[..., :3]),
        rotation_range=30.0, xy_shifts=5.0, zoom_range=(0.8, 1.2),
    )
    # confmaps are the first 3 channels of the images: identical transforms
    # must keep them equal post-warp (confmap channels are clamped >= 0
    # against Catmull-Rom ringing, so compare against the clamped image).
    np.testing.assert_allclose(
        np.maximum(np.asarray(a_img)[..., :3], 0.0), np.asarray(a_cm),
        atol=1e-5,
    )


def test_augment_pair_is_deterministic_per_key(rng):
    imgs = jnp.asarray(rng.random((2, 16, 16, 4)).astype(np.float32))
    cms = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    key = jax.random.key(7)
    a1 = affine.augment_pair(key, imgs, cms)
    a2 = affine.augment_pair(key, imgs, cms)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))


def test_augment_images_and_peaks_consistency(rng):
    """Rendered-at-transformed-peaks targets must agree with warping the
    rendered maps directly (same key -> same transform)."""
    from pose_estimation_amitai_tpu.ops.gaussian import confmaps_from_peaks

    b, hw, k = 3, 48, 5
    peaks_xy = jnp.asarray(
        rng.uniform(12, 36, (b, k, 2)).astype(np.float32)
    )
    vals = jnp.ones((b, k), jnp.float32)
    maps0 = confmaps_from_peaks(peaks_xy, (hw, hw), 3.0)
    imgs = jnp.asarray(rng.random((b, hw, hw, 4)).astype(np.float32))
    key = jax.random.key(3)

    w_img_a, rendered = affine.augment_images_and_peaks(
        key, imgs, peaks_xy, vals, sigma=3.0,
        rotation_range=25.0, xy_shifts=4.0, zoom_range=(0.9, 1.1),
    )
    w_img_b, warped_maps = affine.augment_pair(
        key, imgs, maps0,
        rotation_range=25.0, xy_shifts=4.0, zoom_range=(0.9, 1.1),
    )
    # identical image warps (same key -> same sampled transform)
    np.testing.assert_allclose(
        np.asarray(w_img_a), np.asarray(w_img_b), atol=1e-5
    )
    # decoded peaks of rendered vs warped targets agree to ~1px wherever
    # the peak stays inside the image
    from pose_estimation_amitai_tpu.ops import peaks as peaks_ops

    pr = np.asarray(peaks_ops.find_peaks(rendered))
    pw = np.asarray(peaks_ops.find_peaks(warped_maps))
    vals_w = np.asarray(warped_maps).max(axis=(1, 2))
    inside = vals_w > 0.5
    d = np.linalg.norm(pr - pw, axis=-1)[inside]
    assert np.median(d) <= 1.0, np.median(d)


def test_augment_images_and_peaks_zero_val_channels(rng):
    """Absent keypoints (val 0) must render all-zero target maps."""
    peaks_xy = jnp.asarray(rng.uniform(5, 25, (2, 4, 2)).astype(np.float32))
    vals = jnp.asarray([[1, 0, 1, 0], [0, 1, 0, 1]], jnp.float32)
    imgs = jnp.asarray(rng.random((2, 32, 32, 4)).astype(np.float32))
    _, maps = affine.augment_images_and_peaks(
        jax.random.key(0), imgs, peaks_xy, vals,
        rotation_range=10.0, xy_shifts=2.0,
    )
    m = np.asarray(maps)
    for b in range(2):
        for c in range(4):
            if vals[b, c] == 0:
                assert m[b, :, :, c].max() == 0.0
            else:
                assert m[b, :, :, c].max() > 0.3


def _warp_sep(img_hwc, params, order=1):
    mats = affine.make_affine_matrix(params, img_hwc.shape[0], img_hwc.shape[1])
    return np.asarray(
        affine.affine_warp_separable_batch(jnp.asarray(img_hwc)[None], mats, order)[0]
    )


def test_separable_identity_and_flips(rng):
    img = rng.random((32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(_warp_sep(img, _params()), img, atol=1e-4)
    np.testing.assert_allclose(
        _warp_sep(img, _params(flip_h=True)), img[:, ::-1], atol=1e-4
    )
    np.testing.assert_allclose(
        _warp_sep(img, _params(flip_v=True)), img[::-1], atol=1e-4
    )


def test_separable_integer_shift_exact(rng):
    img = np.zeros((32, 32, 1), dtype=np.float32)
    img[10:20, 12:22, 0] = rng.random((10, 10))
    out = _warp_sep(img, _params(shift_x=3, shift_y=-2))
    want = scipy_shift(img[..., 0], (-2, 3), order=1, cval=0.0)
    np.testing.assert_allclose(out[..., 0], want, atol=1e-4)


def test_separable_matches_exact_warp_on_smooth_images(rng):
    """The two-pass warp must track the exact 2-D gather warp closely on
    smooth images (interpolation is per-pass, so sub-percent differences
    are expected; DESIGN.md pins statistics parity)."""
    # smooth image: sum of Gaussians
    from pose_estimation_amitai_tpu.ops.gaussian import confmaps_from_peaks

    pk = jnp.asarray(rng.uniform(20, 44, (4, 6, 2)).astype(np.float32))
    img = np.asarray(confmaps_from_peaks(pk, (64, 64), 4.0))
    params = _params(
        b=4, angle_deg=[13.0, -25.0, 80.0, 170.0], scale=[1.0, 0.9, 1.1, 1.0],
        shift_x=[2.0, -3.5, 0.0, 1.0], shift_y=[0.0, 1.5, -2.0, 0.0],
        flip_h=[False, True, False, True],
    )
    mats = affine.make_affine_matrix(params, 64, 64)
    exact = np.asarray(affine.affine_warp_batch(jnp.asarray(img), mats, 1))
    sep = np.asarray(
        affine.affine_warp_separable_batch(jnp.asarray(img), mats, 1)
    )
    assert np.max(np.abs(exact - sep)) < 0.05, np.max(np.abs(exact - sep))
    assert np.mean(np.abs(exact - sep)) < 2e-3


def test_separable_90deg_rotation_direction():
    """Angles near 90 deg exercise the rot90 pre-transform branch."""
    img = np.zeros((33, 33, 1), dtype=np.float32)
    img[16, 24, 0] = 1.0
    out = _warp_sep(img, _params(angle_deg=90.0))
    want = scipy_rotate(img[..., 0], 90.0, reshape=False, order=1)
    got_pos = np.unravel_index(np.argmax(out[..., 0]), out[..., 0].shape)
    want_pos = np.unravel_index(np.argmax(want), want.shape)
    assert got_pos == want_pos, (got_pos, want_pos)


def test_separable_zero_boundary():
    img = np.ones((16, 16, 1), dtype=np.float32)
    out = _warp_sep(img, _params(shift_x=8))
    assert np.all(out[:, :7, 0] < 1e-4)


def test_separable_cubic_identity(rng):
    img = rng.random((32, 32, 2)).astype(np.float32)
    out = _warp_sep(img, _params(), order=3)
    np.testing.assert_allclose(out[2:-2, 2:-2], img[2:-2, 2:-2], atol=1e-3)


def test_separable_matches_exact_warp_cubic(rng):
    """Order-3 (Catmull-Rom) separable pass vs the exact 2-D cubic warp."""
    from pose_estimation_amitai_tpu.ops.gaussian import confmaps_from_peaks

    pk = jnp.asarray(rng.uniform(20, 44, (3, 5, 2)).astype(np.float32))
    img = np.asarray(confmaps_from_peaks(pk, (64, 64), 4.0))
    params = _params(
        b=3, angle_deg=[21.0, -70.0, 115.0], scale=[1.05, 0.95, 1.0],
        shift_x=[1.5, -2.0, 0.5], shift_y=[-1.0, 0.5, 2.0],
    )
    mats = affine.make_affine_matrix(params, 64, 64)
    exact = np.asarray(affine.affine_warp_batch(jnp.asarray(img), mats, 3))
    sep = np.asarray(
        affine.affine_warp_separable_batch(jnp.asarray(img), mats, 3)
    )
    assert np.max(np.abs(exact - sep)) < 0.06, np.max(np.abs(exact - sep))
    assert np.mean(np.abs(exact - sep)) < 2e-3


def test_separable_matches_exact_at_production_size(rng):
    """192px exercises the production radix (offsets beyond one coarse
    digit), which smaller test images do not reach."""
    from pose_estimation_amitai_tpu.ops.gaussian import confmaps_from_peaks

    pk = jnp.asarray(rng.uniform(30, 160, (2, 8, 2)).astype(np.float32))
    img = np.asarray(confmaps_from_peaks(pk, (192, 192), 5.0))
    params = _params(
        b=2, angle_deg=[37.0, -142.0], scale=[0.9, 1.1],
        shift_x=[6.0, -8.0], shift_y=[-5.0, 7.0], flip_h=[True, False],
    )
    mats = affine.make_affine_matrix(params, 192, 192)
    exact = np.asarray(affine.affine_warp_batch(jnp.asarray(img), mats, 3))
    sep = np.asarray(
        affine.affine_warp_separable_batch(jnp.asarray(img), mats, 3)
    )
    assert np.max(np.abs(exact - sep)) < 0.05, np.max(np.abs(exact - sep))
    assert np.mean(np.abs(exact - sep)) < 1e-3


def test_augment_pair_confmaps_nonnegative():
    """Catmull-Rom ringing must not leave negative values in warped targets
    (round-1 advisor finding: separable order promotion -> negative lobes)."""
    key = jax.random.key(7)
    rng = np.random.default_rng(7)
    from pose_estimation_amitai_tpu.ops.gaussian import confmaps_from_peaks

    b, h, w = 4, 48, 48
    images = jnp.asarray(rng.random((b, h, w, 2)), jnp.float32)
    pts = jnp.asarray(rng.uniform(8, 40, (b, 5, 2)), jnp.float32)
    confmaps = confmaps_from_peaks(pts, (h, w), sigma=3.0)
    _, warped_maps = affine.augment_pair(
        key, images, confmaps, rotation_range=30.0, xy_shifts=5.0,
    )
    assert float(jnp.min(warped_maps)) >= 0.0


@pytest.mark.quick
def test_rotation_buckets_partition():
    """Bucket helper (round-5 canvas bucketing): exact equal-measure
    partitions for the supported ranges, None where bucketing cannot be
    exact or cannot help."""
    assert affine.rotation_buckets(15.0) is None          # narrow canvas
    assert affine.rotation_buckets(60.0) is None          # partial turn
    # a uniform +-200 draw mod 360 is NOT uniform on the circle — only
    # exactly +-180 reduces to quadrant + residual (review r5)
    assert affine.rotation_buckets(200.0) is None
    assert affine.rotation_buckets(30.0, shear_range=5.0) is None
    b45 = affine.rotation_buckets(45.0)
    assert b45 == [(0.0, 15.0, False), (15.0, 30.0, False),
                   (30.0, 45.0, False)]
    b180 = affine.rotation_buckets(180.0)
    assert [q for _, _, q in b180] == [True, True, True]
    assert b180[-1][1] == 45.0
    # buckets partition contiguously
    for (lo1, hi1, _), (lo2, _, _) in zip(b180, b180[1:]):
        assert hi1 == lo2


@pytest.mark.quick
def test_bucketed_rotation_warp_consistency():
    """Full-turn augmentation through the bucketed ``lax.switch`` path:
    the warped image's blob must land exactly where the returned forward
    matrix (and hence the re-rendered target) says it should — a wrong
    per-bucket shear_limit would cut or shift content silently."""
    from pose_estimation_amitai_tpu.ops import gaussian

    h = w = 96
    bsz = 4
    peaks0 = jnp.tile(jnp.array([[30.0, 36.0]]), (bsz, 1))[:, None, :]
    img = gaussian.confmaps_from_peaks(peaks0, (h, w), 2.0)  # (B, h, w, 1)
    hits = 0
    for i in range(6):
        warped, maps, mats = affine.augment_views_and_peaks(
            jax.random.key(i), img, peaks0, jnp.ones((bsz, 1)),
            rotation_range=180.0, xy_shifts=5.0, zoom_range=(0.9, 1.1),
        )
        new_pk = np.asarray(affine.transform_points(peaks0, mats[:, 0]))
        for b in range(bsz):
            x, y = new_pk[b, 0]
            if not (6 <= x <= w - 7 and 6 <= y <= h - 7):
                continue  # blob warped out of frame: nothing to check
            wm = np.asarray(warped[b, :, :, 0])
            iy, ix = np.unravel_index(wm.argmax(), wm.shape)
            assert abs(ix - x) <= 1.5 and abs(iy - y) <= 1.5, (
                i, b, (ix, iy), (x, y)
            )
            tm = np.asarray(maps[b, :, :, 0])
            ty, tx = np.unravel_index(tm.argmax(), tm.shape)
            assert abs(tx - x) <= 1.0 and abs(ty - y) <= 1.0
            hits += 1
    assert hits >= 8  # enough in-frame draws to be a real check
