"""Peak decoding ops vs NumPy references."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_amitai_tpu.ops import gaussian, peaks

pytestmark = pytest.mark.quick  # gate-style subset: python -m pytest -m quick


def _numpy_find_peaks(x):
    """NumPy port of the reference tf_find_peaks contract (N, 3, C)."""
    n, h, w, c = x.shape
    flat = x.reshape(n, h * w, c)
    idx = np.argmax(flat, axis=1)
    vals = np.max(flat, axis=1)
    rows = idx // w
    cols = idx % w
    return np.stack([cols, rows, vals], axis=1).astype(np.float32)


def test_find_peaks_matches_numpy(rng):
    x = rng.random((4, 24, 24, 5)).astype(np.float32)
    got = np.asarray(peaks.find_peaks_with_vals(jnp.asarray(x)))
    want = _numpy_find_peaks(x)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_find_peaks_xy_layout(rng):
    x = np.zeros((2, 16, 16, 3), dtype=np.float32)
    # channel 0: peak at (x=5, y=9)
    x[0, 9, 5, 0] = 1.0
    x[0, 0, 0, 1] = 1.0
    x[0, 15, 15, 2] = 1.0
    got = np.asarray(peaks.find_peaks(jnp.asarray(x)))
    assert got.shape == (2, 3, 2)
    np.testing.assert_allclose(got[0, 0], [5.0, 9.0])
    np.testing.assert_allclose(got[0, 2], [15.0, 15.0])


def test_soft_argmax_recovers_gaussian_peak():
    pts = jnp.array([[[40.0, 80.0], [100.0, 30.0]]])  # (1, 2, 2)
    maps = gaussian.confmaps_from_peaks(pts, (192, 192), sigma=3.0)
    got = peaks.find_peaks_soft_argmax(maps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(pts), atol=0.05)


def test_marginal_soft_argmax_matches_tf_formula():
    """The 1-indexed linspace expectation (Network.py:519-534) on a Gaussian."""
    pts = jnp.array([[[64.0, 100.0]]])
    maps = gaussian.confmaps_from_peaks(pts, (192, 192), sigma=3.0)
    got = peaks.marginal_soft_argmax(maps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(pts), atol=0.05)


def test_pointwise_loss_zero_for_identical():
    pts = jnp.array([[[64.0, 100.0], [10.0, 20.0]]])
    maps = gaussian.confmaps_from_peaks(pts, (192, 192), sigma=3.0)
    assert float(peaks.pointwise_loss(maps, maps)) == 0.0


def test_l2_distances():
    a = gaussian.confmaps_from_peaks(jnp.array([[[10.0, 10.0]]]), (64, 64))
    b = gaussian.confmaps_from_peaks(jnp.array([[[13.0, 14.0]]]), (64, 64))
    d = np.asarray(peaks.l2_distances(a, b))
    np.testing.assert_allclose(d, [[5.0]], atol=1e-5)


def test_peaks_jit_and_grad():
    pts = jnp.array([[[30.0, 40.0]]])
    maps = gaussian.confmaps_from_peaks(pts, (64, 64), sigma=3.0)

    def loss(m):
        return jnp.sum(peaks.find_peaks_soft_argmax(m))

    g = jax.jit(jax.grad(loss))(maps)
    assert np.isfinite(np.asarray(g)).all()


def test_refined_decode_recovers_subpixel_centers(rng):
    """Log-parabola refinement recovers continuous Gaussian centres to well
    under 0.1 px (exact modulo float precision), where argmax is +-0.5 px."""
    from pose_estimation_amitai_tpu.ops.gaussian import confmaps_from_peaks

    true = jnp.asarray(rng.uniform(8.3, 39.2, (6, 5, 2)).astype(np.float32))
    maps = confmaps_from_peaks(true, (48, 48), 3.0)
    ref = np.asarray(peaks.find_peaks_refined(maps))  # (N, 3, K)
    got = np.transpose(ref[:, :2, :], (0, 2, 1))  # (N, K, 2)
    err_refined = np.abs(got - np.asarray(true)).max()
    hard = np.asarray(peaks.find_peaks(maps))
    err_hard = np.abs(hard - np.asarray(true)).max()
    assert err_refined < 0.05, err_refined
    assert err_refined < err_hard  # argmax quantises to the pixel grid


def test_refined_decode_zero_channel_and_border(rng):
    """Empty channels and border peaks fall back to the integer argmax."""
    maps = np.zeros((1, 16, 16, 2), np.float32)
    maps[0, 0, 15, 0] = 1.0  # corner peak
    out = np.asarray(peaks.find_peaks_refined(jnp.asarray(maps)))
    assert out[0, 0, 0] == 15.0 and out[0, 1, 0] == 0.0  # x, y unmoved
    assert out[0, 2, 1] == 0.0  # empty channel val
    assert np.isfinite(out).all()


def test_refined_decode_no_border_bias():
    """A Gaussian peaked at the image border must decode to the integer
    argmax, not be dragged +-0.5 px out of the image by the clipped-neighbour
    alias (round-1 advisor finding)."""
    from pose_estimation_amitai_tpu.ops.gaussian import confmaps_from_peaks

    h = w = 32
    pts = jnp.asarray(
        [[[0.0, 10.0], [w - 1.0, 12.0], [14.0, 0.0], [15.0, h - 1.0]]]
    )  # (1, 4, 2): left, right, top, bottom borders
    maps = confmaps_from_peaks(pts, (h, w), sigma=2.0)
    out = np.asarray(peaks.find_peaks_refined(maps))  # (1, 3, 4)
    xs, ys = out[0, 0], out[0, 1]
    assert xs[0] == 0.0 and xs[1] == w - 1.0
    assert ys[2] == 0.0 and ys[3] == h - 1.0
    # interior axes still refine exactly (values inside the image)
    assert 0.0 <= xs.min() and xs.max() <= w - 1.0
    assert 0.0 <= ys.min() and ys.max() <= h - 1.0
    # off-axis coordinates of border peaks keep sub-pixel exactness
    np.testing.assert_allclose(ys[0], 10.0, atol=1e-3)
    np.testing.assert_allclose(ys[1], 12.0, atol=1e-3)


def test_argmax2d_tie_break_matches_flat_argmax():
    """The plain-reduce argmax (max + masked min over the linear index,
    ops/peaks._argmax2d) must keep jnp.argmax's first-occurrence tie-break,
    including all-equal maps, duplicate maxima across rows/columns, and
    negative-valued maps."""
    h = w = 8
    maps = np.zeros((4, h, w, 3), np.float32)
    maps[0, 2, 5, 0] = maps[0, 6, 1, 0] = 1.0          # duplicate max
    maps[1, :, :, 1] = -1.0                             # all-equal negative
    maps[2, 0, 0, 2] = maps[2, 0, 7, 2] = 0.5           # same-row tie
    maps[3, 3, 3, :] = 2.0                              # max in every chan
    got = np.asarray(peaks.find_peaks_with_vals(jnp.asarray(maps)))
    flat = maps.reshape(4, h * w, 3)
    idx = flat.argmax(axis=1)
    np.testing.assert_array_equal(got[:, 0], (idx % w).astype(np.float32))
    np.testing.assert_array_equal(got[:, 1], (idx // w).astype(np.float32))
    np.testing.assert_array_equal(got[:, 2], flat.max(axis=1))


def test_argmax2d_nan_channel_stays_in_bounds():
    """A NaN-containing channel (diverged model / corrupted frame) must not
    emit coordinates outside the image: the masked-min index clamps to the
    last pixel and the NaN val is the divergence signal."""
    h = w = 8
    maps = np.zeros((2, h, w, 2), np.float32)
    maps[0, 3, 4, 0] = 1.0
    maps[0, :, :, 1] = np.nan         # whole channel NaN
    maps[1, 2, 2, 0] = np.nan         # single NaN pixel
    maps[1, 5, 6, 1] = 1.0
    got = np.asarray(peaks.find_peaks_with_vals(jnp.asarray(maps)))
    xs, ys, vals = got[:, 0], got[:, 1], got[:, 2]
    assert (xs >= 0).all() and (xs <= w - 1).all(), xs
    assert (ys >= 0).all() and (ys <= h - 1).all(), ys
    # clean channels decode normally
    assert (xs[0, 0], ys[0, 0]) == (4.0, 3.0)
    assert (xs[1, 1], ys[1, 1]) == (6.0, 5.0)
    # NaN-touched channels surface NaN in the val row
    assert np.isnan(vals[0, 1]) and np.isnan(vals[1, 0])
