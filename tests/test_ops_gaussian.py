"""Gaussian confmap synthesis vs the NumPy reference formula
(tensorflow/simple_data_generator.py:119-136)."""

import pytest
import numpy as np

import jax.numpy as jnp

from pose_estimation_amitai_tpu.ops.gaussian import (
    confmaps_from_peaks,
    ensure_sigma,
    gaussian_confmap,
)

pytestmark = pytest.mark.quick  # gate-style subset: python -m pytest -m quick


def _np_gaussian(h, w, cx, cy, sigma):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    d2 = (xs - cx) ** 2 + (ys - cy) ** 2
    return np.exp(-d2 / (2.0 * sigma**2))


def test_matches_numpy_reference(rng):
    peaks = rng.uniform(5, 40, (3, 4, 2)).astype(np.float32)
    maps = np.asarray(gaussian_confmap(jnp.asarray(peaks), (48, 48), 3.0))
    assert maps.shape == (3, 4, 48, 48)
    for n in range(3):
        for c in range(4):
            expected = _np_gaussian(48, 48, peaks[n, c, 0], peaks[n, c, 1], 3.0)
            np.testing.assert_allclose(maps[n, c], expected, atol=1e-5)


def test_confmaps_from_peaks_layout(rng):
    peaks = rng.uniform(5, 40, (2, 5, 2)).astype(np.float32)
    maps = np.asarray(confmaps_from_peaks(jnp.asarray(peaks), (48, 48), 3.0))
    assert maps.shape == (2, 48, 48, 5)
    # peak position is the argmax
    for c in range(5):
        idx = np.unravel_index(np.argmax(maps[0, :, :, c]), (48, 48))
        assert abs(idx[1] - peaks[0, c, 0]) <= 1
        assert abs(idx[0] - peaks[0, c, 1]) <= 1


def test_ensure_sigma_renormalises(rng):
    # wide-sigma maps re-rendered at sigma=2 around the same peaks
    peaks = rng.uniform(10, 38, (2, 3, 2)).round().astype(np.float32)
    wide = np.asarray(confmaps_from_peaks(jnp.asarray(peaks), (48, 48), 6.0))
    fixed = np.asarray(ensure_sigma(jnp.asarray(wide), sigma=2.0))
    expected = np.asarray(confmaps_from_peaks(jnp.asarray(peaks), (48, 48), 2.0))
    np.testing.assert_allclose(fixed, expected, atol=1e-5)


def test_ensure_sigma_keeps_zero_channels_zero():
    """All-zero (missing-keypoint) channels must NOT become corner
    Gaussians at the argmax fallback (0, 0)."""
    import jax.numpy as jnp

    from pose_estimation_amitai_tpu.ops.gaussian import (
        confmaps_from_peaks, ensure_sigma,
    )

    peaks = jnp.asarray([[[20.0, 24.0], [10.0, 12.0]]])  # (1, 2, 2)
    maps = np.array(confmaps_from_peaks(peaks, (48, 48), 3.0))
    maps[..., 1] = 0.0  # channel 1: missing keypoint
    out = np.asarray(ensure_sigma(jnp.asarray(maps), 3.0))
    assert out[..., 1].max() == 0.0
    assert out[..., 0].max() > 0.99
