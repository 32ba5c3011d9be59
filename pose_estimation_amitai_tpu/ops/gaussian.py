"""Gaussian confidence-map synthesis on device.

TPU-native replacement for the reference's per-channel NumPy loop
(reference: tensorflow/simple_data_generator.py:119-136 — ``get_gaussian`` /
``ensure_sigma``). One broadcast-exp over the full (N, H, W, C) stack; XLA
fuses the squared-distance grid and the exp into a single VPU pass, so there
is no reason for a hand-written Pallas kernel here (it is purely
bandwidth-bound elementwise work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_confmap(
    peaks_xy: jax.Array,
    grid_size: tuple[int, int] = (192, 192),
    sigma: float = 3.0,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Render Gaussian confidence maps centred at given peaks.

    Matches ``SimpleDataGenerator.get_gaussian`` semantics
    (tensorflow/simple_data_generator.py:119-125): g = exp(-d^2 / (2 sigma^2))
    with d the Euclidean distance from the peak on an integer pixel grid.

    Args:
      peaks_xy: (..., 2) [x, y] peak coordinates; any leading batch/channel
        dims. Typically (N, C, 2).
      grid_size: (H, W).
      sigma: Gaussian std in pixels.

    Returns:
      (..., H, W) maps with the leading dims of ``peaks_xy`` moved in front,
      i.e. (N, C, 2) -> (N, C, H, W). Use ``confmaps_from_peaks`` for NHWC.
    """
    h, w = grid_size
    xs = jnp.arange(w, dtype=dtype)
    ys = jnp.arange(h, dtype=dtype)
    px = peaks_xy[..., 0:1]  # (..., 1)
    py = peaks_xy[..., 1:2]
    dx2 = jnp.square(xs - px)  # (..., W)
    dy2 = jnp.square(ys - py)  # (..., H)
    d2 = dy2[..., :, None] + dx2[..., None, :]  # (..., H, W)
    return jnp.exp(-d2 / (2.0 * sigma**2)).astype(dtype)


def confmaps_from_peaks(
    peaks_xy: jax.Array,
    grid_size: tuple[int, int] = (192, 192),
    sigma: float = 3.0,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """(N, C, 2) peaks -> (N, H, W, C) NHWC confidence maps."""
    maps = gaussian_confmap(peaks_xy, grid_size, sigma, dtype)  # (N, C, H, W)
    return jnp.transpose(maps, (0, 2, 3, 1))


def ensure_sigma(
    confmaps: jax.Array, sigma: float = 3.0
) -> jax.Array:
    """Re-render confmaps as fixed-sigma Gaussians at their argmax peaks.

    Reference: tensorflow/simple_data_generator.py:127-136 (``ensure_sigma`` —
    note the reference calls a TF ``Augmentor.tf_find_peaks`` that does not
    exist in that stack; this is the repaired, on-device equivalent).

    Args:
      confmaps: (N, H, W, C).
    """
    from .peaks import find_peaks

    n, h, w, c = confmaps.shape
    peaks = find_peaks(confmaps)  # (N, C, 2)
    out = confmaps_from_peaks(peaks, (h, w), sigma, confmaps.dtype)
    # all-zero channels (missing/occluded keypoints) argmax to (0, 0);
    # re-rendering would INVENT a full-strength corner Gaussian where the
    # input said "no point" — keep those channels zero instead
    alive = (
        jnp.max(confmaps, axis=(1, 2), keepdims=True) > 0
    )  # (N, 1, 1, C)
    return jnp.where(alive, out, jnp.zeros_like(out))
