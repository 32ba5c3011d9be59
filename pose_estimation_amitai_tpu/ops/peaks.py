"""On-device keypoint decoding from confidence maps.

TPU-native replacements for the reference's peak decoders:

* hard argmax — ``tf_find_peaks`` (reference: tensorflow/preprocessor.py:657-689,
  pytorch/preprocessor.py:631-668, pytorch/Augmentor.py:105-148)
* differentiable soft-argmax — ``find_peaks_soft_argmax``
  (reference: pytorch/utils.py:47-83)
* the pointwise (decoded-coordinate MSE) loss — ``PointWiseLoss``
  (reference: tensorflow/Network.py:519-547; the reference hard-codes the
  image height to 192 at Network.py:531 — fixed here to use the true shape)

All functions are pure, jittable, and stay on device; the reference round-trips
through NumPy/CPU for every decode (pytorch/train_pytorch.py:207-213), which is
one of its main eval-loop bottlenecks.

Layout convention: NHWC (TPU-native), matching the reference's rank-4
``(samples, height, width, channels)`` contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _argmax2d(confmaps: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(rows, cols, vals) of the per-channel spatial argmax, first-occurrence
    tie-break (identical to ``jnp.argmax`` over the flattened map).

    XLA lowers ``argmax`` as a variadic (value, index) reduce, which the TPU
    executes markedly slower than plain reduces; a max-reduce for the value
    plus a ``where(map == max, linear_index, H*W)`` min-reduce for the index
    is the same answer from two simple reduces — measured 1.2-1.4x faster at
    the (512, 192, 192, 18) serving shape, both f32 and bf16
    (scripts/exp_decode.py).

    A channel containing NaN (diverged model, corrupted frame) has
    ``vals`` NaN and no pixel equal to it; the index clamps to the last
    pixel instead of escaping the image — coordinates stay in-bounds and
    the NaN ``val`` is the divergence signal (``jnp.argmax`` would point
    at the first NaN instead; either coordinate is meaningless)."""
    n, h, w, c = confmaps.shape
    vals = jnp.max(confmaps, axis=(1, 2))  # (N, C)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1) * w + \
        jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)
    masked = jnp.where(confmaps == vals[:, None, None, :], lin, h * w)
    idx = jnp.minimum(jnp.min(masked, axis=(1, 2)), h * w - 1)  # (N, C)
    return idx // w, idx % w, vals


def find_peaks_with_vals(confmaps: jax.Array) -> jax.Array:
    """Per-channel argmax peak decode.

    Args:
      confmaps: (N, H, W, C) confidence maps.

    Returns:
      (N, 3, C) array of [x, y, val] per channel — the reference's
      ``tf_find_peaks`` contract (tensorflow/preprocessor.py:657-689).
    """
    rows, cols, vals = _argmax2d(confmaps)
    return jnp.stack(
        [cols.astype(jnp.float32), rows.astype(jnp.float32), vals.astype(jnp.float32)],
        axis=1,
    )


def find_peaks(confmaps: jax.Array) -> jax.Array:
    """Argmax peak decode returning (N, C, 2) [x, y] coordinates.

    Matches the PyTorch Augmentor variant's output layout
    (pytorch/Augmentor.py:105-148: permute + drop vals).
    """
    peaks = find_peaks_with_vals(confmaps)  # (N, 3, C)
    return jnp.transpose(peaks, (0, 2, 1))[..., :2]


def find_peaks_refined(confmaps: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Sub-pixel argmax decode: quadratic fit on the log map around the peak.

    Goes beyond both reference decoders: the targets are sigma-Gaussians
    (tensorflow/simple_data_generator.py:119-136), and a Gaussian's log is an
    exact parabola, so a 1-D three-point parabola fit per axis around the
    integer argmax recovers the continuous peak centre exactly (the DARK-pose
    distribution-aware decode, arXiv:1910.06278, specialised to the known
    target family). Offsets are clamped to +-0.5 px; non-positive neighbour
    values (map edges, empty channels) fall back to the integer argmax.

    Args:
      confmaps: (N, H, W, C).

    Returns:
      (N, 3, C) of [x, y, val] — same contract as
      :func:`find_peaks_with_vals`, with sub-pixel x/y.
    """
    n, h, w, c = confmaps.shape
    maps = confmaps.astype(jnp.float32)
    flat = maps.reshape(n, h * w, c)
    rows, cols, vals = _argmax2d(maps)

    def neighbor(dy, dx):
        r = jnp.clip(rows + dy, 0, h - 1)
        cc = jnp.clip(cols + dx, 0, w - 1)
        return jnp.take_along_axis(
            flat, (r * w + cc)[:, None, :], axis=1
        )[:, 0, :]

    def axis_offset(f_minus, f_plus, interior):
        # log-parabola vertex; valid only where all three samples positive
        # AND the peak is interior: at a border the clipped neighbour
        # aliases the peak (lm == l0), which would bias the offset to
        # exactly -+0.5 — fall back to the integer argmax there
        ok = interior & (f_minus > eps) & (f_plus > eps) & (vals > eps)
        lm = jnp.log(jnp.maximum(f_minus, eps))
        lp = jnp.log(jnp.maximum(f_plus, eps))
        l0 = jnp.log(jnp.maximum(vals, eps))
        denom = 2.0 * l0 - lm - lp  # >= 0 at a log-space local max
        safe = jnp.where(jnp.abs(denom) > eps, denom, 1.0)
        off = jnp.where(jnp.abs(denom) > eps, 0.5 * (lp - lm) / safe, 0.0)
        return jnp.where(ok, jnp.clip(off, -0.5, 0.5), 0.0)

    dx = axis_offset(
        neighbor(0, -1), neighbor(0, 1), (cols > 0) & (cols < w - 1)
    )
    dy = axis_offset(
        neighbor(-1, 0), neighbor(1, 0), (rows > 0) & (rows < h - 1)
    )
    return jnp.stack(
        [cols.astype(jnp.float32) + dx, rows.astype(jnp.float32) + dy, vals],
        axis=1,
    )


def find_peaks_soft_argmax(confmaps: jax.Array) -> jax.Array:
    """Differentiable soft-argmax decode.

    Normalised-meshgrid expectation, rescaled to pixel coordinates and clamped
    to image bounds (reference: pytorch/utils.py:47-83). Input is NHWC (the
    reference permutes NCHW internally; we stay NHWC throughout).

    Returns (N, C, 2) [x, y] float coordinates.
    """
    n, h, w, c = confmaps.shape
    y_grid = jnp.linspace(0.0, 1.0, h).reshape(1, h, 1, 1)
    x_grid = jnp.linspace(0.0, 1.0, w).reshape(1, 1, w, 1)
    # epsilon-guarded: an all-zero (or negative-sum) channel — undetected
    # keypoint, zero-initialised head — must decode to a finite coordinate,
    # not NaN that poisons losses/3D lifting downstream
    total = jnp.sum(confmaps, axis=(1, 2))
    total = jnp.where(jnp.abs(total) < 1e-9, 1e-9, total)
    cx = jnp.sum(x_grid * confmaps, axis=(1, 2)) / total
    cy = jnp.sum(y_grid * confmaps, axis=(1, 2)) / total
    cx = jnp.clip(cx * (w - 1), 0.0, w - 1)
    cy = jnp.clip(cy * (h - 1), 0.0, h - 1)
    return jnp.stack([cx, cy], axis=-1)


def marginal_soft_argmax(heatmaps: jax.Array) -> jax.Array:
    """Marginal-expectation keypoint decode (the TF PointWiseLoss decoder).

    Computes E[x], E[y] via 1-indexed linspace over row/column marginals, then
    subtracts 1 — exactly the reference's ``_calculate_heatmap_keypoints``
    (tensorflow/Network.py:519-534), with the image size taken from the shape
    instead of the reference's hard-coded 192 (Network.py:531).

    Args:
      heatmaps: (N, H, W, C).

    Returns:
      (N, C, 2) [x, y] coordinates.
    """
    n, h, w, c = heatmaps.shape
    lin_y = jnp.arange(1, h + 1, dtype=heatmaps.dtype).reshape(1, h, 1)
    lin_x = jnp.arange(1, w + 1, dtype=heatmaps.dtype).reshape(1, w, 1)
    total = jnp.sum(heatmaps, axis=(1, 2))  # (N, C)
    # epsilon-guarded: all-zero channels (head_zero_init's exact first
    # prediction, or an empty GT channel) must not turn pointwise_loss into
    # NaN on step 1
    total = jnp.where(jnp.abs(total) < 1e-9, 1e-9, total)
    # sum over W -> row marginal (N, H, C); weight by 1-indexed row coordinate.
    h_y = jnp.sum(lin_y * jnp.sum(heatmaps, axis=2), axis=1) / total
    h_x = jnp.sum(lin_x * jnp.sum(heatmaps, axis=1), axis=1) / total
    return jnp.stack([h_x - 1.0, h_y - 1.0], axis=-1)


def pointwise_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """MSE between soft-argmax-decoded keypoints of two heatmap stacks.

    Reference: tensorflow/Network.py:536-547 (``PointWiseLoss.pointwize_loss``).
    """
    true_peaks = marginal_soft_argmax(y_true)
    pred_peaks = marginal_soft_argmax(y_pred)
    return jnp.mean(jnp.square(true_peaks - pred_peaks))


def l2_distances(
    pred_confmaps: jax.Array,
    true_confmaps: jax.Array,
    decode: str = "argmax",
) -> jax.Array:
    """Per-keypoint pixel L2 between decoded peaks of predicted vs true maps.

    The validation metric of the reference (pytorch/train_pytorch.py:199-213,
    tensorflow/CallBacks.py:49-69), fully on device. ``decode='argmax'`` is
    the reference-parity metric; ``'refined'`` decodes both map stacks with
    the sub-pixel log-parabola fit (:func:`find_peaks_refined`) so the
    metric is not floored by pixel quantisation.

    Returns (N, C) distances in pixels.
    """
    if decode == "refined":
        def dec(maps):
            return jnp.transpose(
                find_peaks_refined(maps)[:, :2, :], (0, 2, 1)
            )
    else:
        dec = find_peaks
    return jnp.linalg.norm(dec(pred_confmaps) - dec(true_confmaps), axis=-1)
