"""Binary morphology as batched padded shifted-slice max/min reductions.

TPU-native replacement for the scipy/skimage morphology calls in the
reference's preprocessing (reference: pytorch/preprocessor.py:390-393
``binary_closing`` + ``binary_dilation``; tensorflow/preprocessor.py:338-341,
601-619 — disk dilate/erode for body masks). Max/min pooling with a
structuring-element mask implements dilation/erosion directly on the VPU; the
whole (frames, cams, H, W) mask stack is processed in one batched call instead
of the reference's per-frame-per-camera Python loops.

Structuring elements follow scipy defaults: ``cross(1)`` is
``generate_binary_structure(2, 1)`` (the default for scipy's binary_* ops),
``disk(r)`` is skimage.morphology.disk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cross(radius: int = 1) -> np.ndarray:
    """Cross/diamond structuring element: |dx|+|dy| <= radius."""
    size = 2 * radius + 1
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return (np.abs(ys) + np.abs(xs) <= radius).astype(np.bool_)


def disk(radius: int) -> np.ndarray:
    """Disk structuring element: dx^2 + dy^2 <= r^2 (skimage.morphology.disk)."""
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return (ys**2 + xs**2 <= radius**2).astype(np.bool_)


def _masked_window_reduce(
    mask: jax.Array, structure: np.ndarray, is_dilation: bool
) -> jax.Array:
    """One dilation/erosion step over the trailing 2 dims of ``mask``.

    Implemented as an unrolled max/min over shifted padded slices of the
    structuring footprint: for dilation, OR of neighbours under the
    (symmetric) structure; for erosion, AND. Arbitrary leading batch dims
    are supported.
    """
    sh, sw = structure.shape
    pad_h, pad_w = sh // 2, sw // 2
    m = mask.astype(jnp.float32)
    lead = m.shape[:-2]
    m2 = m.reshape((-1,) + m.shape[-2:])  # (B, H, W)

    struct = jnp.asarray(structure, dtype=jnp.float32)
    if is_dilation:
        # dilation: out = max over footprint of (mask * struct)
        init, op, pad_val = 0.0, jax.lax.max, 0.0
    else:
        # erosion: out = min over footprint where struct is set; scipy
        # default border_value=0: outside counts as background, so border
        # pixels erode away
        init, op, pad_val = 1.0, jax.lax.min, 0.0

    # Pad, then apply the structure via unrolled shifted slices. The
    # footprint is tiny (3x3..disk9), so the shifted selects fuse into one
    # VPU pass under jit.
    padded = jnp.pad(
        m2, ((0, 0), (pad_h, pad_h), (pad_w, pad_w)), constant_values=pad_val
    )
    h, w = m.shape[-2:]
    out = jnp.full_like(m2, init)
    for dy in range(sh):
        for dx in range(sw):
            if not structure[dy, dx]:
                continue
            window = jax.lax.dynamic_slice(
                padded, (0, dy, dx), (m2.shape[0], h, w)
            )
            out = op(out, window)
    return (out > 0.5).reshape(lead + (h, w))


def binary_dilation(
    mask: jax.Array, structure: np.ndarray | None = None, iterations: int = 1
) -> jax.Array:
    """scipy.ndimage.binary_dilation equivalent (default cross structure)."""
    structure = cross(1) if structure is None else structure
    out = mask
    for _ in range(max(int(iterations), 0)):
        out = _masked_window_reduce(out, structure, is_dilation=True)
    return out


def binary_erosion(
    mask: jax.Array, structure: np.ndarray | None = None, iterations: int = 1
) -> jax.Array:
    """scipy.ndimage.binary_erosion equivalent (default cross structure)."""
    structure = cross(1) if structure is None else structure
    out = mask
    for _ in range(max(int(iterations), 0)):
        out = _masked_window_reduce(out, structure, is_dilation=False)
    return out


def binary_closing(
    mask: jax.Array, structure: np.ndarray | None = None
) -> jax.Array:
    """scipy.ndimage.binary_closing equivalent: dilation then erosion.

    Reference use: mask cleanup in ``Preprocessor.adjust_mask``
    (pytorch/preprocessor.py:390-393).
    """
    return binary_erosion(binary_dilation(mask, structure), structure)


def adjust_mask(mask: jax.Array, mask_dilation: int = 1) -> jax.Array:
    """Closing + dilation(iterations=mask_dilation), batched over leading dims.

    Exact semantics of ``Preprocessor.adjust_mask``
    (pytorch/preprocessor.py:390-393, tensorflow/preprocessor.py:338-341) but
    applied to the whole stack at once.
    """
    return binary_dilation(binary_closing(mask), iterations=mask_dilation)


def dilate_disk(mask: jax.Array, radius: int) -> jax.Array:
    """Disk dilation (skimage ``dilation(mask, disk(r))`` equivalent)."""
    return binary_dilation(mask, disk(radius), iterations=1)


def erode_disk(mask: jax.Array, radius: int) -> jax.Array:
    """Disk erosion (skimage ``erosion(mask, disk(r))`` equivalent)."""
    return binary_erosion(mask, disk(radius), iterations=1)


def grey_dilate_cross(x: jax.Array) -> jax.Array:
    """One grey-scale dilation step with the 3x3 cross over (..., H, W, M).

    Max of the centre and its 4-neighbours (zero border) — the soft-mask
    generalisation of one ``scipy.ndimage.binary_dilation`` iteration:
    identical on {0, 1} masks, monotone on warped soft masks.
    """
    pad = [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    p = jnp.pad(x, pad)
    h, w = x.shape[-3], x.shape[-2]

    def sl(dy, dx):
        return p[..., 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w, :]

    out = sl(0, 0)
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        out = jnp.maximum(out, sl(dy, dx))
    return out


def random_mask_redilation(
    key: jax.Array,
    images: jax.Array,
    max_dilation: int,
    num_views: int = 1,
    num_time_channels: int = 3,
    masks_per_view: int | None = None,
) -> jax.Array:
    """Randomly re-dilate the wing-mask channels per sample (jit-safe).

    The ``wings_masks_dilation`` augmentation
    (tensorflow/simple_data_generator.py:84-87, 99-117): with probability
    0.5 per sample, dilate the mask channels by ``k ~ randint(0,
    max_dilation)`` iterations — exclusive high bound like the reference's
    ``np.random.randint(0, wings_masks_dilation)``, so a config value of 1
    is deliberately a no-op there and here. The reference's channel table
    (4 -> [-1], 5 -> [-2, -1], 16 -> every 4th) generalises to: the last
    channel of each camera-view block for multicam inputs (``num_views``
    must be the CHANNEL-layout view count, models.layout_views — not the
    augmentation-transform count), the trailing one (per-wing) or two
    (all-points, C == T+2 == 5) mask channels otherwise. (The reference
    overwrites the augmented mask with a dilation of the UN-warped mask —
    a bug resolved here by dilating the warped mask, SURVEY §7 hard
    part 3.)

    Data-dependent iteration counts can't branch under jit, so all
    ``max_dilation - 1`` dilation steps run and each sample selects its
    k-th iterate — the steps are 5-tap VPU maxes over the (narrow) mask
    channels only, negligible next to the warp itself.
    """
    b, h, w, c = images.shape
    v = int(num_views)
    cpv = c // v
    # masks per view block = channels beyond the time channels: 1 for
    # per-wing layouts (T+1), 2 for all-points layouts (T+2) — generalises
    # the reference's table (4 -> [-1], 5 -> [-2,-1], 16 -> every 4th) to
    # every view count and to single_time_channel inputs. Callers whose
    # extra channels are NOT wing masks (e.g. BODY_PART_MODEL's 3 part
    # masks — a width the reference's table asserts on, never dilates)
    # must pass masks_per_view=0 explicitly; channel arithmetic cannot
    # tell those layouts apart.
    if masks_per_view is None:
        masks_per_view = max(0, min(cpv - int(num_time_channels), 2))
    else:
        masks_per_view = min(int(masks_per_view), cpv)
    if masks_per_view == 0:
        return images
    mask_inds = [
        cpv * (i + 1) - 1 - m
        for i in range(v)
        for m in range(masks_per_view)
    ]

    k_apply, k_size = jax.random.split(key)
    apply = jax.random.bernoulli(k_apply, 0.5, (b,))
    k = jax.random.randint(k_size, (b,), 0, max(int(max_dilation), 1))
    k = jnp.where(apply, k, 0)

    masks = images[..., jnp.asarray(mask_inds)]
    out = masks
    acc = masks
    for step in range(1, max(int(max_dilation), 1)):
        acc = grey_dilate_cross(acc)
        out = jnp.where((k >= step)[:, None, None, None], acc, out)
    return images.at[..., jnp.asarray(mask_inds)].set(out)


def body_masks(
    time_channels: jax.Array, threshold: float = 0.7, radius: int = 6
) -> jax.Array:
    """Body segmentation mask from the fly's time channels.

    Exact semantics of ``Preprocessor.get_body_masks``
    (tensorflow/preprocessor.py:601-619): mean over the time channels,
    ``>= 0.7`` threshold, then disk(``opening_rad``) dilation followed by
    disk erosion with the SAME element (a morphological closing) — batched
    over all leading (frames, cams) dims in one call instead of the
    reference's per-frame-per-camera loop.

    Args:
      time_channels: (..., H, W, T) fly time channels.

    Returns:
      (..., H, W) boolean body masks.
    """
    av = jnp.mean(time_channels.astype(jnp.float32), axis=-1)
    binary = av >= threshold
    return erode_disk(dilate_disk(binary, radius), radius)
