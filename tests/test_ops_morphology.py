"""Morphology ops vs scipy.ndimage references."""

import pytest
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from pose_estimation_amitai_tpu.ops import morphology as M

pytestmark = pytest.mark.quick  # gate-style subset: python -m pytest -m quick


def _rand_mask(rng, shape=(24, 24), p=0.3):
    return (rng.random(shape) < p).astype(np.bool_)


def test_cross_structure_matches_scipy_default():
    want = ndimage.generate_binary_structure(2, 1)
    np.testing.assert_array_equal(M.cross(1), want)


def test_binary_dilation_matches_scipy(rng):
    mask = _rand_mask(rng)
    got = np.asarray(M.binary_dilation(jnp.asarray(mask)))
    want = ndimage.binary_dilation(mask)
    np.testing.assert_array_equal(got, want)


def test_binary_dilation_iterations(rng):
    mask = _rand_mask(rng, p=0.05)
    got = np.asarray(M.binary_dilation(jnp.asarray(mask), iterations=3))
    want = ndimage.binary_dilation(mask, iterations=3)
    np.testing.assert_array_equal(got, want)


def test_binary_erosion_matches_scipy(rng):
    mask = _rand_mask(rng, p=0.7)
    got = np.asarray(M.binary_erosion(jnp.asarray(mask)))
    want = ndimage.binary_erosion(mask)
    np.testing.assert_array_equal(got, want)


def test_binary_closing_matches_scipy(rng):
    mask = _rand_mask(rng, p=0.4)
    got = np.asarray(M.binary_closing(jnp.asarray(mask)))
    want = ndimage.binary_closing(mask)
    np.testing.assert_array_equal(got, want)


def test_adjust_mask_semantics(rng):
    """closing + dilation(iterations=k) — pytorch/preprocessor.py:390-393."""
    mask = _rand_mask(rng, p=0.4)
    got = np.asarray(M.adjust_mask(jnp.asarray(mask), mask_dilation=2))
    want = ndimage.binary_dilation(ndimage.binary_closing(mask), iterations=2)
    np.testing.assert_array_equal(got, want)


def test_batched_leading_dims(rng):
    masks = (rng.random((3, 4, 16, 16)) < 0.3).astype(np.bool_)
    got = np.asarray(M.binary_dilation(jnp.asarray(masks)))
    for i in range(3):
        for j in range(4):
            want = ndimage.binary_dilation(masks[i, j])
            np.testing.assert_array_equal(got[i, j], want)


def test_disk_dilation_matches_scipy(rng):
    mask = _rand_mask(rng, p=0.05)
    got = np.asarray(M.dilate_disk(jnp.asarray(mask), 3))
    want = ndimage.binary_dilation(mask, structure=M.disk(3))
    np.testing.assert_array_equal(got, want)


def test_redilation_hits_every_camera_mask_channel():
    """16-channel multicam boxes re-dilate EVERY view's mask channel
    ([3, 7, 11, 15] — tensorflow/simple_data_generator.py:104-111), driven
    by the channel layout, not the augmentation-transform count."""
    import jax

    from pose_estimation_amitai_tpu.models import layout_views
    from pose_estimation_amitai_tpu import constants as C
    from pose_estimation_amitai_tpu.ops.morphology import (
        random_mask_redilation,
    )

    assert layout_views(C.ALL_CAMS) == 4
    assert layout_views(C.ALL_CAMS_18_POINTS) == 4
    assert layout_views(C.MODEL_18_POINTS_PER_WING) == 1

    rng = np.random.default_rng(0)
    box = np.zeros((4, 32, 32, 16), np.float32)
    for ch in (3, 7, 11, 15):
        box[:, 15:17, 15:17, ch] = 1.0  # small seed masks
    out = np.asarray(random_mask_redilation(
        jax.random.key(3), jnp.asarray(box), 4,
        num_views=layout_views(C.ALL_CAMS),
    ))
    changed = [
        ch for ch in range(16)
        if not np.array_equal(out[..., ch], box[..., ch])
    ]
    # every changed channel is a mask channel, and with 4 samples at
    # p=0.5 at least one sample dilates => masks beyond [15] change
    assert set(changed) <= {3, 7, 11, 15}
    assert len(changed) == 4, changed


def test_redilation_skips_body_part_masks():
    """BODY_PART_MODEL samples (3 time + 3 part-mask channels) must never
    be re-dilated: the reference's dilation table has no 6-channel row (it
    asserts on unknown widths, tensorflow/simple_data_generator.py:104-111)
    and the extra channels are body parts, not wings. layout_masks_per_view
    pins them to 0 and random_mask_redilation honours the override
    (round-2 ADVICE, ops/morphology.py)."""
    import jax

    from pose_estimation_amitai_tpu import constants as C
    from pose_estimation_amitai_tpu.models import layout_masks_per_view
    from pose_estimation_amitai_tpu.ops.morphology import (
        random_mask_redilation,
    )

    assert layout_masks_per_view(C.BODY_PARTS_MODEL) == 0
    assert layout_masks_per_view(C.MODEL_18_POINTS_PER_WING) is None

    box = np.zeros((4, 32, 32, 6), np.float32)
    box[:, 15:17, 15:17, 3:] = 1.0  # seed "part mask" channels
    out = np.asarray(random_mask_redilation(
        jax.random.key(3), jnp.asarray(box), 4, num_views=1,
        masks_per_view=layout_masks_per_view(C.BODY_PARTS_MODEL),
    ))
    np.testing.assert_array_equal(out, box)
