"""Synthetic generator contracts: per-seed stability + the outline layout.

The generator is the stand-in for the lab-internal H5 dataset, so its
per-seed output is part of the test contract: fixtures, convergence
thresholds, and the reference-regime parity run all assume a given seed
reproduces the same arrays build-to-build (a round-2 regression shifted the
default RNG stream and silently changed every downstream dataset).
"""

import numpy as np
import pytest

from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays


def test_default_mode_stable_per_seed():
    """Checksum guard: the default (iid/cloud) arrays for a fixed seed must
    never drift — new generator features must gate their RNG draws."""
    a = make_synthetic_arrays(num_frames=2, num_points=8, image_size=48,
                              seed=5)
    assert float(a["box"].sum()) == pytest.approx(23347.549, abs=0.01)
    assert float(a["confmaps"].sum()) == pytest.approx(1946.345, abs=0.01)


def test_outline_layout_orders_landmarks_on_boundary():
    """Outline wings: consecutive landmark indices are spatial neighbours
    (closed loop), and the two wings' chains are disjoint point sets."""
    a = make_synthetic_arrays(num_frames=2, num_points=16, image_size=192,
                              seed=1, wing_spread=0.008, motion="movie",
                              layout="outline")
    conf = a["confmaps"]
    h = conf.shape[2]
    half = 8
    for wi in range(2):
        pk = []
        for p in range(wi * half, (wi + 1) * half):
            y, x = np.unravel_index(np.argmax(conf[0, 0, :, :, p]), (h, h))
            pk.append((y, x))
        pk = np.asarray(pk, np.float64)
        ring = np.vstack([pk, pk[:1]])  # closed loop
        steps = np.linalg.norm(np.diff(ring, axis=0), axis=1)
        # neighbours along the boundary: every step far below the planform
        # diameter (the cloud layout gives near-diameter jumps routinely)
        diam = np.linalg.norm(pk.max(0) - pk.min(0))
        assert diam > 20.0  # the wing is a real extended structure
        assert steps.max() < 0.75 * diam
        assert np.median(steps) < 0.35 * diam


def test_outline_layout_peaks_inside_own_mask():
    """Wing-i landmark peaks fall inside wing-i's mask channel (the
    split_per_wing pairing contract the parity regime depends on)."""
    a = make_synthetic_arrays(num_frames=3, num_points=32, image_size=192,
                              seed=1, wing_spread=0.008, motion="movie",
                              layout="outline")
    box, conf = a["box"], a["confmaps"]
    h = conf.shape[2]
    half = 16
    in_own = in_other = 0
    for f in range(box.shape[0]):
        for c in range(box.shape[1]):
            for wi in range(2):
                mask = box[f, c, :, :, 3 + wi]
                other = box[f, c, :, :, 4 - wi]
                for p in range(wi * half, (wi + 1) * half):
                    y, x = np.unravel_index(
                        np.argmax(conf[f, c, :, :, p]), (h, h))
                    in_own += mask[y, x] > 0
                    in_other += other[y, x] > 0
    total = 3 * 4 * 2 * half
    assert in_own / total > 0.9
    assert in_other / total < 0.35


def test_movie_mode_smooth_trajectories():
    """Consecutive movie frames move each 3D point far less than iid
    frames do (the property the reference debug regime trains on)."""
    kw = dict(num_frames=8, num_points=16, image_size=96, seed=2,
              wing_spread=0.008)
    mov = make_synthetic_arrays(motion="movie", **kw)["points_3D"]
    iid = make_synthetic_arrays(motion="iid", **kw)["points_3D"]
    step = lambda p: float(np.linalg.norm(np.diff(p, axis=0), axis=-1).mean())
    assert step(mov) < 0.5 * step(iid)
