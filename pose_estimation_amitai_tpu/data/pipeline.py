"""Device-resident training data pipeline.

Replaces the reference's CPU DataLoader + per-sample Python augmentation
(reference: pytorch/Datagenerators.py:17-115 ``DataGenerator`` with shuffled
index ring :39-65; tensorflow/simple_data_generator.py:31-70). The dataset is
small (hundreds-to-thousands of 192x192 frames), so it lives in HBM whole;
per-step batches are pure on-device gathers, and augmentation runs inside the
jitted train step (:mod:`..ops.affine`). The host only produces int32 index
arrays — the feed-bandwidth bottleneck of the reference simply disappears
(SURVEY §7 layer 3).

For the disentangled camera models the per-frame crop-adjusted projection
matrices (reference: pytorch/Datagenerators.py:228-270, 382-413) are
precomputed once on host and ride along as (N, 4, 3, 4)/(N, 4, 4, 3) arrays;
the per-sample random wing choice (:257-260) becomes part of the offline
per-wing duplication instead, which covers both wings every epoch rather than
sampling one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import Config
from ..ops import geometry
from .preprocess import Preprocessor


class DeviceDataset:
    """Arrays in HBM + host-side epoch index generation.

    Split semantics match the reference: one shuffled permutation, first
    ``val_fraction`` to validation (pytorch/Datagenerators.py:109-115), with
    the epoch batch ring of pytorch/Datagenerators.py:39-65 (wrap-around to
    keep batch size constant).
    """

    _device_resident = True

    def __init__(
        self,
        cfg: Config,
        data: dict[str, np.ndarray],
        seed: int | None = None,
    ):
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed if seed is None else seed)
        n = data["box"].shape[0]
        order = self.rng.permutation(n)
        val_size = round(n * cfg.val_fraction)
        self.val_inds = order[:val_size]
        self.train_inds = order[val_size:]
        if self._device_resident:
            # Device-resident dataset (donate to HBM once).
            self.data = {k: jnp.asarray(v) for k, v in data.items()}
        else:
            self.data = {k: np.asarray(v) for k, v in data.items()}
        if "confmaps" in self.data and "peaks" not in self.data:
            # Decoded GT peaks + amplitudes: the augmentation fast path
            # re-renders targets from these (ops/affine.py
            # augment_images_and_peaks) instead of warping every channel.
            # Sub-pixel decode (log-parabola, exact for Gaussian maps):
            # integer-argmax here would snap every training target to the
            # pixel grid and cap the achievable keypoint accuracy at
            # quantisation level.
            from ..ops import peaks as peaks_ops

            decode = jax.jit(peaks_ops.find_peaks_refined)
            pvs = []
            for i in range(0, n, 512):  # chunked: host datasets can be huge
                pvs.append(np.asarray(
                    decode(jnp.asarray(self.data["confmaps"][i : i + 512]))
                ))
            pv = np.concatenate(pvs, axis=0)  # (N, 3, K)
            conv = jnp.asarray if self._device_resident else np.asarray
            self.data["peaks"] = conv(np.transpose(pv[:, :2, :], (0, 2, 1)))
            self.data["peak_vals"] = conv(pv[:, 2, :])
        self.num_samples = n
        self._epoch_order = self.train_inds.copy()
        self._cursor = 0

    # -- reference-parity epoch iteration ------------------------------------
    def shuffle_train_indices(self) -> None:
        self.rng.shuffle(self._epoch_order)
        self._cursor = 0

    def next_batch_indices(self, batch_size: int) -> np.ndarray:
        """Wrap-around batch ring (pytorch/Datagenerators.py:43-65)."""
        if len(self._epoch_order) == 0:
            raise ValueError(
                "empty train split: val_fraction leaves no training "
                "samples (the wrap-around ring would spin forever)"
            )
        out: list[int] = []
        while len(out) < batch_size:
            take = min(batch_size - len(out), len(self._epoch_order) - self._cursor)
            out.extend(self._epoch_order[self._cursor : self._cursor + take])
            self._cursor += take
            if self._cursor >= len(self._epoch_order):
                self._cursor = 0
        return np.asarray(out[:batch_size], np.int32)

    def step_indices(self, batch_size: int, accum_steps: int) -> np.ndarray:
        """(accum_steps, batch_size) indices for one optimiser step."""
        return np.stack(
            [self.next_batch_indices(batch_size) for _ in range(accum_steps)]
        )

    def val_batches(self, batch_size: int):
        """Full-coverage validation batches (last batch padded by wrap)."""
        inds = self.val_inds
        for i in range(0, len(inds), batch_size):
            chunk = inds[i : i + batch_size]
            yield np.asarray(chunk, np.int32), len(chunk)

    def val_payloads(self, batch_size: int):
        """Pre-gathered validation batches: ``(batch_dict, n_valid)``.

        The val split is static, so the (slow on TPU — narrow-row) gather of
        the (N, H, W, K) confmaps happens ONCE; every epoch's eval then
        reads contiguous slices of the cached arrays. Device-resident
        datasets cache on device; host datasets keep the cache in host RAM
        and ship slices per batch.
        """
        if not hasattr(self, "_val_cache"):
            ids = self.val_inds
            if self._device_resident:
                def take(k):
                    return jnp.take(self.data[k], jnp.asarray(ids), axis=0)
            else:
                def take(k):
                    return self.data[k][ids]
            cache = {"image": take("box"), "confmaps": take("confmaps")}
            for k in ("P", "P_inv"):
                if k in self.data:
                    cache[k] = take(k)
            self._val_cache = cache
        n = len(self.val_inds)
        for i in range(0, n, batch_size):
            stop = min(i + batch_size, n)
            yield (
                {k: jnp.asarray(v[i:stop]) for k, v in self._val_cache.items()},
                stop - i,
            )

    def gather(self, ids: np.ndarray) -> dict[str, jax.Array]:
        ids = jnp.asarray(ids)
        batch = {
            "image": jnp.take(self.data["box"], ids, axis=0),
            "confmaps": jnp.take(self.data["confmaps"], ids, axis=0),
        }
        for k in ("P", "P_inv"):
            if k in self.data:
                batch[k] = jnp.take(self.data[k], ids, axis=0)
        return batch

    # -- train-step feeds ----------------------------------------------------
    def step_payload(self, idx: np.ndarray):
        """(data, idx) pair consumed by the jitted train step.

        Device-resident: the whole dataset dict plus global indices — the
        gather happens inside the step on device.
        """
        return self.data, jnp.asarray(idx)

    def microbatch_arrays(self, idx: np.ndarray) -> dict[str, jax.Array]:
        """(accum, B, ...) gathered arrays for the mesh-sharded step."""
        ids = jnp.asarray(idx)
        batch = {
            "image": jnp.take(self.data["box"], ids, axis=0),
            "confmaps": jnp.take(self.data["confmaps"], ids, axis=0),
        }
        for k in ("P", "P_inv", "peaks", "peak_vals"):
            if k in self.data:
                batch[k] = jnp.take(self.data[k], ids, axis=0)
        return batch


class HostDataset(DeviceDataset):
    """Host-RAM-resident variant for datasets that exceed the HBM budget.

    The reference's datasets (hundreds of frames) fit in HBM whole, but
    production movies do not: 100k frames of 192x192x22 f32 is ~32 GB. Here
    the arrays stay in host memory; each step host-gathers the (accum*B)
    window with NumPy fancy indexing and ships it with an async
    ``device_put``, while the previous step is still running on device — a
    one-step implicit pipeline (dispatch is asynchronous), bounding device
    memory at window size. Targets still re-render on device from peak
    coordinates, so the shipped window is images + (K, 2) peaks — the bulky
    (B, H, W, K) confmaps never cross the host-device link on the train path.

    Selected by ``Config.host_resident_data`` or automatically when the
    dataset exceeds ``Config.device_dataset_budget_mb`` (build_dataset).
    """

    _device_resident = False

    def step_payload(self, idx: np.ndarray):
        flat = idx.reshape(-1)
        window: dict[str, jax.Array] = {}
        for k in ("box", "peaks", "peak_vals", "P", "P_inv"):
            if k in self.data:
                window[k] = jnp.asarray(self.data[k][flat])
        if "peaks" not in self.data:
            window["confmaps"] = jnp.asarray(self.data["confmaps"][flat])
        local = np.arange(flat.size, dtype=np.int32).reshape(idx.shape)
        return window, jnp.asarray(local)

    def microbatch_arrays(self, idx: np.ndarray) -> dict[str, jax.Array]:
        batch = {
            "image": jnp.asarray(self.data["box"][idx]),
            "confmaps": jnp.asarray(self.data["confmaps"][idx]),
        }
        for k in ("P", "P_inv", "peaks", "peak_vals"):
            if k in self.data:
                batch[k] = jnp.asarray(self.data[k][idx])
        return batch

    def gather(self, ids: np.ndarray) -> dict[str, jax.Array]:
        ids = np.asarray(ids)
        batch = {
            "image": jnp.asarray(self.data["box"][ids]),
            "confmaps": jnp.asarray(self.data["confmaps"][ids]),
        }
        for k in ("P", "P_inv"):
            if k in self.data:
                batch[k] = jnp.asarray(self.data[k][ids])
        return batch


def _camera_matrix_arrays(
    pre: Preprocessor,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-frame crop-adjusted (P, pinv P) for the disentangled models.

    Host twin of CameraMatrixGenerator (pytorch/Datagenerators.py:382-413):
    decompose each DLT camera once, then shift principal points per frame's
    cropZone. Runs the jittable ops.geometry versions batched over frames.
    """
    cams = jnp.asarray(pre.camera_matrices)  # (4, 3, 4)
    Ks, Rs, ts = jax.vmap(geometry.decompose_camera)(cams)
    crop_size = int(pre.get_confmaps_orig().shape[2])

    def per_frame(cz):
        return geometry.crop_adjusted_matrices(Ks, Rs, ts, cz,
                                               crop_size=crop_size)

    P, P_inv = jax.vmap(per_frame)(jnp.asarray(pre.cropzone, jnp.float32))
    return np.asarray(P), np.asarray(P_inv)


def estimate_cameras_from_peaks(
    confmaps: np.ndarray,
    cropzone: np.ndarray,
    points_3d: np.ndarray,
    crop_local: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-frame DLT camera estimation from decoded ground-truth peaks.

    Host twin of the TF ``CustomDataGenerator`` camera-matrix mode
    (tensorflow/Custom_data_generator.py:216-241): for every frame and
    camera, estimate a 3x4 projection matrix by SVD from the (3D point,
    decoded+uncropped 2D peak) correspondences, plus its pseudo-inverse.
    Alternative to :func:`_camera_matrix_arrays` (which decomposes the H5's
    calibrated DLT cameras instead); useful when ``cameras_dlt_array`` is
    absent or mistrusted.

    Args:
      confmaps: (F, cams, H, W, K) raw maps whose channel order matches
        ``points_3d``; cropzone: (F, cams, 2); points_3d: (F, K, 3).
      crop_local: fit the DLT to the CROP-LOCAL decoded peaks (the
        reference's convention — ``tf_find_peaks`` output feeds the DLT
        with no uncropping, tensorflow/Custom_data_generator.py:186-192),
        in the flipped-y frame ``(x, H - y)`` that
        :func:`..ops.geometry.crop_adjusted_matrices` produces — the crop
        offset is absorbed into each frame's P, so the result is a drop-in
        replacement for the calibrated cameras the FTL models consume.
        Default fits full-sensor coordinates.

    Returns (F, cams, 3, 4) cameras and (F, cams, 4, 3) pseudo-inverses.
    """
    from .preprocess import find_peaks_np

    frames, ncams = confmaps.shape[:2]
    pts3d = points_3d

    flat = confmaps.reshape((-1,) + confmaps.shape[2:])
    peaks2d = find_peaks_np(flat)[:, :2, :]  # (F*cams, 2, K)
    peaks2d = np.transpose(
        peaks2d.reshape(frames, ncams, 2, -1), (0, 1, 3, 2)
    )  # (F, cams, K, 2)

    k = min(pts3d.shape[1], peaks2d.shape[2])
    h, w = confmaps.shape[2:4]
    if crop_local:
        full = peaks2d[:, :, :k].astype(np.float32)
        full = np.stack([full[..., 0], h - full[..., 1]], axis=-1)
    else:
        full = np.asarray(
            jax.vmap(geometry.uncrop_points)(
                jnp.asarray(peaks2d[:, :, :k], jnp.float32),
                jnp.asarray(cropzone, jnp.float32),
            )
        )  # (F, cams, K, 2) full-sensor coords

    P = np.zeros((frames, ncams, 3, 4), np.float32)
    P_inv = np.zeros((frames, ncams, 4, 3), np.float32)
    for f in range(frames):
        for c in range(ncams):
            # drop border-clipped decodes (peak outside the crop window) —
            # they are gross outliers that skew the unweighted DLT fit
            crop_local = peaks2d[f, c, :k]
            ok = (
                (crop_local[:, 0] > 0) & (crop_local[:, 0] < w - 1)
                & (crop_local[:, 1] > 0) & (crop_local[:, 1] < h - 1)
            )
            if ok.sum() < 6:  # DLT needs >= 6 correspondences
                ok = np.ones(k, bool)
            Pfc = np.asarray(
                geometry.estimate_projection_dlt(
                    jnp.asarray(pts3d[f, :k][ok], jnp.float32),
                    jnp.asarray(full[f, c][ok], jnp.float32),
                )
            )
            P[f, c] = Pfc
            P_inv[f, c] = np.linalg.pinv(Pfc)
    return P, P_inv


def build_dataset(
    cfg: Config,
    arrays: dict[str, np.ndarray] | None = None,
    preprocessor: Preprocessor | None = None,
) -> tuple[DeviceDataset, Preprocessor]:
    """Run offline preprocessing and stage the result on device."""
    pre = preprocessor or Preprocessor(cfg, arrays)
    pre.do_preprocess()

    if cfg.model_type in (
        C.ALL_CAMS_DISENTANGLED_PER_WING_CNN,
        C.ALL_CAMS_DISENTANGLED_PER_WING_VIT,
    ):
        # Disentangled path trains on per-wing samples with camera matrices
        # (pytorch/Datagenerators.py:67-84 uses box_orig/confmaps_orig).
        box, confmaps = _assemble_disentangled(pre)
        if cfg.estimate_cameras:
            # per-frame DLT estimation from GT peaks (the TF
            # CustomDataGenerator camera mode) instead of decomposing the
            # calibrated cameras_dlt_array. confmaps_orig's wing blocks are
            # cross-wired (right-index channels first — split_per_wing), so
            # reorder the 3D points to match the channel order.
            pts = pre.points_3d
            order = np.concatenate(
                [pre.right_inds, pre.left_inds,
                 [pts.shape[1] - 2, pts.shape[1] - 1]]
            )
            P, P_inv = estimate_cameras_from_peaks(
                pre.get_confmaps_orig(), pre.cropzone, pts[:, order],
                crop_local=True,
            )
        else:
            P, P_inv = _camera_matrix_arrays(pre)
        # two wing-samples per frame -> duplicate camera matrices
        P = np.concatenate([P, P], axis=0)
        P_inv = np.concatenate([P_inv, P_inv], axis=0)
        data = {"box": box, "confmaps": confmaps, "P": P, "P_inv": P_inv}
    else:
        data = {"box": pre.get_box(), "confmaps": pre.get_confmaps()}
    nbytes = sum(np.asarray(v).nbytes for v in data.values())
    use_host = cfg.host_resident_data or (
        nbytes > cfg.device_dataset_budget_mb * 2**20
    )
    cls = HostDataset if use_host else DeviceDataset
    return cls(cfg, data), pre


def _assemble_disentangled(pre: Preprocessor) -> tuple[np.ndarray, np.ndarray]:
    """Build (2F, H, W, 16) boxes and (2F, H, W, 4*(half+2)) confmaps.

    Twin of CameraMatrixGenerator.__getitem__ (pytorch/Datagenerators.py:
    242-270): per wing, each camera contributes [t0, t1, t2, wing_mask]; the
    confmaps are that wing's channels + head/tail, all 4 cameras concatenated
    on channels. Instead of sampling one random wing per epoch we emit both
    wings as separate samples.
    """
    box_orig = pre.get_box_orig()  # (F, 4cams, H, W, 5)
    cm_orig = pre.get_confmaps_orig()  # (F, 4cams, H, W, 2*half [+2])
    ncams = box_orig.shape[1]
    t = pre.num_time_channels

    # prepare_confmaps (pytorch/Datagenerators.py:272-280)
    head_tail = cm_orig[..., -2:]
    wings = cm_orig[..., :-2]
    left_cm, right_cm = np.array_split(wings, 2, axis=-1)
    left_cm = np.concatenate([left_cm, head_tail], axis=-1)
    right_cm = np.concatenate([right_cm, head_tail], axis=-1)

    left_box = box_orig[..., list(range(t)) + [t]]
    right_box = box_orig[..., list(range(t)) + [t + 1]]

    def cams_to_channels(x):  # (F, cams, H, W, c) -> (F, H, W, cams*c)
        return np.concatenate([x[:, c] for c in range(ncams)], axis=-1)

    box = np.concatenate(
        [cams_to_channels(left_box), cams_to_channels(right_box)], axis=0
    )
    confmaps = np.concatenate(
        [cams_to_channels(left_cm), cams_to_channels(right_cm)], axis=0
    )
    return box.astype(np.float32), confmaps.astype(np.float32)
