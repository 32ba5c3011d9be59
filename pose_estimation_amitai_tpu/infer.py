"""First-class batched inference: frames -> heatmaps -> keypoints -> 3D.

The reference has no dedicated predict entry point — inference-as-practiced is
"load checkpoint -> model.predict(box) -> tf_find_peaks argmax -> (optionally)
per-pair cv2 triangulation to 3D" scattered over notebooks and an external
script (reference: SURVEY §3.5; run_segmentation.job:22-26 calls a script that
is not in the repo; decode at tensorflow/preprocessor.py:657-689, 3D lift at
pytorch/Datagenerators.py:322-345). The rebuild makes it a module:

* ``Predictor`` — params + one jitted chunked program
  ``frames -> (heatmaps?, peaks[x, y, val])`` entirely on device; fixed chunk
  size for one XLA compilation, tail padded (static shapes, no recompiles)
* ``predict_movie`` — movie-scale throughput loop (the 5k frames/sec/chip
  benchmark surface, BASELINE.md): pipelined dispatch over pre-staged chunks
* ``lift_to_3d`` — decoded per-camera peaks + cropZone + DLT cameras ->
  multi-view triangulated 3D points, vmapped over frames

Layout: NHWC frames (B, H, W, C) exactly as the training pipeline emits them.
"""

from __future__ import annotations

from collections.abc import Mapping
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .config import Config
from .models import build_model
from .ops import geometry, peaks
from .train import checkpoint as ckpt


def _is_pipeline_layout(params) -> bool:
    """True for a pipeline-parallel-trained ViT param tree (stacked
    ``blocks`` layout, parallel/pipeline.py) in any Mapping flavour."""
    return isinstance(params, Mapping) and (
        "blocks" in params and "embed" in params
    )


class Predictor:
    """Jitted chunked heatmap inference + peak decode for one model."""

    def __init__(
        self,
        cfg: Config,
        params,
        image_shape: tuple[int, int, int],
        num_output_channels: int,
        chunk_size: int = 256,
        return_heatmaps: bool = False,
        use_fused: bool = False,
        use_quantized: bool = False,
        calibration_frames=None,
        decode: str = "argmax",
        mesh=None,
        batch_stats=None,
        cameras=None,
        quantized_layers: str | None = None,
        model=None,
        fast_softmax: bool | None = None,
    ):
        """``decode``: 'argmax' (tf_find_peaks parity), 'soft' — the
        differentiable soft-argmax decoder (pytorch/utils.py:47-83) — or
        'refined' — sub-pixel log-parabola refinement around the argmax
        (exact for the sigma-Gaussian target family; ops/peaks.py
        find_peaks_refined), which beats both reference decoders.

        ``mesh``: optional ``jax.sharding.Mesh`` — frames shard over the
        ``data`` axis (params replicated); chunk_size must divide by the
        mesh size.

        ``cameras``: (P, P_inv) per-SAMPLE crop-adjusted camera arrays
        ((S, 4, 3, 4), (S, 4, 4, 3)) — required by the camera-matrix
        (disentangled FTL) model family, whose forward takes
        (x, P, P_inv); samples passed to ``__call__`` must align with
        these rows.

        ``quantized_layers``: ``None``/'all' quantises every supported
        layer; 'conv_only' is the ViT mixed-precision serving mode —
        only the CNN decoder's conv stack runs int8 while the
        transformer trunk stays bf16 (DESIGN.md serving findings; the
        hand-scheduled flagship BasicNet path is all-conv and ignores
        this).

        ``fast_softmax``: ``None`` (default) auto-engages the ViT
        families' bf16 softmax serving chain for argmax peaks-only
        serving (models/vit.py Attention.fast_softmax — approximate to
        bf16 precision, argmax parity pinned in tests); ``False`` forces
        the exact f32 softmax, ``True`` forces the bf16 chain."""
        from .models import needs_camera_matrices

        self.cfg = cfg
        # ``model``: explicit module override — used by the reference-
        # checkpoint import path, whose architecture comes from the
        # checkpoint's own weight shapes rather than the config
        self.model = model if model is not None else build_model(
            cfg, image_shape, num_output_channels
        )
        # 4-camera view folding is batch-regime dependent (measured, v5e):
        # folded (views on the batch axis) wins at small batch (+33% bf16
        # latency, +11-17% int8) but its 4x-batch decoder activations OOM
        # past ~chunk 96 and large-batch unfolded matches or beats it
        # (XLA sequences the views, so peak memory stays 1 view's
        # activations and the batch can grow to the throughput-optimal
        # size). Auto-select per chunk size; bit parity between the paths
        # is pinned in tests/test_models.py.
        if (
            chunk_size >= 128
            and getattr(self.model, "fold_views", None) is True
        ):
            self.model = self.model.clone(fold_views=False)
        # ViT-family peaks-only serving: the decoder's per-sample min-max
        # normalisation is strictly monotonic, so argmax peak locations are
        # unchanged — skip materialising the normalised f32 maps (3 full-map
        # HBM passes). The public val channel KEEPS the normalised-model
        # semantics: the per-sample (per-view for the 4-cam ViT) min/max
        # are recovered with one fused read-only reduce over the raw maps
        # and applied to the decoded vals — bit-identical to decoding the
        # normalised maps, since the affine rescale is monotone and is
        # evaluated on the same f32 values. 'refined'/'soft' decodes and
        # heatmap-returning paths keep the reference output path entirely.
        self._val_renorm_views = 0
        if (
            decode == "argmax"
            and not return_heatmaps
            and getattr(self.model, "normalize_output", None) is True
        ):
            from .models.vit import ViT4Cameras

            if isinstance(self.model, ViT4Cameras):
                # the shared decoder normalises each camera view's channel
                # block independently (models/vit.py ViT4Cameras)
                self._val_renorm_views = 4
            elif getattr(self.model, "flavor", None) == "torch":
                self._val_renorm_views = 1
            if self._val_renorm_views:
                self.model = self.model.clone(normalize_output=False)
        # ViT-family bf16 softmax chain for argmax peaks-only serving
        # (models/vit.py Attention.fast_softmax): halves the HBM traffic of
        # the profiled softmax bottleneck. Unlike the min-max skip above it
        # is APPROXIMATE (bf16 logits, ~3 significant digits) — argmax
        # decode parity is pinned in tests/test_models.py; pass
        # ``fast_softmax=False`` to force the exact f32 softmax chain.
        engage_fast = (
            fast_softmax if fast_softmax is not None
            else (decode == "argmax" and not return_heatmaps)
        )
        if (
            engage_fast
            and getattr(self.model, "fast_softmax", None) is False
        ):
            self.model = self.model.clone(fast_softmax=True)
        elif (
            fast_softmax is False
            and getattr(self.model, "fast_softmax", None) is True
        ):
            # honour the explicit disable even when the caller passed a
            # model object that already had the fast chain engaged
            self.model = self.model.clone(fast_softmax=False)
        # models/vit.py Attention.fused_serving (merged V/out projection)
        # is NOT auto-engaged: measured ~10% SLOWER than the two-GEMM
        # einsum form on v5e at batches 512-1024 (scripts/exp_vit_fused.py,
        # 2026-08-21) — XLA's batched-per-head attention GEMMs beat the
        # single (tokens, heads)-contracting GEMM. The switch stays
        # available (exact param tree, parity pinned in tests) for future
        # toolchains.
        self._needs_cams = needs_camera_matrices(cfg.model_type)
        self.cameras = None
        if cameras is not None:
            self.cameras = (
                np.asarray(cameras[0], np.float32),
                np.asarray(cameras[1], np.float32),
            )
        if _is_pipeline_layout(params):
            # pipeline-parallel-trained ViT checkpoint (stacked block
            # layout): rearrange to the ViTPoseNet tree for serving
            from .parallel.pipeline import pipeline_params_to_vit

            params = pipeline_params_to_vit(params)
        self.params = params
        self._image_shape = tuple(image_shape)
        # BatchNorm running stats ride next to params (ResNet /
        # disentangled families); {} for stat-free models.
        self.variables = {"params": params}
        if batch_stats:
            self.variables["batch_stats"] = batch_stats
        self.chunk_size = chunk_size
        self.return_heatmaps = return_heatmaps
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel.mesh import DATA_AXIS

            assert chunk_size % mesh.devices.size == 0
            self._batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
            repl = NamedSharding(mesh, P())
            self.variables = jax.tree_util.tree_map(
                lambda v: jax.device_put(v, repl), self.variables
            )
            self.params = self.variables["params"]

        from .models.cnn import BasicNet
        # the hand-scheduled quantized/fused paths hardcode the flagship
        # geometry (kernel 3, dilation 2); other BasicNet configs route to
        # the generic interceptor / flax forward, which handle any geometry
        is_basic = (
            type(self.model) is BasicNet and self.model.flavor == "torch"
            and self.model.kernel_size == 3 and self.model.dilation == 2
        )
        fused_ok = use_fused and is_basic

        # Introspectable serving route, pinned by the dispatch regression
        # test (tests/test_serving_dispatch.py): 'int8_resident' — the
        # hand-scheduled flagship path; 'int8_generic' — interceptor-based
        # int8 for every other family; 'fused' — Pallas fused encoder;
        # 'flax' — plain bf16 model.apply.
        if use_quantized:
            self.serving_path = "int8_resident" if is_basic else "int8_generic"
        elif fused_ok:
            self.serving_path = "fused"
        else:
            self.serving_path = "flax"

        quantized_fwd = None
        if use_quantized:
            # calibrated int8 serving path (v5e: ~2x bf16 MXU rate; peak
            # parity verified in tests/test_quantized.py)
            assert calibration_frames is not None, (
                "use_quantized needs calibration_frames"
            )
            f32_variables = jax.tree_util.tree_map(
                lambda v: jnp.asarray(v, jnp.float32), self.variables
            )
            f32_params = f32_variables["params"]
            if self._needs_cams:
                # camera-matrix models calibrate on (frames, P, P_inv)
                # positional tuples
                assert self.cameras is not None, (
                    "quantized camera-matrix serving needs cameras"
                )
                Pc, Pic = self.cameras
                fr = np.asarray(calibration_frames)
                # camera rows must align 1:1 with the calibration frames
                # (frames are assumed to be the head of the sample set the
                # cameras were built for)
                n = min(len(fr), len(Pc), 32)
                calibration_frames = [
                    (
                        jnp.asarray(fr[i : min(i + 8, n)], jnp.float32),
                        jnp.asarray(Pc[i : min(i + 8, n)], jnp.float32),
                        jnp.asarray(Pic[i : min(i + 8, n)], jnp.float32),
                    )
                    for i in range(0, n, 8)
                ]
            if is_basic:
                # hand-scheduled int8 BasicNet with int8-resident
                # activations (fastest flagship path: HBM-bound workload,
                # so int8 storage halves the dominant traffic)
                from .models.quantized import (
                    calibrate,
                    make_quantized_resident_forward,
                )

                scales = calibrate(
                    f32_params, np.asarray(calibration_frames)
                )
                quantized_fwd = make_quantized_resident_forward(
                    self.model, f32_params, scales, out_dtype=jnp.bfloat16
                )
            else:
                # generic interceptor-based int8 (ViT / multicam / ResNet /
                # disentangled — models/quantized_generic.py); 'conv_only'
                # restricts the rewrite to the conv decoder stack (the ViT
                # mixed-precision mode, see the class docstring)
                from .models.quantized_generic import (
                    conv_layers_only,
                    quantize_predict_fn,
                )

                if quantized_layers in (None, "", "all"):
                    layer_filter = None
                elif quantized_layers == "conv_only":
                    layer_filter = conv_layers_only
                else:
                    raise ValueError(
                        f"unknown quantized_layers={quantized_layers!r}; "
                        "expected 'all' or 'conv_only'"
                    )
                # camera-matrix models calibrate on the positional-tuple
                # list built above — np.asarray would choke on its
                # inhomogeneous (frames, P, P_inv) shapes
                calib = (
                    calibration_frames
                    if isinstance(calibration_frames, list)
                    else np.asarray(calibration_frames)
                )
                quantized_fwd = quantize_predict_fn(
                    self.model, f32_variables, calib,
                    out_dtype=jnp.bfloat16,
                    layer_filter=layer_filter,
                )

        def forward(variables, frames, *cams):
            if quantized_fwd is not None:
                return quantized_fwd(frames, *cams)
            if fused_ok:
                from .models.fast_infer import basicnet_apply_fused

                return basicnet_apply_fused(
                    self.model, variables["params"], frames
                )
            return self.model.apply(variables, frames, *cams, train=False)

        @jax.jit
        def _run(variables, frames, *cams):
            maps = forward(variables, frames, *cams)
            if decode == "soft":
                xy = peaks.find_peaks_soft_argmax(maps)  # (B, K, 2)
                vals = jnp.max(maps.reshape(maps.shape[0], -1,
                                            maps.shape[-1]), axis=1)
                pts = jnp.concatenate(
                    [jnp.transpose(xy, (0, 2, 1)), vals[:, None, :]], axis=1
                )
            elif decode == "refined":
                pts = peaks.find_peaks_refined(maps)  # (B, 3, K)
            else:
                pts = peaks.find_peaks_with_vals(maps)  # (B, 3, K)
                if self._val_renorm_views:
                    # recover the normalised-model val channel from the raw
                    # maps: one fused read-only min/max reduce per view
                    # block replaces the skipped min-max normalisation
                    # (identical f32 expression, so vals match the
                    # normalised model's decode exactly)
                    v = self._val_renorm_views
                    b, h, w, c = maps.shape
                    m32 = maps.astype(jnp.float32).reshape(
                        b, h, w, v, c // v
                    )
                    lo = jnp.min(m32, axis=(1, 2, 4))  # (B, V)
                    hi = jnp.max(m32, axis=(1, 2, 4))
                    lo_c = jnp.repeat(lo, c // v, axis=1)  # (B, C)
                    rng_c = jnp.repeat(hi - lo, c // v, axis=1)
                    vals = (pts[:, 2, :] - lo_c) / (rng_c + 1e-12)
                    pts = jnp.concatenate(
                        [pts[:, :2, :], vals[:, None, :]], axis=1
                    )
            if return_heatmaps:
                return maps, pts
            return pts

        self._run = _run

    def _stage(self, chunk) -> jax.Array:
        """Place one (chunk_size, H, W, C) array on device (sharded if a
        mesh is configured)."""
        arr = jnp.asarray(chunk)
        if self.mesh is not None:
            arr = jax.device_put(arr, self._batch_sharding)
        return arr

    @classmethod
    def from_checkpoint(
        cls,
        cfg: Config | str,
        checkpoint_path: str,
        image_shape: tuple[int, int, int] = (192, 192, 4),
        num_output_channels: int = 18,
        **kw,
    ) -> "Predictor":
        """Build from a saved params/checkpoint msgpack file — or directly
        from a REFERENCE checkpoint (keras ``.h5`` / torch
        ``checkpoint.pth`` / TorchScript ``best_model.pth``), which is
        auto-detected (or forced with ``import_reference=True``) and
        converted on the fly via :mod:`..importers`; the architecture then
        comes from the checkpoint's own weight shapes.

        Full checkpoint payloads carry BatchNorm running stats
        (``batch_stats``) which the BN model families (ResNet /
        disentangled) need at eval time — they are restored and threaded
        through automatically."""
        if isinstance(cfg, str):
            cfg = Config.from_json(cfg)
        import_reference = kw.pop("import_reference", False)
        dim_head = kw.pop("dim_head", None)
        from .importers import (
            is_reference_checkpoint,
            load_imported_snapshot,
        )

        imported = None
        if import_reference or is_reference_checkpoint(checkpoint_path):
            from .importers import import_reference_checkpoint

            imported = import_reference_checkpoint(
                checkpoint_path, dim_head=dim_head
            )
        else:
            # a native snapshot written by `cli import` carries the exact
            # architecture metadata + BN stats alongside the params —
            # rebuild from that, never from the (possibly drifted) config
            imported = load_imported_snapshot(checkpoint_path)
        if imported is not None:
            in_ch = imported.arch_kwargs.get("in_channels")
            if in_ch is not None and in_ch != image_shape[-1]:
                raise ValueError(
                    f"imported checkpoint expects {in_ch}-channel inputs, "
                    f"dataset provides {image_shape[-1]}"
                )
            model = imported.build_model(dtype=jnp.bfloat16)
            params = jax.tree_util.tree_map(jnp.asarray, imported.params)
            if imported.batch_stats:
                kw.setdefault(
                    "batch_stats",
                    jax.tree_util.tree_map(jnp.asarray, imported.batch_stats),
                )
            return cls(
                cfg, params, image_shape,
                imported.arch_kwargs["out_channels"], model=model, **kw,
            )
        from .models import needs_camera_matrices

        model = build_model(cfg, image_shape, num_output_channels)
        init_args = [jnp.zeros((1, *image_shape), jnp.float32)]
        if needs_camera_matrices(cfg.model_type):
            # camera-matrix (FTL) family: forward takes (x, P, P_inv)
            init_args += [
                jnp.zeros((1, 4, 3, 4), jnp.float32),
                jnp.zeros((1, 4, 4, 3), jnp.float32),
            ]
        template = model.init(
            {"params": jax.random.key(0)}, *init_args, train=False
        )["params"]
        # restore raw first: a pipeline-parallel-trained ViT checkpoint has
        # the stacked block layout and must be rearranged BEFORE the
        # template restore (which would otherwise fail on mismatched keys)
        params, batch_stats = ckpt.load_variables(checkpoint_path)
        if _is_pipeline_layout(params):
            from .parallel.pipeline import pipeline_params_to_vit

            params = pipeline_params_to_vit(params)
        from flax import serialization

        params = serialization.from_state_dict(template, params)
        kw.setdefault("batch_stats", batch_stats)
        return cls(cfg, params, image_shape, num_output_channels, **kw)

    # ------------------------------------------------------------------
    def __call__(self, frames: np.ndarray):
        """Decode keypoints for (N, H, W, C) frames; N arbitrary.

        Returns (N, 3, K) [x, y, val] float32 (plus (N, H, W, K) heatmaps
        first if ``return_heatmaps``).
        """
        n = frames.shape[0]
        cs = self.chunk_size
        if self._needs_cams and self.cameras is None:
            raise ValueError(
                f"{self.cfg.model_type} takes camera matrices: construct "
                "the Predictor with cameras=(P, P_inv) per sample"
            )
        outs, maps = [], []
        for i in range(0, n, cs):
            chunk = frames[i : i + cs]
            pad = cs - chunk.shape[0]
            cams = ()
            if self._needs_cams:
                # pad with the last row (NOT zeros: a zero camera feeds
                # garbage through FTL; padded outputs are dropped anyway)
                cams = tuple(
                    np.concatenate(
                        [c[i : i + cs]]
                        + ([np.repeat(c[i : i + cs][-1:], pad, axis=0)]
                           if pad else [])
                    )
                    for c in self.cameras
                )
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)]
                )
            res = self._run(
                self.variables, self._stage(chunk),
                *(jnp.asarray(c) for c in cams),
            )
            if self.return_heatmaps:
                m, p = res
                maps.append(np.asarray(m)[: cs - pad])
                outs.append(np.asarray(p)[: cs - pad])
            else:
                outs.append(np.asarray(res)[: cs - pad])
        pts = np.concatenate(outs, axis=0)
        if self.return_heatmaps:
            return np.concatenate(maps, axis=0), pts
        return pts

    def predict_movie(
        self, frames: np.ndarray, prefetch: int = 4
    ) -> np.ndarray:
        """Throughput-oriented streaming decode of a whole movie.

        Keeps at most ``prefetch`` chunks in flight: chunk i+prefetch is
        staged (async host->device copy) and dispatched while chunk i's
        (tiny) decoded-peak output is fetched — compute, transfers and host
        work overlap, and device memory stays bounded at
        ``prefetch * chunk_size`` frames regardless of movie length (a
        100k-frame movie does NOT fit in HBM whole). Tail via __call__.
        """
        assert not self.return_heatmaps, "movie path decodes peaks only"
        if self._needs_cams:
            # camera-matrix models ride the chunked __call__ (per-chunk
            # camera slices); no streaming specialisation needed
            return self.__call__(frames)
        n = frames.shape[0]
        cs = self.chunk_size
        n_full = n // cs
        out = []
        in_flight: list = []
        for i in range(n_full):
            chunk = self._stage(frames[i * cs : (i + 1) * cs])
            in_flight.append(self._run(self.variables, chunk))  # async dispatch
            if len(in_flight) >= prefetch:
                out.append(np.asarray(in_flight.pop(0)))
        out.extend(np.asarray(r) for r in in_flight)
        if n_full * cs < n:
            out.append(self(frames[n_full * cs :]))
        return np.concatenate(out, axis=0) if out else np.zeros((0, 3, 1))


# ---------------------------------------------------------------------------
# 2D -> 3D lifting
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=())
def _lift_frames(points_2d, cropzone, cams):
    """(F, 4, N, 2) crop-local peaks + (F, 4, 2) crops + (4, 3, 4) cams
    -> (F, N, 3)."""

    def one(pts, cz):
        full = geometry.uncrop_points(pts, cz)  # (4, N, 2)
        return geometry.triangulate_multiview(cams, full)

    return jax.vmap(one)(points_2d, cropzone)


def lift_to_3d(
    points_2d: np.ndarray, cropzone: np.ndarray, camera_matrices: np.ndarray
) -> np.ndarray:
    """Triangulate per-camera decoded peaks to 3D, vmapped over frames.

    Args:
      points_2d: (F, 4, N, 2) crop-local [x, y] peaks per camera.
      cropzone: (F, 4, 2) [y, x] crop offsets.
      camera_matrices: (4, 3, 4) full-sensor DLT matrices.

    Returns:
      (F, N, 3) triangulated 3D points (mean over the 6 camera pairs,
      reference practice per SURVEY §3.5).
    """
    return np.asarray(
        _lift_frames(
            jnp.asarray(points_2d, jnp.float32),
            jnp.asarray(cropzone, jnp.float32),
            jnp.asarray(camera_matrices, jnp.float32),
        )
    )


def evaluate_l2(
    predictor: Predictor, frames: np.ndarray, confmaps: np.ndarray
) -> dict:
    """Pixel-L2 stats of predicted vs ground-truth peaks (eval CLI core).

    Mirrors the reference's validation metric (pytorch/train_pytorch.py:
    199-213): per-channel argmax of both map stacks, euclidean distance.
    """
    pred_pts = predictor(frames)[:, :2, :]  # (N, 2, K)
    true_pts = np.asarray(
        peaks.find_peaks_with_vals(jnp.asarray(confmaps))
    )[:, :2, :]
    d = np.linalg.norm(pred_pts - true_pts, axis=1)  # (N, K)
    return {
        "l2_mean": float(d.mean()),
        "l2_std": float(d.std()),
        "l2_max": float(d.max()),
        "l2_per_point": d.mean(axis=0).tolist(),
    }
