"""The Trainer: run folders, epoch loop, metrics artifacts, checkpoints, resume.

Re-design of both reference entry points (reference:
pytorch/train_pytorch.py:37-397, tensorflow/train.py:34-153) keeping their
run-directory artifact contract (SURVEY §5):

* auto-suffixed run folder ``<model_type>_<Mon DD>[_NN]`` with
  weights/, viz_pred/, histograms/, l2_histograms/, l2_histograms_per_point/
  and a full ``training code/`` snapshot (train.py:122-147)
* ``configuration.json`` config snapshot (train.py:108-110)
* ``losses.csv`` per epoch: train/val loss + L2 mean/std/max
  (train_pytorch.py:262-283) and ``history.csv`` (CallBacks.py:17-33)
* per-epoch L2 histograms, per-point histograms, prediction overlay PNGs
* ``checkpoint.msgpack`` every epoch + best-on-val snapshot, with TRUE
  resume (``resume_from`` config) — closing the reference's gap (SURVEY §5)

The compute itself is the jitted step from :mod:`.loop`; one epoch is
``batches_per_epoch`` microbatches = ``batches_per_epoch/accumulation_steps``
optimiser updates, matching pytorch/train_pytorch.py:125-142.
"""

from __future__ import annotations

import csv
import json
import os
import shutil
import sys
from datetime import date
from time import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import viz
from ..config import Config
from ..data.pipeline import build_dataset
from ..models import build_model
from ..ops import peaks as peaks_ops
from . import checkpoint as ckpt
from .loop import (
    PlateauScheduler,
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _graft_tree(tgt, src, what: str):
    """Validate-and-cast ``src`` into the template tree ``tgt``.

    Both trees are flattened WITH key paths and compared as key->leaf
    maps, so equal-leaf-count trees with different key sets report the
    actual missing/extra keys instead of a misaligned zip's bogus shape
    table (advisor r4), and every per-leaf shape mismatch is named before
    any cast happens (a silently grafted wrong-width coarse model only
    fails later as a cryptic lax conv shape error)."""
    tu = jax.tree_util
    tgt_map = {tu.keystr(kp): t for kp, t in tu.tree_flatten_with_path(tgt)[0]}
    src_map = {tu.keystr(kp): v for kp, v in tu.tree_flatten_with_path(src)[0]}
    missing = sorted(set(tgt_map) - set(src_map))
    extra = sorted(set(src_map) - set(tgt_map))
    if missing or extra:
        parts = []
        if missing:
            parts.append("missing " + ", ".join(missing[:5]))
        if extra:
            parts.append("unexpected " + ", ".join(extra[:5]))
        raise ValueError(
            f"{what} tree does not match the model's "
            f"({len(src_map)} loaded leaves vs {len(tgt_map)} expected; "
            + "; ".join(parts)
            + " — is resnet_flavor/arch/num_blocks set right?)"
        )
    mismatches = [
        f"{k}: {tuple(tgt_map[k].shape)} vs {tuple(np.shape(src_map[k]))}"
        for k in tgt_map
        if tuple(tgt_map[k].shape) != tuple(np.shape(src_map[k]))
    ]
    if mismatches:
        raise ValueError(
            f"{what} shapes do not match the model's "
            "(is resnet_flavor/arch set right?): " + "; ".join(mismatches[:5])
        )
    return jax.tree_util.tree_map(
        lambda t, v: jnp.asarray(v).astype(t.dtype), tgt, src
    )


class _CkptSync:
    """Synchronous stand-in for AsyncCheckpointer (async_checkpoint=0).

    Resolves ``ckpt.save_*`` at call time so monkeypatched writers (tests,
    scripts) stay effective on both paths."""

    def save_checkpoint(self, *args, **kwargs) -> None:
        ckpt.save_checkpoint(*args, **kwargs)

    def save_params(self, *args, **kwargs) -> None:
        ckpt.save_params(*args, **kwargs)

    def wait(self) -> None:
        pass


class Trainer:
    def __init__(
        self,
        cfg: Config | str,
        arrays: dict[str, np.ndarray] | None = None,
    ):
        if isinstance(cfg, str):
            cfg = Config.from_json(cfg)
        self.cfg = cfg
        self.debug_mode = cfg.debug_mode
        self.batches_per_epoch = 1 if cfg.debug_mode else cfg.batches_per_epoch

        if cfg.nan_debug:
            # analog of torch.autograd.set_detect_anomaly(True)
            # (pytorch/train_pytorch.py:117)
            jax.config.update("jax_debug_nans", True)

        # Multi-host: join the pod-level JAX cluster BEFORE any jax array is
        # created — jax.distributed.initialize() must run before the backend
        # initialises, and build_dataset places device arrays. After it,
        # jax.devices() spans every host (no-op unless configured).
        from ..parallel.mesh import maybe_initialize_distributed

        maybe_initialize_distributed(cfg)

        self.dataset, self.preprocessor = build_dataset(cfg, arrays)
        self.run_name = f"{cfg.model_type}_{date.today().strftime('%b %d')}"
        self.run_path = self._create_run_folders()
        self._save_configuration()

        sample_ids = self.dataset.train_inds[: max(1, min(2, len(self.dataset.train_inds)))]
        sample_batch = self.dataset.gather(np.asarray(sample_ids, np.int32))
        img_shape = sample_batch["image"].shape[1:]
        num_out = sample_batch["confmaps"].shape[-1]
        if cfg.pipeline_stages > 1:
            # GPipe pipeline parallelism over the ViT trunk: same generic
            # train/eval machinery, the model behind it is the pipelined
            # forward on a (data, pipe) mesh (parallel/pipeline.py).
            self.model, self.mesh = self._build_pipelined_model(
                img_shape, num_out
            )
        else:
            self.model = build_model(cfg, img_shape, num_out)
        self.state = create_train_state(self.model, cfg, sample_batch, cfg.seed)
        self._maybe_load_pretrained()

        if cfg.pipeline_stages > 1:
            from ..parallel.pipeline import shard_state_pp
            from ..parallel.sharded import make_sharded_train_step

            self.state = shard_state_pp(self.mesh, self.state, cfg)
            self._sharded_step = make_sharded_train_step(
                self.model, cfg, self.mesh
            )
            self.eval_step = make_eval_step(self.model, cfg)
            self._finish_init()
            return

        # Multi-chip data parallelism (SURVEY §2.4): with >1 device (or an
        # explicit mesh_shape) batches shard over the mesh's data axis and
        # XLA all-reduces gradients over ICI; single-chip keeps the
        # dataset-resident gather step.
        n_dev = (
            int(np.prod(cfg.mesh_shape)) if cfg.mesh_shape
            else len(jax.devices())
        )
        self.mesh = None
        # BatchNorm models shard too: under GSPMD the BN batch-mean over the
        # sharded axis is computed globally (cross-replica BN by sharding
        # annotation, no hand-psum — see parallel/sharded.py).
        if n_dev > 1 and cfg.batch_size % n_dev == 0:
            from ..parallel.mesh import make_mesh
            from ..parallel.sharded import make_sharded_train_step
            from ..parallel.tensor import shard_state_tp

            self.mesh = make_mesh(cfg.mesh_shape or (n_dev,))
            # 1-D mesh -> replicated params (pure DP); 2-D (data, model)
            # mesh -> kernels column-sharded over ``model`` (TP by
            # annotation, parallel/tensor.py)
            self.state = shard_state_tp(self.mesh, self.state, cfg)
            self._sharded_step = make_sharded_train_step(
                self.model, cfg, self.mesh
            )
        else:
            self.train_step = make_train_step(self.model, cfg)
        self.eval_step = make_eval_step(self.model, cfg)
        self._finish_init()

    def _finish_init(self) -> None:
        """Model-independent init tail: scheduler, checkpointing, resume."""
        cfg = self.cfg
        self.scheduler = PlateauScheduler(cfg)
        # 'epochs pointwise loss' (reference config key, parsed but never
        # wired there — tensorflow/train_config.json:11): warm up on heatmap
        # MSE, then fine-tune under the decoded-coordinate pointwise loss
        # from this epoch on (one extra jit compile at the switch).
        self._pointwise_switch_epoch = (
            cfg.epochs_pointwise_loss
            if cfg.epochs_pointwise_loss > 0
            and cfg.loss_function not in ("pointwise", "point_wise_loss")
            else None
        )

        # per-epoch checkpoint writer: background thread by default (the
        # full-state device->host fetch overlaps the next epoch's work);
        # _CkptSync preserves the synchronous path under async_checkpoint=0
        self._ckpt_writer = (
            ckpt.AsyncCheckpointer() if cfg.async_checkpoint else _CkptSync()
        )

        self.start_epoch = 0
        self.best_loss = float("inf")
        self._best_written = float("inf")
        if cfg.resume_from:
            self.state, meta = ckpt.restore_checkpoint(cfg.resume_from, self.state)
            if cfg.pipeline_stages > 1 and self.mesh is not None:
                # restore yields host arrays — re-stage blocks over ``pipe``
                from ..parallel.pipeline import shard_state_pp

                self.state = shard_state_pp(self.mesh, self.state, cfg)
            elif self.mesh is not None:
                # re-pin the restored host arrays to the declared DP/TP
                # placement (replicated or column-sharded kernels) — the
                # sharded step passes state through with in_shardings=None,
                # so without this the resumed run trains on whatever layout
                # XLA picks instead of the annotated one
                from ..parallel.tensor import shard_state_tp

                self.state = shard_state_tp(self.mesh, self.state, cfg)
            self.start_epoch = int(meta.get("epoch", -1)) + 1
            self.best_loss = float(
                meta.get("best_loss", meta.get("val_loss", float("inf")))
            )
            # a best_model at best_loss is already on disk
            self._best_written = self.best_loss
            if meta.get("scheduler"):
                self.scheduler.load_state_dict(meta["scheduler"])
            print(f"Resumed from {cfg.resume_from} at epoch {self.start_epoch}",
                  flush=True)

    # ------------------------------------------------------------------
    def _build_pipelined_model(self, img_shape, num_out):
        """Build the GPipe-pipelined ViT and its (data, pipe) mesh.

        ``cfg.pipeline_stages`` stages over the transformer trunk, data
        parallelism over the remaining devices; the facade slots into the
        generic train/eval steps (parallel/pipeline.py PipelinedViTFlax).
        """
        cfg = self.cfg
        from ..models import vit_single_kwargs
        from ..parallel.pipeline import (
            PipelinedViT, PipelinedViTFlax, make_pipeline_mesh,
        )

        pp = int(cfg.pipeline_stages)
        # mesh_shape restricts the device count here exactly as in the
        # DP/TP branch; default = every visible device
        n_dev = (
            int(np.prod(cfg.mesh_shape)) if cfg.mesh_shape
            else len(jax.devices())
        )
        if n_dev > len(jax.devices()):
            raise ValueError(
                f"mesh_shape={cfg.mesh_shape} needs {n_dev} devices, have "
                f"{len(jax.devices())}"
            )
        if n_dev % pp:
            raise ValueError(
                f"pipeline_stages={pp} must divide the device count {n_dev}"
            )
        dp = n_dev // pp
        M = int(cfg.pipeline_microbatches) or pp
        if cfg.batch_size % (M * dp):
            raise ValueError(
                f"batch_size={cfg.batch_size} must divide into "
                f"pipeline_microbatches={M} x data-parallel={dp}"
            )
        if img_shape[0] != img_shape[1]:
            raise ValueError(f"pipelined ViT needs square inputs, got {img_shape}")
        kw = vit_single_kwargs(cfg, num_out)  # raises outside the ViT family
        mesh = make_pipeline_mesh(dp, pp)
        pipe = PipelinedViT(
            mesh, image_hw=img_shape[0], in_channels=img_shape[-1],
            num_microbatches=M, **kw,
        )
        print(
            f"pipeline parallelism: {pp} stages x {dp}-way DP, "
            f"{M} microbatches", flush=True,
        )
        return PipelinedViTFlax(pipe), mesh

    # ------------------------------------------------------------------
    def _maybe_load_pretrained(self) -> None:
        """Load frozen-coarse (C2F) or self-supervised encoder weights.

        Twin of the C2F coarse-model load (tensorflow/Network.py:172-176) and
        ``PretrainedLEAP`` re-heading (pytorch/NNs warehouse/NNs.py:38-62).
        """
        cfg = self.cfg
        params = self.state.params
        if cfg.coarse_model_path and "coarse" in params:
            from ..importers import is_reference_checkpoint

            if is_reference_checkpoint(cfg.coarse_model_path):
                # the reference's own flow: C2F loads a TRAINED KERAS
                # coarse save ("coarse per wing sigma 6 model.h5",
                # tensorflow/Network.py:172-176) — import it and take the
                # enc/dec trees (a coarse_per_wing save imports as
                # basic_cnn: same {encoder, decoder} structure as the
                # CoarsePerWing submodule)
                from ..importers import import_reference_checkpoint

                loaded = import_reference_checkpoint(
                    cfg.coarse_model_path
                ).params
            else:
                loaded = ckpt.load_params(cfg.coarse_model_path)
            params = dict(params)
            params["coarse"] = _graft_tree(
                params["coarse"], loaded, "coarse model"
            )
            self.state = self.state.replace(params=params)
        if cfg.pretrained_encoder_path:
            enc_key = "encoder" if "encoder" in params else None
            if enc_key:
                from ..importers import is_reference_checkpoint

                loaded_stats = {}
                if is_reference_checkpoint(cfg.pretrained_encoder_path):
                    # reference weights: self-supervision BasicNet saves
                    # (the PretrainedLEAP re-heading flow, NNs warehouse/
                    # NNs.py:38-62) or a torchvision resnet50 trunk
                    # (ImageNet init, NNs.py:20 pretrained=True) — convert
                    # on the fly and take the encoder subtree + BN stats
                    from ..importers import import_reference_checkpoint

                    imported = import_reference_checkpoint(
                        cfg.pretrained_encoder_path
                    )
                    loaded_all = imported.params
                    loaded_stats = imported.batch_stats or {}
                else:
                    # a `cli import` snapshot carries BN stats too — do
                    # not flatten it to params-only (the stats are half
                    # the point of importing an ImageNet trunk)
                    from ..importers import load_imported_snapshot

                    snap = load_imported_snapshot(
                        cfg.pretrained_encoder_path
                    )
                    if snap is not None:
                        loaded_all = snap.params
                        loaded_stats = snap.batch_stats or {}
                    else:
                        loaded_all = ckpt.load_params(
                            cfg.pretrained_encoder_path
                        )
                src = loaded_all.get("encoder", loaded_all)
                tgt = params[enc_key]
                stem = src.get("stem") if isinstance(src, dict) else None
                if (
                    stem is not None and "stem" in tgt
                    and stem["kernel"].shape[2]
                    != tgt["stem"]["kernel"].shape[2]
                ):
                    # ImageNet trunks have a 3-channel stem; this dataset's
                    # frames are 4+ channels — inflate by channel-mean
                    # replication (importers.adapt_stem_in_channels)
                    from ..importers import adapt_stem_in_channels

                    src = dict(src)
                    src["stem"] = {
                        **stem,
                        "kernel": adapt_stem_in_channels(
                            np.asarray(stem["kernel"]),
                            int(tgt["stem"]["kernel"].shape[2]),
                        ),
                    }
                params = dict(params)
                params[enc_key] = _graft_tree(
                    tgt, src, "pretrained encoder"
                )
                self.state = self.state.replace(params=params)
                enc_stats = (loaded_stats or {}).get("encoder")
                if enc_stats and isinstance(self.state.batch_stats, dict) \
                        and "encoder" in self.state.batch_stats:
                    bs = dict(self.state.batch_stats)
                    bs["encoder"] = _graft_tree(
                        bs["encoder"], enc_stats,
                        "pretrained encoder BN stats",
                    )
                    self.state = self.state.replace(batch_stats=bs)

    def _create_run_folders(self) -> str:
        """Auto-suffixed run dir + code snapshot
        (tensorflow/train.py:122-147)."""
        run_path = os.path.join(self.cfg.base_output_path, self.run_name)
        if not self.cfg.clean:
            initial, i = run_path, 1
            while os.path.exists(run_path):
                run_path = "%s_%02d" % (initial, i)
                i += 1
        if os.path.exists(run_path):
            shutil.rmtree(run_path)
        os.makedirs(run_path)
        for sub in (
            "weights", "viz_pred", "viz_confmaps", "histograms",
            "l2_histograms", "l2_histograms_per_point",
        ):
            os.makedirs(os.path.join(run_path, sub))
        code_dir = os.path.join(run_path, "training code")
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        shutil.copytree(
            pkg_root, os.path.join(code_dir, os.path.basename(pkg_root)),
            ignore=shutil.ignore_patterns("__pycache__"),
        )
        print("Created folder:", run_path, flush=True)
        return run_path

    def _save_configuration(self) -> None:
        with open(os.path.join(self.run_path, "configuration.json"), "w") as f:
            json.dump(self.cfg.raw or self.cfg.to_dict(), f, indent=4)

    # ------------------------------------------------------------------
    def train(self) -> dict[str, list[float]]:
        cfg = self.cfg
        t0 = time()
        train_losses: list[float] = []
        val_losses: list[float] = []
        l2_means: list[float] = []
        l2_stds: list[float] = []
        l2_max: list[float] = []
        epoch_secs: list[float] = []

        accum = max(1, cfg.accumulation_steps)
        updates_per_epoch = max(1, self.batches_per_epoch // accum)
        if self.start_epoch == 0:
            # initial weights snapshot (tensorflow/train.py:88
            # ``initial_model.h5``)
            ckpt.save_params(
                os.path.join(self.run_path, "initial_model.msgpack"),
                self.state.params,
            )
        profiler_ctx = None
        if cfg.profile:
            jax.profiler.start_trace(os.path.join(self.run_path, "profile"))
            profiler_ctx = True

        for epoch in range(self.start_epoch, cfg.epochs):
            print(f"Epoch {epoch + 1}/{cfg.epochs}", flush=True)
            if (self._pointwise_switch_epoch is not None
                    and epoch >= self._pointwise_switch_epoch):
                self._switch_to_pointwise_loss()
            t_epoch = time()
            self.dataset.shuffle_train_indices()
            # Losses stay on device until the epoch ends: a per-step
            # ``float(loss)`` would synchronise the host with every update
            # and stall dispatch (costly through remote-attached runtimes);
            # deferring the fetch keeps the step stream pipelined.
            step_losses = []
            for _ in range(updates_per_epoch):
                idx = self.dataset.step_indices(cfg.batch_size, accum)
                if self.mesh is not None:
                    self.state, loss = self._run_sharded_step(idx)
                else:
                    data, step_idx = self.dataset.step_payload(idx)
                    self.state, loss = self.train_step(
                        self.state, data, step_idx,
                        self.scheduler.lr_scale,
                    )
                step_losses.append(loss)
            # ONE stacked fetch: per-loss float() would pay one host<->device
            # round trip per update (~15 sequential round trips per epoch
            # through a remote-attached runtime)
            import jax.numpy as jnp

            train_loss = float(jnp.stack(step_losses).mean())
            train_losses.append(train_loss)
            print(f"Train Loss: {train_loss:.7f}", flush=True)

            # -- validation (pytorch/train_pytorch.py:150-194) -------------
            val_loss, l2_all, l2_per_point = self.evaluate()
            val_losses.append(val_loss)
            print(f"Val Loss: {val_loss:.7f}", flush=True)
            self.scheduler.step(val_loss)

            l2_means.append(float(np.mean(l2_all)))
            l2_stds.append(float(np.std(l2_all)))
            l2_max.append(float(np.max(l2_all)))
            epoch_secs.append(time() - t_epoch)

            if val_loss < self.best_loss:
                # best-model write gated on a minimum relative improvement
                # (best_min_rel_delta; 0 = reference parity, every
                # improvement) — the in-memory marker still tracks every one
                write_best = val_loss < self._best_written * (
                    1.0 - cfg.best_min_rel_delta
                )
                self.best_loss = val_loss
                if write_best:
                    self._best_written = val_loss
                    self._ckpt_writer.save_checkpoint(
                        self.run_path, self.state, epoch, val_loss, best=True
                    )
            if cfg.save_every_epoch:
                self._ckpt_writer.save_params(
                    os.path.join(
                        self.run_path, "weights",
                        f"weights.{epoch + 1:03d}-{val_loss:.9f}.msgpack",
                    ),
                    self.state.params,
                )
            if (epoch + 1) % max(1, cfg.checkpoint_every) == 0:
                self._ckpt_writer.save_checkpoint(
                    self.run_path, self.state, epoch, val_loss,
                    scheduler_state=self.scheduler.state_dict(),
                    best_loss=self.best_loss,
                )

            self._save_epoch_artifacts(
                epoch, train_losses, val_losses, l2_means, l2_stds, l2_max,
                l2_all, l2_per_point, epoch_secs,
            )

        if profiler_ctx:
            jax.profiler.stop_trace()
        # land any in-flight background checkpoint write (and surface its
        # errors) before the final snapshot and before returning files to
        # the caller
        self._ckpt_writer.wait()
        # final weights (tensorflow/train.py:102-104
        # ``final_confmaps_model.h5``; history rides in history.csv/.mat)
        ckpt.save_params(
            os.path.join(self.run_path, "final_confmaps_model.msgpack"),
            self.state.params,
        )
        print(
            "Total runtime first loss: %.1f mins" % ((time() - t0) / 60),
            flush=True,
        )
        return {
            "train_loss": train_losses,
            "val_loss": val_losses,
            "l2": l2_means,
        }

    def _switch_to_pointwise_loss(self) -> None:
        """Swap the train step's loss to the pointwise objective
        ('epochs pointwise loss' semantics — see __init__)."""
        pw_cfg = self.cfg.replace(loss_function="pointwise")
        if self.mesh is not None:
            from ..parallel.sharded import make_sharded_train_step

            self._sharded_step = make_sharded_train_step(
                self.model, pw_cfg, self.mesh
            )
        else:
            self.train_step = make_train_step(self.model, pw_cfg)
        self._pointwise_switch_epoch = None
        print("Switched training loss to pointwise (decoded coordinates)",
              flush=True)

    def _run_sharded_step(self, idx: np.ndarray):
        """Gather (accum, B, ...) microbatches and run the mesh step."""
        import jax.numpy as jnp

        from ..parallel.sharded import shard_microbatches

        batch = self.dataset.microbatch_arrays(idx)
        batch = shard_microbatches(self.mesh, batch)
        return self._sharded_step(
            self.state, batch, jnp.asarray(self.scheduler.lr_scale)
        )

    # ------------------------------------------------------------------
    def evaluate(self) -> tuple[float, np.ndarray, np.ndarray]:
        """Full-val MSE + decoded-peak pixel L2 (mean over batches)."""
        cfg = self.cfg
        counts: list[int] = []
        mses = []
        l2s = []
        # dispatch every batch first, fetch once at the end: a float()/
        # asarray() per batch costs one host<->device round trip each
        for batch, n_valid in self.dataset.val_payloads(cfg.batch_size):
            mse, l2 = self.eval_step(self.state, batch)
            counts.append(n_valid)
            mses.append(mse)
            l2s.append(l2)
        mses, l2s = jax.device_get((mses, l2s))
        total = sum(float(m) * n for m, n in zip(mses, counts))
        count = sum(counts)
        l2_per_sample = np.concatenate(
            [np.asarray(l)[:n] for l, n in zip(l2s, counts)], axis=0
        )  # (N, P)
        l2_per_point = l2_per_sample.T  # (P, N)
        return total / max(count, 1), l2_per_sample.flatten(), l2_per_point

    def _save_epoch_artifacts(
        self, epoch, train_losses, val_losses, l2_means, l2_stds, l2_max,
        l2_all, l2_per_point, epoch_secs=(),
    ) -> None:
        rp = self.run_path
        # losses.csv (pytorch/train_pytorch.py:262-283) + per-epoch timing
        # (SURVEY §5 tracing row: per-step timing in the metrics writer)
        with open(os.path.join(rp, "losses.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(
                ["Epoch", "Train Loss", "Val Loss", "L2 Loss", "L2 Std",
                 "L2 Max Outlier", "Epoch Seconds"]
            )
            for i in range(len(train_losses)):
                secs = epoch_secs[i] if i < len(epoch_secs) else float("nan")
                w.writerow(
                    [self.start_epoch + i + 1, f"{train_losses[i]:.4g}",
                     f"{val_losses[i]:.4g}",
                     f"{l2_means[i]:.4g}", f"{l2_stds[i]:.4g}",
                     f"{l2_max[i]:.4g}", f"{secs:.2f}"]
                )
        # history.csv (tensorflow/CallBacks.py:17-33)
        with open(os.path.join(rp, "history.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["epoch", "loss", "val_loss"])
            for i in range(len(train_losses)):
                w.writerow(
                    [self.start_epoch + i, train_losses[i], val_losses[i]]
                )
        try:
            from scipy.io import savemat

            savemat(
                os.path.join(rp, "history.mat"),
                {"loss": train_losses, "val_loss": val_losses,
                 "val_l2_loss": l2_means},
            )
        except Exception:
            pass
        # heavy matplotlib artifacts every viz_every epochs (always on the
        # final epoch; <= 0 = final epoch only — each PNG pass costs
        # seconds, which dominates short-epoch regimes); the CSV/MAT
        # metrics above are written every epoch
        every = int(self.cfg.viz_every)
        is_final = (epoch + 1) == self.cfg.epochs
        if every <= 0:
            if not is_final:
                return
        elif (epoch + 1) % every and not is_final:
            return
        viz.plot_history(
            train_losses, val_losses, os.path.join(rp, "loss_graph.png"),
            start_epoch=min(4, max(len(train_losses) - 1, 0)),
        )
        viz.plot_history(
            train_losses, val_losses, os.path.join(rp, "history.png")
        )
        viz.l2_histogram(
            l2_all, epoch,
            os.path.join(rp, "l2_histograms", f"validation_epoch_{epoch + 1}.png"),
        )
        viz.l2_histogram_per_point(
            l2_per_point, epoch,
            os.path.join(
                rp, "l2_histograms_per_point", f"validation_epoch_{epoch + 1}.png"
            ),
        )
        self._save_validation_image(epoch)

    def _save_validation_image(self, epoch: int) -> None:
        """Prediction overlay for the first val sample
        (pytorch/train_pytorch.py:222-251)."""
        if len(self.dataset.val_inds) == 0:
            return
        ids = np.asarray(self.dataset.val_inds[:1], np.int32)
        batch = self.dataset.gather(ids)
        from .loop import _model_args

        if not hasattr(self, "_viz_forward"):
            # jitted: an eager model.apply dispatches hundreds of ops —
            # per-epoch seconds through a remote-attached runtime
            # (measured ~30-50 s/epoch for the ResNet family)
            import jax as _jax

            def _fwd(params, batch_stats, args):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                return self.model.apply(variables, *args, train=False)

            self._viz_forward = _jax.jit(_fwd)
        pred = self._viz_forward(
            self.state.params, self.state.batch_stats, _model_args(batch)
        )
        pts = np.asarray(peaks_ops.find_peaks(np.asarray(pred)))[0]
        gt = np.asarray(
            peaks_ops.find_peaks(np.asarray(batch["confmaps"]))
        )[0]
        image = np.asarray(batch["image"][0])
        viz.show_pred(
            image, pts, gt,
            save_path=os.path.join(
                self.run_path, "viz_pred", f"validation_epoch_{epoch + 1}.png"
            ),
        )
        viz.show_confmap_grid(
            np.asarray(pred)[0],
            save_path=os.path.join(
                self.run_path, "viz_confmaps", f"confmaps_{epoch + 1:03d}.png"
            ),
        )


def main(argv: list[str] | None = None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    trainer = Trainer(argv[0])
    trainer.train()


if __name__ == "__main__":
    main()
