"""Self-supervised inpainting pretraining, fully on device.

TPU-native redesign of the reference's masking-inpainting pretext task
(reference: pytorch/self supervision/train_self_supervision.py):

* per sample, one of the two wing-mask channels is selected so the input is
  (H, W, 4) = 3 time channels + 1 wing mask (:43-44)
* random hole punching — 3 square holes at random wing-mask pixels, sized
  ``sqrt(nnz(mask)) // 2``, plus 5 fixed-size-16 holes at random fly-body
  pixels (``create_holes``, :70-95)
* the SAME random affine augmentation is applied to the holed input and the
  clean target (:46-63)
* objective: MSE reconstruction of the clean (augmented) image (:132-224)

Everything that was per-sample NumPy on the CPU dataloader runs here inside
the jitted train step: hole-center sampling is Gumbel-top-k over mask logits
(without-replacement choice, twin of ``np.random.choice(replace=False)``),
hole application is an elementwise box mask (static shapes, traced sizes),
and the paired augmentation reuses :func:`..ops.affine.augment_pair`.

Downstream, the pretrained encoder re-heads a supervised model via the
trainer's ``pretrained_encoder_path`` (reference ``PretrainedLEAP``,
pytorch/NNs warehouse/NNs.py:38-62).
"""

from __future__ import annotations

import json
import os
import sys
from datetime import date
from time import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.cnn import BasicNet
from ..ops import affine
from . import checkpoint as ckpt
from .loop import TrainState, PlateauScheduler


NUM_WING_HOLES = 3  # train_self_supervision.py:81
NUM_BODY_HOLES = 5  # train_self_supervision.py:82
BODY_HOLE_SIZE = 16  # train_self_supervision.py:71


def _sample_coords_topk(key, weights, k):
    """k row/col coords drawn w/o replacement, weighted by a (H, W) mask."""
    h, w = weights.shape
    logits = jnp.where(weights > 0, 0.0, -jnp.inf).reshape(-1)
    gumbel = jax.random.gumbel(key, (h * w,))
    _, idx = jax.lax.top_k(logits + gumbel, k)
    return idx // w, idx % w  # (k,), (k,)


def _box_hole_mask(h, w, cy, cx, size):
    """(H, W) bool mask of a size x size square whose top-left is
    clipped at 0 (reference: ``max(0, x - hole // 2)``, :84-90)."""
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    y0 = jnp.maximum(0, cy - size // 2)
    x0 = jnp.maximum(0, cx - size // 2)
    return (
        (rows >= y0) & (rows < y0 + size) & (cols >= x0) & (cols < x0 + size)
    )


def create_holes(key: jax.Array, images: jax.Array) -> jax.Array:
    """Punch wing + body holes into (B, H, W, 4) images, on device.

    Channel layout: [t0, t1, t2, wing_mask]. Wing hole size is
    ``sqrt(nnz(mask)) // 2`` per sample; body pixels are where the summed
    time channels exceed 0 (reference: train_self_supervision.py:70-95).
    """
    b, h, w, _ = images.shape

    def one(key, img):
        mask = img[..., -1]
        body = jnp.sum(img[..., :3], axis=-1) > 0
        k_wing, k_body = jax.random.split(key)
        wing_size = (
            jnp.sqrt(jnp.count_nonzero(mask > 0).astype(jnp.float32))
            .astype(jnp.int32) // 2
        )
        wy, wx = _sample_coords_topk(k_wing, mask, NUM_WING_HOLES)
        by, bx = _sample_coords_topk(
            k_body, body.astype(jnp.float32), NUM_BODY_HOLES
        )
        hole = jnp.zeros((h, w), bool)
        for i in range(NUM_WING_HOLES):
            hole |= _box_hole_mask(h, w, wy[i], wx[i], wing_size)
        for i in range(NUM_BODY_HOLES):
            hole |= _box_hole_mask(h, w, by[i], bx[i], BODY_HOLE_SIZE)
        return img * (~hole)[..., None]

    return jax.vmap(one)(jax.random.split(key, b), images)


def select_wing_channel(key: jax.Array, box: jax.Array) -> jax.Array:
    """(B, H, W, 5) -> (B, H, W, 4): random wing-mask channel per sample
    (reference: train_self_supervision.py:42-44)."""
    b = box.shape[0]
    which = jax.random.bernoulli(key, 0.5, (b,))
    mask = jnp.where(which[:, None, None], box[..., 4], box[..., 3])
    return jnp.concatenate([box[..., :3], mask[..., None]], axis=-1)


class SelfSupTrainer:
    """Inpainting pretrainer over per-frame crops.

    Data: (N, H, W, 5) float32 crops ([t0, t1, t2, mask_L, mask_R]) —
    from the supervised pipeline's box arrays or a crops directory of .npy
    files (the reference's layout, train_self_supervision.py:24-34).
    """

    def __init__(self, cfg: Config, crops: np.ndarray):
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        n = crops.shape[0]
        order = self.rng.permutation(n)
        n_val = max(1, round(n * min(cfg.val_fraction, 0.5)))
        self.val_inds = order[:n_val]
        self.train_inds = order[n_val:]
        self.data = jnp.asarray(crops, jnp.float32)

        self.run_name = f"self_supervision_{date.today().strftime('%b %d')}"
        self.run_path = self._create_run_folders()

        self.model = BasicNet(
            out_channels=4,
            filters=cfg.num_base_filters,
            kernel_size=cfg.kernel_size,
            dilation=cfg.dilation_rate,
            dropout=cfg.dropout_ratio,
            num_blocks=cfg.num_blocks,
            flavor=cfg.arch_flavor,
            dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
        )
        # one source of optimizer defaults for every training path
        from .loop import create_optimizer

        self.tx = create_optimizer(cfg)
        rng = jax.random.key(cfg.seed)
        sample = jnp.zeros((1, *crops.shape[1:3], 4), jnp.float32)
        params = self.model.init(
            {"params": rng, "dropout": rng}, sample, train=False
        )["params"]
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            batch_stats={},
            rng=rng,
        )
        self.scheduler = PlateauScheduler(cfg)
        self.best_loss = float("inf")
        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self) -> None:
        cfg = self.cfg
        model, tx = self.model, self.tx
        order = min(int(cfg.interpolation_order), 3)

        def prepare(key, box):
            """box (B, H, W, 5) -> (holed, clean), identically augmented."""
            k_sel, k_hole, k_aug = jax.random.split(key, 3)
            clean = select_wing_channel(k_sel, box)
            holed = create_holes(k_hole, clean)
            if cfg.do_augmentations:
                holed, clean = affine.augment_pair(
                    k_aug, holed, clean,
                    rotation_range=cfg.rotation_range,
                    xy_shifts=cfg.xy_shifts,
                    zoom_range=cfg.zoom_range,
                    do_horizontal_flip=cfg.horizontal_flip,
                    do_vertical_flip=cfg.vertical_flip,
                    order=order,
                )
            return holed, clean

        @jax.jit
        def train_step(state: TrainState, data, ids, lr_scale):
            rng, key = jax.random.split(
                jax.random.fold_in(state.rng, state.step)
            )
            box = jnp.take(data, ids, axis=0)
            holed, clean = prepare(key, box)

            def loss_fn(p):
                recon = model.apply(
                    {"params": p}, holed, train=True, rngs={"dropout": key}
                )
                return jnp.mean(
                    jnp.square(recon.astype(jnp.float32) - clean)
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(state.params, updates)
            return state.replace(
                step=state.step + 1, params=params, opt_state=opt_state,
                rng=rng,
            ), loss

        cfg_seed = int(self.cfg.seed)

        @jax.jit
        def eval_step(state: TrainState, data, ids):
            # key derived from the config seed alone (NOT state.rng, which
            # evolves every step) -> validation holes/augmentations are
            # identical across epochs and resumes, so val_loss movement is
            # model quality, not hole-difficulty noise
            key = jax.random.fold_in(jax.random.key(cfg_seed), 0x7FFFFFFF)
            box = jnp.take(data, ids, axis=0)
            holed, clean = prepare(key, box)
            recon = model.apply({"params": state.params}, holed, train=False)
            return (
                jnp.mean(jnp.square(recon.astype(jnp.float32) - clean)),
                holed, clean, recon.astype(jnp.float32),
            )

        self.train_step = train_step
        self.eval_step = eval_step

    def _create_run_folders(self) -> str:
        run_path = os.path.join(self.cfg.base_output_path, self.run_name)
        initial, i = run_path, 1
        while os.path.exists(run_path):
            run_path = "%s_%02d" % (initial, i)
            i += 1
        os.makedirs(os.path.join(run_path, "reconstructions"))
        with open(os.path.join(run_path, "configuration.json"), "w") as f:
            json.dump(self.cfg.raw or self.cfg.to_dict(), f, indent=4)
        return run_path

    # ------------------------------------------------------------------
    def train(self) -> dict[str, list[float]]:
        cfg = self.cfg
        t0 = time()
        bs = cfg.batch_size
        history: dict[str, list[float]] = {"train_loss": [], "val_loss": []}
        steps = max(1, (1 if cfg.debug_mode else cfg.batches_per_epoch))

        for epoch in range(cfg.epochs):
            self.rng.shuffle(self.train_inds)
            running = 0.0
            for s in range(steps):
                # wrap-around index ring (simple_data_generator.py:31-70):
                # an out-of-range slice must cycle the shuffled train set,
                # never degenerate to sample 0 (np.resize of an empty slice
                # yields zeros)
                ids = self.train_inds[
                    (s * bs + np.arange(bs)) % len(self.train_inds)
                ].astype(np.int32)
                self.state, loss = self.train_step(
                    self.state, self.data, jnp.asarray(ids),
                    self.scheduler.lr_scale,
                )
                running += float(loss)
            train_loss = running / steps

            val_ids = np.resize(self.val_inds, bs).astype(np.int32)
            val_loss, holed, clean, recon = self.eval_step(
                self.state, self.data, jnp.asarray(val_ids)
            )
            val_loss = float(val_loss)
            self.scheduler.step(val_loss)
            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            print(
                f"Epoch {epoch + 1}/{cfg.epochs} train {train_loss:.6f} "
                f"val {val_loss:.6f}", flush=True,
            )

            if val_loss < self.best_loss:
                self.best_loss = val_loss
                ckpt.save_checkpoint(
                    self.run_path, self.state, epoch, val_loss, best=True
                )
            ckpt.save_checkpoint(self.run_path, self.state, epoch, val_loss)
            self._save_reconstruction(epoch, holed, clean, recon)
        print(
            "Pretraining runtime: %.1f mins" % ((time() - t0) / 60), flush=True
        )
        return history

    def _save_reconstruction(self, epoch, holed, clean, recon) -> None:
        """Before/after panel (reference saves PNG+NPY per epoch, :226-247)."""
        try:
            import matplotlib

            matplotlib.use("agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(1, 3, figsize=(12, 4))
            for ax, img, title in zip(
                axes,
                (np.asarray(holed)[0], np.asarray(recon)[0],
                 np.asarray(clean)[0]),
                ("input (holes)", "reconstruction", "target"),
            ):
                ax.imshow(img[..., 1], cmap="gray")
                ax.set_title(title)
                ax.axis("off")
            fig.savefig(
                os.path.join(
                    self.run_path, "reconstructions", f"epoch_{epoch + 1}.png"
                ),
                dpi=80,
            )
            plt.close(fig)
        except Exception:
            pass


def main(argv: list[str] | None = None) -> None:
    """CLI: pretrain from an H5 dataset's box array or a .npy crops dir."""
    argv = argv if argv is not None else sys.argv[1:]
    cfg = Config.from_json(argv[0])
    src = argv[1] if len(argv) > 1 else cfg.data_path
    if os.path.isdir(src):
        files = sorted(os.listdir(src))
        crops = np.stack([np.load(os.path.join(src, f)) for f in files])
    else:
        import h5py

        with h5py.File(src, "r") as f:
            box = f["box"][:]
        if box.ndim == 5:  # (F, cams, H, W, C) -> flatten cameras
            box = box.reshape(-1, *box.shape[2:])
        # same /255 normalisation as the supervised Preprocessor — a
        # pretrained encoder must see the input scale fine-tuning will feed
        from ..data.preprocess import normalize

        crops = normalize(box)
    SelfSupTrainer(cfg, crops).train()


if __name__ == "__main__":
    main()
