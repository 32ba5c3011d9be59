"""Jitted training/eval steps: bf16 compute, on-device augmentation,
gradient accumulation via ``lax.scan``, DP sharding via mesh annotations.

Replaces the reference's Python epoch loops (reference:
pytorch/train_pytorch.py:98-197 — CPU augmentation per sample, CUDA AMP with
loss scaling, ``optimizer.step`` every ``accumulation_steps`` batches;
tensorflow/train.py:87-106 — keras ``model.fit``). On TPU:

* the whole (gather batch -> augment -> forward -> backward -> accumulate ->
  Adam update) chain is ONE jitted program; the dataset lives in HBM and no
  host transfer happens inside an epoch
* bf16 compute / f32 params replaces AMP: no GradScaler, TPU bf16 needs no
  loss scaling (SURVEY §2.4 mixed-precision row)
* gradient accumulation is a ``lax.scan`` over microbatches inside the step
  (parity with ``accumulation_steps``, pytorch/train_pytorch.py:135-142)
* ReduceLROnPlateau is a host-side controller emitting an ``lr_scale``
  scalar threaded into the step (parity with
  pytorch/train_pytorch.py:112-114 / tensorflow/CallBacks.py:118-121)
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..ops import affine, peaks


class TrainState(struct.PyTreeNode):
    """Parameters + optimiser + RNG + step counter (a pytree)."""

    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any  # BatchNorm running stats ({} for most models)
    rng: jax.Array


def create_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with the reference's defaults (pytorch/train_pytorch.py:111)."""
    return optax.adam(learning_rate=cfg.learning_rate)


def create_train_state(
    model, cfg: Config, sample_batch: dict[str, jax.Array], seed: int = 0
) -> TrainState:
    """Initialise params/optimiser from one example batch."""
    rng = jax.random.key(seed)
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "dropout": init_rng},
        *_model_args(sample_batch),
        train=False,
    )
    params = variables["params"]
    if cfg.head_zero_init:
        params = zero_output_head(params)
    batch_stats = variables.get("batch_stats", {})
    tx = create_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        rng=state_rng,
    )


_HEAD_LAYER_NAMES = ("deconv4", "head_deconv")


def zero_output_head(params):
    """Zero the final heatmap layer's kernel+bias wherever it appears.

    Standard heatmap-regression practice: with a zeroed output head the
    model starts at exactly the all-zeros prediction (loss = background
    MSE) instead of decoder-noise outputs ~5x the target scale, so the
    early epochs do blob formation rather than output-scale shrinking —
    measurably faster escape under plateau LR schedules. Applied by name
    to every DecoderUp head in the tree (models/layers.py: 'deconv4' is
    the torch-flavour head, 'head_deconv' the tf-flavour one), so it
    covers shared-decoder multicam models too.
    """

    def rec(tree):
        out = {}
        for name, sub in tree.items():
            if name in _HEAD_LAYER_NAMES and isinstance(sub, dict):
                out[name] = jax.tree.map(jnp.zeros_like, sub)
            elif isinstance(sub, dict):
                out[name] = rec(sub)
            else:
                out[name] = sub
        return out

    return rec(params)


def _model_args(batch: dict[str, jax.Array]) -> tuple:
    """Positional model inputs from a batch dict (camera models take 3)."""
    if "P" in batch:
        return (batch["image"], batch["P"], batch["P_inv"])
    return (batch["image"],)


def make_loss_fn(cfg: Config) -> Callable:
    """MSE heatmap loss (pytorch/train_pytorch.py:110), optionally the
    decoded-coordinate pointwise loss (tensorflow/Network.py:536-547).

    The ``*_TO_POINTS`` / ``*_POINTS_LOSS`` model types imply the pointwise
    loss by name (tensorflow/constants.py); the reference never wires them
    to a loss — resolved here: they train the plain heatmap model under the
    decoded-coordinate objective.
    """
    from .. import constants as C

    use_pointwise = cfg.loss_function in (
        "pointwise", "point_wise_loss"
    ) or cfg.model_type in (
        C.MODEL_18_POINTS_PER_WING_VIT_TO_POINTS,
        C.HEAD_TAIL_PER_CAM_POINTS_LOSS,
    )

    def loss_fn(pred: jax.Array, target: jax.Array) -> jax.Array:
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if use_pointwise:
            return peaks.pointwise_loss(target, pred)
        return jnp.mean(jnp.square(pred - target))

    return loss_fn


def make_train_step(model, cfg: Config):
    """Build the jitted train step.

    Signature: ``step(state, data, idx, lr_scale) -> (state, loss)`` where
    ``data`` is the device-resident dataset dict (box (N,H,W,C),
    confmaps (N,H,W,K), optional P/P_inv (N,4,3,4)/(N,4,4,3)) and ``idx`` is
    (accum_steps, batch) int32 sample indices — one optimiser update over
    ``accum_steps`` microbatches.
    """
    tx = create_optimizer(cfg)
    loss_fn = make_loss_fn(cfg)
    order = min(int(cfg.interpolation_order), 3)
    # warp in the compute dtype: bf16 halves the separable warp's bandwidth
    # and the model computes in bf16 anyway (pixel error ~ uint8 quantum);
    # f32-configured runs keep full input precision (matches the sharded path)
    warp_dtype = (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    )

    from ..models import augmentation_views

    views = augmentation_views(cfg.model_type)

    def microbatch(params, batch_stats, key, data, ids):
        box = jnp.take(data["box"], ids, axis=0)
        view_mats = None
        if cfg.do_augmentations and "peaks" in data:
            # fast path: warp images only; re-render exact Gaussian targets
            # at the transformed peaks (ensure_sigma semantics — and ~5x
            # less gather work than warping every target channel). Multicam
            # models draw an INDEPENDENT transform per camera view
            # (pytorch/Datagenerators.py:141-153).
            key, akey = jax.random.split(key)
            box, confmaps, view_mats = affine.augment_views_and_peaks(
                akey, box.astype(warp_dtype),
                jnp.take(data["peaks"], ids, axis=0),
                jnp.take(data["peak_vals"], ids, axis=0),
                num_views=views,
                sigma=cfg.sigma,
                rotation_range=cfg.rotation_range,
                xy_shifts=cfg.xy_shifts,
                zoom_range=cfg.zoom_range,
                do_horizontal_flip=cfg.horizontal_flip,
                do_vertical_flip=cfg.vertical_flip,
                shear_range=cfg.shear_range,
                order=order,
            )
        elif "peaks" in data:
            # no augmentation, but targets are sigma-Gaussians by
            # construction (ensure_sigma, simple_data_generator.py:119-136):
            # re-rendering them from the stored peak coordinates is ~50x
            # cheaper than gathering the (B, H, W, K) maps from HBM (TPU
            # gather cost is per narrow row)
            from ..ops.gaussian import confmaps_from_peaks

            h, w = box.shape[1:3]
            confmaps = confmaps_from_peaks(
                jnp.take(data["peaks"], ids, axis=0), (h, w), cfg.sigma
            ) * jnp.take(data["peak_vals"], ids, axis=0)[:, None, None, :]
        else:
            confmaps = jnp.take(data["confmaps"], ids, axis=0)
            # camera-matrix models never warp-augment on this path: without
            # per-view matrices to fold into P the FTL projection would no
            # longer match the warped pixels (reference behaviour:
            # CameraMatrixGenerator does not augment,
            # pytorch/Datagenerators.py:242-270)
            if cfg.do_augmentations and "P" not in data:
                key, akey = jax.random.split(key)
                box, confmaps = affine.augment_pair(
                    akey, box, confmaps,
                    rotation_range=cfg.rotation_range,
                    xy_shifts=cfg.xy_shifts,
                    zoom_range=cfg.zoom_range,
                    do_horizontal_flip=cfg.horizontal_flip,
                    do_vertical_flip=cfg.vertical_flip,
                    shear_range=cfg.shear_range,
                    order=order,
                    num_views=views,
                )
        if cfg.do_augmentations and cfg.wings_masks_dilation > 0:
            # random wing-mask re-dilation augmentation
            # (tensorflow/simple_data_generator.py:84-87, 99-117);
            # mask channels follow the CHANNEL layout (4 per multicam
            # view), not the augmentation-transform count
            from ..models import layout_masks_per_view, layout_views
            from ..ops.morphology import random_mask_redilation

            key, dkey = jax.random.split(key)
            box = random_mask_redilation(
                dkey, box, cfg.wings_masks_dilation,
                num_views=layout_views(cfg.model_type),
                num_time_channels=1 if cfg.single_time_channel else 3,
                masks_per_view=layout_masks_per_view(cfg.model_type),
            )
        batch = {"image": box, "confmaps": confmaps}
        for k in ("P", "P_inv"):
            if k in data:
                batch[k] = jnp.take(data[k], ids, axis=0)
        if view_mats is not None and "P" in batch:
            # fold each view's image warp into its camera so the FTL
            # geometry stays consistent with the warped pixels
            from ..ops import geometry

            batch["P"], batch["P_inv"] = geometry.compose_affine_into_cameras(
                view_mats, batch["P"], batch["P_inv"],
                crop_size=box.shape[-3],
            )

        def compute_loss(p):
            if batch_stats:
                pred, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    *_model_args(batch),
                    train=True,
                    rngs={"dropout": key},
                    mutable=["batch_stats"],
                )
                new_stats = mutated["batch_stats"]
            else:
                pred = model.apply(
                    {"params": p},
                    *_model_args(batch),
                    train=True,
                    rngs={"dropout": key},
                )
                new_stats = batch_stats
            return loss_fn(pred, batch["confmaps"]), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(params)
        return loss, grads, new_stats

    @jax.jit
    def train_step(state: TrainState, data, idx, lr_scale):
        rng, key = jax.random.split(jax.random.fold_in(state.rng, state.step))
        accum = idx.shape[0]
        micro_keys = jax.random.split(key, accum)

        def scan_body(carry, xs):
            ids_i, key_i = xs
            grads_acc, loss_acc, stats = carry
            loss, grads, stats = microbatch(
                state.params, stats, key_i, data, ids_i
            )
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, stats), loss

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), state.params
        )
        (grads, loss_sum, new_stats), _ = jax.lax.scan(
            scan_body,
            (zero_grads, jnp.zeros(()), state.batch_stats),
            (idx, micro_keys),
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=new_stats,
            rng=rng,
        )
        return new_state, loss_sum / accum

    return train_step


def make_eval_step(model, cfg: Config):
    """Jitted eval: val MSE + per-point pixel L2 on decoded peaks.

    Parity with the reference validation loop
    (pytorch/train_pytorch.py:150-213) but fully on device.
    Returns ``(mse, l2)`` with l2 (B, P).
    """
    loss_fn = make_loss_fn(cfg)

    @jax.jit
    def eval_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        pred = model.apply(variables, *_model_args(batch), train=False)
        mse = loss_fn(pred, batch["confmaps"])
        l2 = peaks.l2_distances(
            pred.astype(jnp.float32), batch["confmaps"].astype(jnp.float32),
            decode=cfg.eval_decode,
        )
        return mse, l2

    return eval_step


def make_predict_fn(model, batch_stats=None):
    """Jitted inference: params, images -> heatmaps (donated input)."""

    @partial(jax.jit, donate_argnums=(1,))
    def predict(params, images):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, images, train=False)

    return predict


class PlateauScheduler:
    """Host-side ReduceLROnPlateau, torch semantics.

    Parity with pytorch/train_pytorch.py:112-114 (mode='min', factor,
    patience, rel threshold, cooldown, min_lr); emits the ``lr_scale``
    multiplier consumed by the train step.
    """

    def __init__(self, cfg: Config):
        self.factor = cfg.reduce_lr_factor
        self.patience = cfg.reduce_lr_patience
        self.threshold = cfg.reduce_lr_min_delta
        self.cooldown = cfg.reduce_lr_cooldown
        self.min_lr = cfg.reduce_lr_min_lr
        self.base_lr = cfg.learning_rate
        self.best = float("inf")
        self.num_bad = 0
        self.cooldown_counter = 0
        self.lr = self.base_lr

    @property
    def lr_scale(self) -> float:
        return self.lr / self.base_lr

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.cooldown_counter = self.cooldown
                self.num_bad = 0
        return self.lr_scale

    def state_dict(self) -> dict:
        return {
            "best": self.best, "num_bad": self.num_bad,
            "cooldown_counter": self.cooldown_counter, "lr": self.lr,
        }

    def load_state_dict(self, d: dict) -> None:
        self.best = d["best"]
        self.num_bad = d["num_bad"]
        self.cooldown_counter = d["cooldown_counter"]
        self.lr = d["lr"]
