"""Mesh-sharded training step (data parallelism over ICI).

The reference is strictly single-device (SURVEY §2.4: one GPU, no
DDP/MirroredStrategy anywhere). The TPU rebuild makes multi-chip data
parallelism the structural default: parameters/optimiser state are
replicated over a ``jax.sharding.Mesh``, per-step batches are sharded on the
batch axis, and the gradient all-reduce is inserted by XLA from the sharding
annotations alone — no hand-written collectives, riding ICI.

The step fuses (augment -> bf16 forward -> backward -> microbatch
accumulation via ``lax.scan`` -> Adam update) into one jitted program, the
multi-chip twin of :func:`..train.loop.make_train_step`.

Scaling note: at this model scale (~10^7 params) DP is the only strategy the
workload needs (SURVEY §2.4 — TP "not needed", PP/SP/EP "n/a"); the mesh
carries an optional ``model`` axis so TP becomes a sharding annotation, not a
rewrite, if model sizes ever grow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..ops import affine
from ..train.loop import TrainState, create_optimizer, make_loss_fn
from .mesh import DATA_AXIS


def shard_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Replicate a TrainState's pytree over every device of the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)


def shard_microbatches(mesh: Mesh, batch: dict) -> dict:
    """Place an (accum, B, ...) batch dict with B sharded over ``data``."""
    def put(x):
        spec = P(None, DATA_AXIS) if x.ndim >= 2 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in batch.items()}


def make_sharded_train_step(model, cfg: Config, mesh: Mesh):
    """Build the multi-chip jitted train step.

    Signature: ``step(state, batch, lr_scale) -> (state, loss)`` where
    ``batch`` holds (accum_steps, B, ...) arrays with B sharded over the
    mesh's ``data`` axis ("image", "confmaps", optionally "P"/"P_inv") —
    one optimiser update over ``accum_steps`` microbatches
    (parity: pytorch/train_pytorch.py:135-142).
    """
    tx = create_optimizer(cfg)
    loss_fn = make_loss_fn(cfg)
    order = min(int(cfg.interpolation_order), 3)
    # same input-precision policy as the single-device step (train/loop.py):
    # bf16 warp when computing in bf16, full f32 otherwise
    warp_dtype = (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    )
    repl = NamedSharding(mesh, P())
    bsharded = NamedSharding(mesh, P(None, DATA_AXIS))

    def _args(mb: dict) -> tuple:
        if "P" in mb:
            return (mb["image"], mb["P"], mb["P_inv"])
        return (mb["image"],)

    from ..models import augmentation_views

    views = augmentation_views(cfg.model_type)

    def microbatch_loss(params, batch_stats, key, mb):
        box, confmaps = mb["image"], mb.get("confmaps")
        view_mats = None
        if cfg.do_augmentations and "peaks" in mb:
            # multicam models: independent transform per camera view
            # (pytorch/Datagenerators.py:141-153)
            key, akey = jax.random.split(key)
            box, confmaps, view_mats = affine.augment_views_and_peaks(
                akey, box.astype(warp_dtype), mb["peaks"], mb["peak_vals"],
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
        elif cfg.do_augmentations and "P" not in mb:
            # camera-matrix models never warp-augment without per-view
            # matrices to fold into P (see train/loop.py twin)
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
        mb = dict(mb, image=box, confmaps=confmaps)
        if view_mats is not None and "P" in mb:
            from ..ops import geometry

            mb["P"], mb["P_inv"] = geometry.compose_affine_into_cameras(
                view_mats, mb["P"], mb["P_inv"],
                crop_size=box.shape[-3],
            )
        if batch_stats:
            # Cross-replica BatchNorm comes for free under GSPMD: the batch
            # axis is sharded over ``data``, so the BN mean/var reductions
            # over axis 0 are *global* — XLA inserts the cross-chip
            # all-reduce from the sharding annotations (no hand-psum'd BN).
            pred, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                *_args(mb), train=True, rngs={"dropout": key},
                mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            pred = model.apply(
                {"params": params}, *_args(mb), train=True,
                rngs={"dropout": key},
            )
            new_stats = batch_stats
        return loss_fn(pred, confmaps), new_stats

    def step(state: TrainState, batch: dict, lr_scale):
        rng, key = jax.random.split(jax.random.fold_in(state.rng, state.step))
        accum = batch["image"].shape[0]
        micro_keys = jax.random.split(key, accum)

        def scan_body(carry, xs):
            grads_acc, loss_acc, stats = carry
            key_i, mb = xs
            (loss, stats), grads = jax.value_and_grad(
                microbatch_loss, has_aux=True
            )(state.params, stats, key_i, mb)
            return (
                jax.tree_util.tree_map(jnp.add, grads_acc, grads),
                loss_acc + loss,
                stats,
            ), None

        zero = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), state.params
        )
        (grads, loss_sum, new_stats), _ = jax.lax.scan(
            scan_body, (zero, jnp.zeros(()), state.batch_stats),
            (micro_keys, batch),
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            batch_stats=new_stats, rng=rng,
        )
        return new_state, loss_sum / accum

    batch_shardings = {
        "image": bsharded, "confmaps": bsharded, "P": bsharded,
        "P_inv": bsharded, "peaks": bsharded, "peak_vals": bsharded,
    }

    # jit lazily per batch-key set (with vs without camera matrices); the
    # state keeps its replicated placement from shard_state, the batch is
    # pinned batch-sharded, and XLA derives the gradient psum over ICI.
    cache: dict[frozenset, object] = {}

    def stepper(state, batch, lr_scale):
        keys = frozenset(batch.keys())
        if keys not in cache:
            cache[keys] = jax.jit(
                step,
                in_shardings=(
                    None,  # state: replicated placement from shard_state
                    {k: batch_shardings[k] for k in sorted(keys)},
                    repl,
                ),
            )
        return cache[keys](state, batch, lr_scale)

    return stepper
