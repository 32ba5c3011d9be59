"""Multi-chip data-parallel training step on the virtual 8-device mesh.

Validates the sharding design of SURVEY §2.4: params replicated, batch
sharded over the ``data`` axis, gradient psum inserted by XLA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.models import build_model
from pose_estimation_amitai_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
)
from pose_estimation_amitai_tpu.parallel.sharded import (
    make_sharded_train_step,
    shard_microbatches,
    shard_state,
)
from pose_estimation_amitai_tpu.train.loop import create_train_state

HW, IN_CH, OUT_CH = 48, 4, 6


def _setup(n_devices, accum=2, per_step_batch=None, hw=HW, **cfg_kw):
    mesh = make_mesh((n_devices,), jax.devices()[:n_devices])
    per_step_batch = per_step_batch or 2 * n_devices
    kw = dict(num_base_filters=8, accumulation_steps=accum,
              batch_size=per_step_batch, do_augmentations=True,
              rotation_range=10.0, xy_shifts=2.0)
    kw.update(cfg_kw)
    cfg = Config(**kw)
    model = build_model(cfg, (hw, hw, IN_CH), OUT_CH)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.random((accum, per_step_batch, hw, hw, IN_CH), np.float32)
        ),
        "confmaps": jnp.asarray(
            rng.random((accum, per_step_batch, hw, hw, OUT_CH), np.float32)
        ),
    }
    state = create_train_state(model, cfg, {k: v[0] for k, v in batch.items()})
    return mesh, cfg, model, state, batch


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names[0] == DATA_AXIS
    mesh2 = make_mesh((4, 2))
    assert mesh2.devices.shape == (4, 2)


def test_sharded_step_runs_and_replicates():
    mesh, cfg, model, state, batch = _setup(8)
    state = shard_state(mesh, state)
    sb = shard_microbatches(mesh, batch)
    # batch really is sharded over the data axis
    assert sb["image"].sharding.is_equivalent_to(
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, DATA_AXIS)
        ), sb["image"].ndim,
    )
    step = make_sharded_train_step(model, cfg, mesh)
    new_state, loss = step(state, sb, jnp.asarray(1.0))
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1
    # params remain replicated (fully addressable on every device)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_matches_single_device():
    """Same data + RNG on a 1-device mesh vs the 8-device mesh: the update
    is identical (DP must be semantics-preserving)."""
    mesh8, cfg, model, state, batch = _setup(8)
    mesh1 = make_mesh((1,), jax.devices()[:1])

    s8 = make_sharded_train_step(model, cfg, mesh8)
    s1 = make_sharded_train_step(model, cfg, mesh1)
    out8, loss8 = s8(shard_state(mesh8, state),
                     shard_microbatches(mesh8, batch), jnp.asarray(1.0))
    out1, loss1 = s1(shard_state(mesh1, state),
                     shard_microbatches(mesh1, batch), jnp.asarray(1.0))
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=2e-4)
    l8 = jax.tree_util.tree_leaves(out8.params)[0]
    l1 = jax.tree_util.tree_leaves(out1.params)[0]
    np.testing.assert_allclose(
        np.asarray(l8), np.asarray(l1), rtol=2e-3, atol=2e-5
    )


def test_tensor_parallel_annotation_equivalence():
    """TP is a sharding annotation, not a rewrite (DESIGN promise): on a
    (data=2, model=2) mesh with kernels column-sharded over ``model``, the
    unchanged sharded train step produces the same update as 1-device."""
    from pose_estimation_amitai_tpu.parallel.mesh import MODEL_AXIS
    from pose_estimation_amitai_tpu.parallel.tensor import (
        param_specs,
        shard_state_tp,
    )

    _, cfg, model, state, batch = _setup(
        4, do_augmentations=False, compute_dtype="float32"
    )
    mesh22 = make_mesh((2, 2), jax.devices()[:4])
    mesh1 = make_mesh((1,), jax.devices()[:1])

    tp_state = shard_state_tp(mesh22, state, cfg)
    # at least one kernel really is sharded over the model axis
    specs = jax.tree_util.tree_leaves(
        param_specs(mesh22, state.params),
        is_leaf=lambda x: isinstance(x, jax.sharding.NamedSharding),
    )
    assert any(MODEL_AXIS in str(s.spec) for s in specs)
    leaf_shardings = [
        l.sharding for l in jax.tree_util.tree_leaves(tp_state.params)
    ]
    assert any(not s.is_fully_replicated for s in leaf_shardings)

    s22 = make_sharded_train_step(model, cfg, mesh22)
    s1 = make_sharded_train_step(model, cfg, mesh1)
    out22, loss22 = s22(tp_state, shard_microbatches(mesh22, batch),
                        jnp.asarray(1.0))
    out1, loss1 = s1(shard_state(mesh1, state),
                     shard_microbatches(mesh1, batch), jnp.asarray(1.0))
    np.testing.assert_allclose(float(loss22), float(loss1), rtol=2e-4)
    l22 = jax.tree_util.tree_leaves(out22.params)[0]
    l1 = jax.tree_util.tree_leaves(out1.params)[0]
    np.testing.assert_allclose(
        np.asarray(l22), np.asarray(l1), rtol=2e-3, atol=2e-5
    )


def test_sharded_batchnorm_cross_replica():
    """BatchNorm models train on the mesh: GSPMD computes the BN batch-mean
    globally over the sharded axis, so 8-device running stats match the
    1-device stats on identical data (cross-replica BN by annotation)."""
    mesh8, cfg, model, state, batch = _setup(
        8, hw=64, model_type="RESNET_18_POINTS_PER_WING",
        do_augmentations=False, compute_dtype="float32",
    )
    assert state.batch_stats, "ResNet variant should carry BN running stats"
    mesh1 = make_mesh((1,), jax.devices()[:1])

    s8 = make_sharded_train_step(model, cfg, mesh8)
    s1 = make_sharded_train_step(model, cfg, mesh1)
    out8, loss8 = s8(shard_state(mesh8, state),
                     shard_microbatches(mesh8, batch), jnp.asarray(1.0))
    out1, loss1 = s1(shard_state(mesh1, state),
                     shard_microbatches(mesh1, batch), jnp.asarray(1.0))
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=2e-4)
    # running stats advanced and agree across mesh sizes
    flat8 = jax.tree_util.tree_leaves(out8.batch_stats)
    flat1 = jax.tree_util.tree_leaves(out1.batch_stats)
    flat0 = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(flat8, flat0)
    ), "batch_stats did not update"
    for a, b in zip(flat8, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )
