"""Trainer-integrated pipeline parallelism (``cfg.pipeline_stages``).

The GPipe ViT pipeline (parallel/pipeline.py) driven end-to-end by the
generic Trainer on the virtual 8-CPU mesh: config knob in, staged params,
descending loss, artifacts, checkpoint/resume — no separate code path.
"""

import numpy as np
import pytest

import jax

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
from pose_estimation_amitai_tpu.parallel.pipeline import PIPE_AXIS
from pose_estimation_amitai_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def arrays():
    return make_synthetic_arrays(num_frames=8, num_points=8, image_size=48,
                                 seed=0)


def _cfg(tmp_path, **kw):
    base = dict(
        model_type=C.MODEL_18_POINTS_PER_WING_VIT,
        epochs=2, batch_size=8, batches_per_epoch=2,
        patch_size=16, projection_dim=32, transformer_layers=4, num_heads=2,
        fully_connected_expand=2, dim_head=0,
        pipeline_stages=4,  # x 2-way DP on the 8-device test mesh
        base_output_path=str(tmp_path), do_augmentations=True,
        rotation_range=10.0, xy_shifts=2.0,
        val_fraction=0.5, seed=0,
    )
    base.update(kw)
    return Config(**base)


def test_pipelined_trainer_trains_and_resumes(tmp_path, arrays):
    trainer = Trainer(_cfg(tmp_path), arrays=arrays)
    assert trainer.mesh is not None and PIPE_AXIS in trainer.mesh.shape

    # trunk block stacks are staged over ``pipe``; the rest replicates
    blocks_leaf = jax.tree_util.tree_leaves(trainer.state.params["blocks"])[0]
    assert PIPE_AXIS in str(blocks_leaf.sharding.spec)
    embed_leaf = jax.tree_util.tree_leaves(trainer.state.params["embed"])[0]
    assert embed_leaf.sharding.is_fully_replicated

    history = trainer.train()
    assert all(np.isfinite(v) for v in history["train_loss"])
    assert all(np.isfinite(v) for v in history["val_loss"])

    # resume from the per-epoch checkpoint, placement re-applied
    cfg2 = _cfg(tmp_path, epochs=3, resume_from=trainer.run_path)
    trainer2 = Trainer(cfg2, arrays=arrays)
    assert trainer2.start_epoch == 2
    history2 = trainer2.train()
    assert len(history2["train_loss"]) == 1
    assert np.isfinite(history2["train_loss"][0])

    # the standard serving entry point loads the PP-layout checkpoint
    from pose_estimation_amitai_tpu.infer import Predictor

    n_out = trainer.model.pipe.out_channels
    pred = Predictor.from_checkpoint(
        _cfg(tmp_path), trainer.run_path, image_shape=(48, 48, 4),
        num_output_channels=n_out, chunk_size=4,
    )
    pts = pred(np.zeros((2, 48, 48, 4), np.float32))
    assert pts.shape == (2, 3, n_out)


@pytest.mark.quick
def test_pipeline_checkpoint_serves_as_vitpose():
    """PP param layout converts to ViTPoseNet's and computes the same fn.

    Proves (a) PP-trained checkpoints serve through the standard inference
    path and (b) the pipelined model IS the registry architecture.
    """
    import jax.numpy as jnp

    from pose_estimation_amitai_tpu.models.vit import ViTPoseNet
    from pose_estimation_amitai_tpu.parallel.pipeline import (
        PipelinedViT, make_pipeline_mesh, pipeline_params_to_vit,
        vit_params_to_pipeline,
    )

    mesh = make_pipeline_mesh(2, 4)
    pipe = PipelinedViT(
        mesh, image_hw=48, in_channels=4, out_channels=6, patch_size=16,
        dim=32, depth=4, heads=2, dim_head=16, mlp_expand=2,
    )
    params = pipe.init(jax.random.key(0))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 48, 48, 4)), jnp.float32
    )
    ref = np.asarray(jax.jit(pipe.apply_sequential)(params, x))

    vit = ViTPoseNet(out_channels=6, patch_size=16, dim=32, depth=4, heads=2,
                     dim_head=16, mlp_expand=2)
    out = np.asarray(
        jax.jit(lambda p, x: vit.apply({"params": p}, x, train=False))(
            pipeline_params_to_vit(params), x
        )
    )
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-2)

    # round-trip back to the stacked layout
    rt = vit_params_to_pipeline(pipeline_params_to_vit(params), depth=4)
    for a, b in zip(jax.tree_util.tree_leaves(rt),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_stages_rejects_non_vit(tmp_path, arrays):
    with pytest.raises(ValueError, match="ViT"):
        Trainer(
            _cfg(tmp_path, model_type=C.MODEL_18_POINTS_PER_WING),
            arrays=arrays,
        )


def test_pipeline_stages_rejects_bad_batch(tmp_path, arrays):
    # batch 6 does not divide microbatches(4) x dp(2)
    with pytest.raises(ValueError, match="batch_size"):
        Trainer(_cfg(tmp_path, batch_size=6), arrays=arrays)


def test_pipeline_honors_mesh_shape(tmp_path, arrays):
    """mesh_shape restricts the device count in the PP branch too."""
    trainer = Trainer(
        _cfg(tmp_path, mesh_shape=(4,), pipeline_stages=4, batch_size=4,
             epochs=1),
        arrays=arrays,
    )
    assert trainer.mesh.devices.size == 4
    with pytest.raises(ValueError, match="devices"):
        Trainer(
            _cfg(tmp_path, mesh_shape=(16,), pipeline_stages=4),
            arrays=arrays,
        )


@pytest.mark.quick
def test_vit_dropout_stays_zero():
    """Reference parity: the ViT families train with dropout 0.0 — the
    config's dropout_ratio feeds the CNN encoder stages only
    (pytorch/VITs.py:197-229 defaults vs tensorflow/Network.py:416-447)."""
    from pose_estimation_amitai_tpu.models import build_model

    cfg = Config(model_type=C.MODEL_18_POINTS_PER_WING_VIT)
    assert build_model(cfg, (192, 192, 4), 18).dropout == 0.0
    cfg4 = Config(model_type=C.ALL_CAMS_18_POINTS_VIT)
    assert build_model(cfg4, (192, 192, 16), 72).dropout == 0.0
