"""AsyncCheckpointer: background writes land atomically, errors surface.

The reference saves ``checkpoint.pth`` synchronously every epoch
(pytorch/train_pytorch.py:253-260); here the device->host fetch + encode +
write run on a worker thread overlapping the next epoch's dispatched work
(train/checkpoint.py AsyncCheckpointer, on by default via
``Config.async_checkpoint``).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.models import build_model
from pose_estimation_amitai_tpu.train import checkpoint as ckpt
from pose_estimation_amitai_tpu.train.loop import create_train_state

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def state():
    cfg = Config(num_base_filters=8)
    model = build_model(cfg, (48, 48, 4), 5)
    sample = {"image": jnp.zeros((2, 48, 48, 4), jnp.float32)}
    return create_train_state(model, cfg, sample, seed=0)


def test_async_round_trip(tmp_path, state):
    writer = ckpt.AsyncCheckpointer()
    writer.save_checkpoint(str(tmp_path), state, epoch=3, val_loss=0.25,
                           scheduler_state={"bad_epochs": 1})
    writer.wait()
    restored, meta = ckpt.restore_checkpoint(str(tmp_path), state)
    assert meta["epoch"] == 3 and meta["val_loss"] == 0.25
    assert meta["scheduler"] == {"bad_epochs": 1}
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ordered_writes_last_wins(tmp_path, state):
    writer = ckpt.AsyncCheckpointer()
    for epoch in range(4):
        writer.save_checkpoint(str(tmp_path), state, epoch=epoch,
                               val_loss=1.0 / (epoch + 1))
    writer.wait()
    _, meta = ckpt.restore_checkpoint(str(tmp_path), state)
    assert meta["epoch"] == 3


def test_params_write_and_worker_error_propagates(tmp_path, state):
    writer = ckpt.AsyncCheckpointer()
    path = os.path.join(str(tmp_path), "w.msgpack")
    writer.save_params(path, state.params)
    writer.wait()
    assert os.path.exists(path)
    loaded = ckpt.load_params(path, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    writer.save_params(os.path.join(str(tmp_path), "no_such_dir", "x.msgpack"),
                       state.params)
    with pytest.raises(Exception):
        writer.wait()
    # a failed wait clears the pending slot; the writer stays usable
    writer.save_params(path, state.params)
    writer.wait()


def test_sync_fallback_config(tmp_path, state):
    from pose_estimation_amitai_tpu.train.trainer import _CkptSync

    writer = _CkptSync()
    writer.save_checkpoint(str(tmp_path), state, epoch=0, val_loss=0.5)
    writer.wait()
    assert os.path.exists(os.path.join(str(tmp_path), ckpt.CHECKPOINT_NAME))
