"""Checkpointing with working resume.

The reference writes a full ``checkpoint.pth`` (model+optimizer+epoch+loss)
every epoch but NO code path ever loads it — TF even hard-codes ``epoch0 = 0``
(reference: pytorch/train_pytorch.py:253-260, tensorflow/train.py:89; SURVEY
§5 flags resume as the capability gap to close). Here: one msgpack pytree
format (flax.serialization) with best/every-epoch policies and true resume of
params, optimiser state, RNG, epoch counter, LR-plateau state and the
best-val marker.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import serialization

from .loop import TrainState

CHECKPOINT_NAME = "checkpoint.msgpack"
BEST_NAME = "best_model.msgpack"
META_NAME = "checkpoint_meta.json"


def _state_payload(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "rng": jax.random.key_data(state.rng),
    }


def save_checkpoint(
    run_path: str,
    state: TrainState,
    epoch: int,
    val_loss: float,
    scheduler_state: dict[str, Any] | None = None,
    best: bool = False,
    best_loss: float | None = None,
) -> str:
    """Write the full training state (every-epoch policy,
    pytorch/train_pytorch.py:253-260) or the best-model snapshot.

    ``best_loss`` records the best-so-far val loss in the meta so a resumed
    run keeps the true best marker — recording only this epoch's val_loss
    would let a worse post-resume epoch overwrite best_model.msgpack.
    """
    name = BEST_NAME if best else CHECKPOINT_NAME
    path = os.path.join(run_path, name)
    blob = serialization.to_bytes(_state_payload(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    if not best:
        meta = {
            "epoch": int(epoch),
            "val_loss": float(val_loss),
            "best_loss": float(val_loss if best_loss is None else best_loss),
            "scheduler": scheduler_state or {},
        }
        with open(os.path.join(run_path, META_NAME), "w") as f:
            json.dump(meta, f, indent=2)
    return path


class AsyncCheckpointer:
    """Background-thread checkpoint writer.

    ``serialization.to_bytes`` forces a synchronous device->host fetch of
    the full training state — seconds per save through a remote-attached
    runtime, paid every epoch under the reference's every-epoch checkpoint
    policy (pytorch/train_pytorch.py:253-260). JAX arrays are immutable, so
    snapshotting the state is just capturing pytree references: the fetch,
    msgpack encode and file write all run on a worker thread while the main
    thread dispatches the next epoch's device work.

    At most one write is in flight: a second save waits for the first
    (bounded host memory, strictly ordered files). Writes stay atomic
    (tmp + ``os.replace`` in :func:`save_checkpoint`). ``wait()`` re-raises
    any worker exception — call it before reading files back or returning
    control to the user.
    """

    def __init__(self) -> None:
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer"
        )
        self._pending = None

    def save_checkpoint(self, *args, **kwargs) -> None:
        self.wait()
        # resolve the module global at submit time so monkeypatched
        # save_checkpoint (tests, scripts/parity_reference_regime.py's
        # throttle) stays effective
        self._pending = self._pool.submit(save_checkpoint, *args, **kwargs)

    def save_params(self, path: str, params) -> None:
        self.wait()
        self._pending = self._pool.submit(save_params, path, params)

    def wait(self) -> None:
        """Block until the in-flight write lands; re-raise its error."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()


def save_params(path: str, params) -> str:
    """Weights-only snapshot (analog of the per-epoch .h5 weights,
    tensorflow/CallBacks.py:122-128). tmp + rename so a crash mid-write
    (likelier on the async thread) never leaves a truncated msgpack."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(params))
    os.replace(tmp, path)
    return path


def _read_payload_bytes(path: str) -> bytes:
    """Read a msgpack payload, stripping the imported-snapshot file magic
    when present (importers.IMPORT_SNAPSHOT_MAGIC) so snapshot files stay
    loadable by the generic params/variables readers."""
    from ..importers import IMPORT_SNAPSHOT_MAGIC

    with open(path, "rb") as f:
        data = f.read()
    if data.startswith(IMPORT_SNAPSHOT_MAGIC):
        data = data[len(IMPORT_SNAPSHOT_MAGIC):]
    return data


def load_params(path: str, template=None):
    """Load a params pytree from a weights-only snapshot, a full
    checkpoint/best-model payload, or a run directory (best preferred)."""
    if os.path.isdir(path):
        for name in (BEST_NAME, CHECKPOINT_NAME):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    data = _read_payload_bytes(path)
    restored = serialization.msgpack_restore(data)
    if isinstance(restored, dict) and {"params", "opt_state"} <= set(restored):
        restored = restored["params"]  # full TrainState payload
    elif isinstance(restored, dict) and "format" in restored:
        restored = restored["params"]  # imported-reference snapshot payload
    restored = jax.tree_util.tree_map(jnp.asarray, restored)
    if template is not None:
        return serialization.from_state_dict(template, restored)
    return restored


def load_variables(path: str, params_template=None):
    """Load ``(params, batch_stats)`` from a snapshot or full payload.

    BatchNorm models (ResNet / disentangled) carry running stats next to
    their params; weights-only snapshots return ``batch_stats = {}``.
    """
    if os.path.isdir(path):
        for name in (BEST_NAME, CHECKPOINT_NAME):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    restored = serialization.msgpack_restore(_read_payload_bytes(path))
    batch_stats = {}
    if isinstance(restored, dict) and (
        {"params", "opt_state"} <= set(restored)
        or "format" in restored  # imported-reference snapshot payload
    ):
        batch_stats = restored.get("batch_stats", {}) or {}
        restored = restored["params"]
    restored = jax.tree_util.tree_map(jnp.asarray, restored)
    if batch_stats:
        batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    if params_template is not None:
        restored = serialization.from_state_dict(params_template, restored)
    return restored, batch_stats


def restore_checkpoint(
    path: str, template: TrainState
) -> tuple[TrainState, dict[str, Any]]:
    """Restore a TrainState from ``path`` (file or run dir) + meta dict."""
    if os.path.isdir(path):
        ckpt = os.path.join(path, CHECKPOINT_NAME)
        meta_path = os.path.join(path, META_NAME)
    else:
        ckpt = path
        meta_path = os.path.join(os.path.dirname(path), META_NAME)
    with open(ckpt, "rb") as f:
        data = f.read()
    restored = serialization.from_bytes(_state_payload(template), data)
    state = template.replace(
        step=jnp.asarray(restored["step"], jnp.int32),
        params=restored["params"],
        opt_state=restored["opt_state"],
        batch_stats=restored["batch_stats"],
        rng=jax.random.wrap_key_data(jnp.asarray(restored["rng"])),
    )
    meta: dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
