"""Device mesh + sharding helpers.

The reference has NO distributed code at all (SURVEY §2.4: single GPU, a
``torchrun`` binary in the venv that is never invoked). The TPU rebuild makes
data parallelism the structural default: a 1-D ``jax.sharding.Mesh`` over all
local devices, batches sharded on the ``data`` axis, parameters replicated.
XLA inserts the gradient ``psum`` over ICI automatically from the sharding
annotations — no NCCL-style collective calls in user code.

The mesh generalises: pass ``mesh_shape=(dp, mp)`` to reserve a ``model``
axis; at this model scale (~10^7 params) TP is never needed, but the latent
channel dimension of the multi-camera models can be sharded over ``model``
with one extra annotation if it ever is (SURVEY §2.4 TP row).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed(cfg=None) -> bool:
    """Join a multi-host JAX cluster when one is configured.

    SURVEY §2.4: DCN-scale coordination is "free via jax distributed init" —
    this is that hook. On Cloud TPU pods `jax.distributed.initialize()`
    autodetects coordinator/process ranks from the TPU metadata; elsewhere it
    reads the standard JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID /
    JAX_NUM_PROCESSES env vars. After it succeeds, ``jax.devices()`` spans
    the whole pod and :func:`make_mesh` builds a global mesh — the train
    step is unchanged (GSPMD routes the gradient psum over ICI within hosts
    and DCN across them from the same sharding annotations).

    Called from the Trainer when ``Config.distributed`` is set (or always
    safe to call: it is a no-op when no cluster is configured). Returns True
    when a multi-process runtime was initialised.
    """
    import os

    want = bool(getattr(cfg, "distributed", False)) or (
        "JAX_COORDINATOR_ADDRESS" in os.environ
    )
    if not want:
        return False
    if jax.process_count() > 1:  # already initialised
        return True
    try:
        jax.distributed.initialize()
    except Exception as e:
        if bool(getattr(cfg, "distributed", False)):
            # Explicitly requested: a silent single-host fallback would let
            # every pod process train independently — fail loudly instead.
            raise RuntimeError(
                "Config.distributed was set but "
                f"jax.distributed.initialize() failed: {e}"
            ) from e
        # env-var-driven opportunistic init: fallback keeps local runs alive
        print(f"jax.distributed.initialize() skipped: {e}", flush=True)
        return False
    return jax.process_count() > 1


def _device_grid(shape: tuple[int, ...], devices: list) -> np.ndarray:
    """Arrange devices into a grid, ICI-topology-aware where possible.

    ``mesh_utils.create_device_mesh`` orders real TPU devices so that
    neighbouring mesh coordinates are physical ICI neighbours — which is
    what makes the ppermute rings in pipeline/sequence parallelism single-
    hop. Falls back to enumeration-order reshape for device subsets or
    backends the helper rejects (e.g. a CPU test mesh, where topology is
    meaningless).
    """
    n = int(np.prod(shape))
    assert len(devices) >= n, (
        f"need {n} devices for a {shape} mesh, have {len(devices)}"
    )
    devs = list(devices[:n])
    try:
        from jax.experimental import mesh_utils

        return mesh_utils.create_device_mesh(shape, devices=devs)
    except Exception as e:
        # Expected for CPU test meshes / device subsets where topology is
        # meaningless; on real TPU the fallback costs multi-hop ppermute
        # rings, so losing it must be visible, not silent.
        if getattr(devs[0], "platform", "") == "tpu":
            print(
                f"[mesh] create_device_mesh{shape} failed ({e!r}); falling "
                "back to enumeration order — pipe/seq ring hops may span "
                "multiple ICI links",
                flush=True,
            )
        return np.asarray(devs).reshape(shape)


def make_mesh(
    mesh_shape: tuple[int, ...] = (), devices: list | None = None
) -> Mesh:
    """Create a device mesh.

    ``mesh_shape=()`` -> 1-D data mesh over all devices. ``(dp,)`` or
    ``(dp, mp)`` select explicit extents.
    """
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = (len(devices),)
    axes = (DATA_AXIS, MODEL_AXIS)[: len(mesh_shape)]
    return Mesh(_device_grid(tuple(mesh_shape), devices), axes)


def make_2d_mesh(
    dp: int, n: int, second_axis: str, devices: list | None = None
) -> Mesh:
    """A 2-D ``(data, <second_axis>)`` mesh — DP rows, ring over columns."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(_device_grid((dp, n), devices), (DATA_AXIS, second_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of (B, ...) arrays with B sharded over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_params(mesh: Mesh, params):
    """Replicate a parameter pytree over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), params)
