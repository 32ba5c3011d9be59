"""Tensor parallelism as a sharding annotation (SURVEY §2.4 TP row).

At this model scale (~10^7 params) TP is never *required*, but the design
promise of DESIGN.md is that it is "a sharding annotation, not a rewrite".
This module keeps that promise: given a 2-D ``(data, model)`` mesh, every
weight matrix/conv kernel whose output-feature axis divides the ``model``
extent is sharded column-wise over ``model`` (Megatron-style), the optimiser
moments follow their parameters (``optax.tree_map_params``), and the
*unchanged* sharded train step (parallel/sharded.py) runs on top — GSPMD
derives the forward all-gathers / backward reduce-scatters from the leaf
shardings alone. No model code changes, no hand-written collectives.

Equivalence with replicated training is tested on the virtual CPU mesh
(tests/test_sharded.py) and exercised by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.loop import TrainState, create_optimizer
from .mesh import MODEL_AXIS


def param_spec(mesh: Mesh, leaf) -> NamedSharding:
    """Column-wise TP spec for one parameter leaf.

    Kernels (ndim >= 2) shard their trailing output-feature axis over
    ``model`` when divisible; biases/scales/embeddings replicate.
    """
    mp = mesh.shape[MODEL_AXIS]
    if leaf.ndim >= 2 and leaf.shape[-1] % mp == 0 and leaf.shape[-1] >= mp:
        return NamedSharding(
            mesh, P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
        )
    return NamedSharding(mesh, P())


def param_specs(mesh: Mesh, params):
    """Pytree of shardings mirroring ``params``."""
    return jax.tree_util.tree_map(lambda v: param_spec(mesh, v), params)


def shard_state_tp(mesh: Mesh, state: TrainState, cfg=None) -> TrainState:
    """Place a TrainState for (data, model) training.

    Params and Adam moments get the column-wise TP layout; everything else
    replicates. The result feeds straight into
    :func:`..parallel.sharded.make_sharded_train_step`.
    """
    if MODEL_AXIS not in mesh.shape or mesh.shape[MODEL_AXIS] == 1:
        from .sharded import shard_state

        return shard_state(mesh, state)

    specs = param_specs(mesh, state.params)
    put = lambda x, s: jax.device_put(x, s)
    params = jax.tree_util.tree_map(put, state.params, specs)

    if cfg is not None:
        tx = create_optimizer(cfg)
        opt_state = optax.tree_map_params(
            tx, put, state.opt_state, specs,
            transform_non_params=lambda x: jax.device_put(
                x, NamedSharding(mesh, P())
            ),
        )
    else:
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())),
            state.opt_state,
        )

    repl = NamedSharding(mesh, P())
    return state.replace(
        step=jax.device_put(state.step, repl),
        params=params,
        opt_state=opt_state,
        batch_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state.batch_stats
        ),
        rng=jax.device_put(state.rng, repl),
    )
