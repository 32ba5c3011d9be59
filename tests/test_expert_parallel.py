"""Expert parallelism: MoE FFN sharded over a (data, expert) mesh.

Runs on the virtual 8-CPU mesh (conftest). The expert-parallel dense
dispatch must equal the unsharded MoE exactly, forward and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_amitai_tpu.parallel.expert import (
    MoEFeedForward,
    make_expert_mesh,
)


def _model(dp=2, ep=4, experts=8):
    mesh = make_expert_mesh(dp, ep)
    return mesh, MoEFeedForward(
        mesh, dim=16, hidden_dim=32, num_experts=experts
    )


@pytest.mark.quick
def test_moe_matches_dense(rng):
    mesh, moe = _model()
    params = moe.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((4, 12, 16)), jnp.float32)
    out = jax.jit(moe.apply)(moe.shard_params(params), x)
    ref = jax.jit(moe.apply_dense)(params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-5
    )


@pytest.mark.quick
def test_moe_grads_match_dense(rng):
    mesh, moe = _model()
    params = moe.init(jax.random.key(1))
    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)

    def loss_ep(p):
        return jnp.mean((moe.apply(p, x) - tgt) ** 2)

    def loss_dense(p):
        return jnp.mean((moe.apply_dense(p, x) - tgt) ** 2)

    ge = jax.jit(jax.grad(loss_ep))(moe.shard_params(params))
    gd = jax.jit(jax.grad(loss_dense))(params)
    for k in gd:
        np.testing.assert_allclose(
            np.asarray(ge[k]), np.asarray(gd[k]), rtol=0, atol=1e-6,
            err_msg=k,
        )


@pytest.mark.quick
def test_moe_params_are_expert_sharded():
    mesh, moe = _model()
    params = moe.shard_params(moe.init(jax.random.key(2)))
    assert params["w1"].sharding.spec[0] == "expert"
    assert params["gate"].sharding.spec == ()


@pytest.mark.quick
def test_moe_top1_routing_is_sparse(rng):
    mesh, moe = _model()
    params = moe.init(jax.random.key(3))
    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    gates = moe._gates(params["gate"], x)
    nonzero = (np.asarray(gates) > 0).sum(axis=-1)
    assert (nonzero == 1).all()
