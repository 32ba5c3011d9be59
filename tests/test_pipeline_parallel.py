"""Pipeline parallelism: GPipe ViT trunk over a (data, pipe) mesh.

Runs on the virtual 8-CPU mesh (conftest). Verifies the shard_mapped
pipeline is numerically the plain sequential stack, and that training
through it (reverse pipeline via ppermute transpose) descends.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_amitai_tpu.parallel.pipeline import (
    PipelinedViT,
    make_pipeline_mesh,
    make_pipelined_train_step,
)


def _tiny_model(dp=2, pp=4, M=4):
    mesh = make_pipeline_mesh(dp, pp)
    model = PipelinedViT(
        mesh,
        image_hw=32,
        in_channels=4,
        out_channels=6,
        patch_size=16,
        dim=32,
        depth=8,
        heads=2,
        dim_head=16,
        mlp_expand=2,
        num_microbatches=M,
    )
    return mesh, model


@pytest.mark.quick
def test_pipeline_forward_matches_sequential(rng):
    mesh, model = _tiny_model()
    params = model.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 4)), jnp.float32)

    ref = jax.jit(model.apply_sequential)(params, x)
    out = jax.jit(model.apply)(model.shard_params(params), x)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-2
    )
    assert out.shape == (8, 32, 32, 6)


@pytest.mark.quick
def test_pipeline_grads_match_sequential(rng):
    mesh, model = _tiny_model()
    params = model.init(jax.random.key(1))
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 4)), jnp.float32)
    y = jnp.asarray(rng.random((8, 32, 32, 6)), jnp.float32)

    def loss_pipe(p):
        return jnp.mean((model.apply(p, x).astype(jnp.float32) - y) ** 2)

    def loss_seq(p):
        return jnp.mean(
            (model.apply_sequential(p, x).astype(jnp.float32) - y) ** 2
        )

    lp, gp = jax.jit(jax.value_and_grad(loss_pipe))(model.shard_params(params))
    ls, gs = jax.jit(jax.value_and_grad(loss_seq))(params)

    assert np.isclose(float(lp), float(ls), rtol=1e-3)
    # every leaf: staged block grads + replicated embed/decoder grads.
    # Relative tolerance so a gradient SCALE error (e.g. a wrong collective
    # transpose) cannot hide under an absolute atol at small magnitudes;
    # small atol absorbs bf16 noise near zero.
    flat_p, _ = jax.tree_util.tree_flatten(gp)
    flat_s, _ = jax.tree_util.tree_flatten(gs)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-2, atol=1e-4,
        )


@pytest.mark.quick
def test_pipeline_more_microbatches_than_stages(rng):
    # M=8 > S=4: amortised-bubble regime; fill/drain indexing must hold
    mesh, model = _tiny_model(M=8)
    params = model.init(jax.random.key(4))
    x = jnp.asarray(rng.standard_normal((16, 32, 32, 4)), jnp.float32)
    ref = jax.jit(model.apply_sequential)(params, x)
    out = jax.jit(model.apply)(model.shard_params(params), x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-2
    )


@pytest.mark.quick
def test_pipeline_invalid_microbatches_rejected():
    with pytest.raises(AssertionError):
        _tiny_model(M=0)


@pytest.mark.quick
def test_pipeline_block_params_are_staged():
    mesh, model = _tiny_model()
    params = model.shard_params(model.init(jax.random.key(2)))
    leaf = jax.tree_util.tree_leaves(params["blocks"])[0]
    # leading layer axis (8) split over 4 pipeline stages
    assert leaf.sharding.spec[0] == "pipe"
    emb = jax.tree_util.tree_leaves(params["embed"])[0]
    assert emb.sharding.spec == ()


def test_pipelined_training_descends(rng):
    mesh, model = _tiny_model()
    params = model.shard_params(model.init(jax.random.key(3)))
    tx, step = make_pipelined_train_step(model, learning_rate=3e-3)
    opt_state = tx.init(params)

    x = jnp.asarray(rng.standard_normal((8, 32, 32, 4)), jnp.float32)
    yv = jnp.asarray(rng.random((8, 32, 32, 6)), jnp.float32)
    batch = {"image": x, "confmaps": yv}

    losses = []
    for _ in range(12):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
