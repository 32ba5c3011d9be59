"""Sequence parallelism: ring attention over a (data, seq) mesh.

Runs on the virtual 8-CPU mesh (conftest). The ring + online softmax must
reproduce plain softmax attention exactly (it reschedules the math, it does
not approximate it), forward and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_amitai_tpu.parallel.sequence import (
    make_seq_mesh,
    reference_attention,
    ring_attention,
)


def _qkv(rng, b=4, n=64, h=2, d=16):
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    return q, k, v


@pytest.mark.quick
def test_ring_attention_matches_reference(rng):
    mesh = make_seq_mesh(dp=2, sp=4)
    q, k, v = _qkv(rng)
    out = jax.jit(lambda *a: ring_attention(*a, mesh=mesh))(q, k, v)
    ref = jax.jit(reference_attention)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-5
    )


@pytest.mark.quick
def test_ring_attention_seq_only_mesh(rng):
    mesh = make_seq_mesh(dp=1, sp=8)
    q, k, v = _qkv(rng, b=2, n=32)
    out = jax.jit(lambda *a: ring_attention(*a, mesh=mesh))(q, k, v)
    ref = jax.jit(reference_attention)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-5
    )


@pytest.mark.quick
def test_ring_attention_grads_match_reference(rng):
    mesh = make_seq_mesh(dp=2, sp=4)
    q, k, v = _qkv(rng, b=2, n=32)
    tgt = jnp.asarray(rng.standard_normal((2, 32, 2, 16)), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.mean((ring_attention(q, k, v, mesh=mesh) - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.mean((reference_attention(q, k, v) - tgt) ** 2)

    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gs = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
        )


@pytest.mark.quick
def test_ring_attention_bf16_inputs(rng):
    mesh = make_seq_mesh(dp=2, sp=4)
    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv(rng, b=2, n=32))
    out = jax.jit(lambda *a: ring_attention(*a, mesh=mesh))(q, k, v)
    ref = jax.jit(reference_attention)(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=3e-2,
    )
