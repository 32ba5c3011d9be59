"""Sequence parallelism: ring attention over a ``seq`` mesh axis.

The reference workload never needs SP — its longest sequence is the 4x144 =
576 fused camera tokens in the cross-attention multicam ViT
(reference: pytorch/VITs.py:295-300), which fits trivially per chip
(SURVEY §2.4 lists SP/CP as not applicable). The rebuild still ships a
real, tested implementation so the parallelism surface is complete and the
attention path scales past single-chip HBM if sequence lengths ever grow.

TPU-native design (blockwise/ring attention, the scaling-book shape — not
an NCCL P2P port):

* queries, keys and values are sharded over the mesh's ``seq`` axis on the
  token dimension: each of the S devices owns an ``N / S`` token slab.
* inside one ``jax.shard_map`` region, a ``lax.scan`` runs S ticks. Every
  tick each device contracts its resident query slab against the currently
  visiting key/value slab on the MXU and folds the result into a running
  **online softmax** (flash-attention accumulator: running row max ``m``,
  normaliser ``l``, unnormalised output ``o`` — no N x N logits ever
  materialise), then passes the k/v slab one hop around the ring with a
  single ``lax.ppermute`` riding ICI.
* compute/communication overlap and the reverse ring under ``jax.grad``
  come from XLA: ``ppermute`` has a transpose (the reversed ring), so
  differentiating through the scan yields the backward ring schedule
  automatically.
* composes with data parallelism: the mesh is ``(data, seq)``; batch rows
  shard over ``data``, tokens over ``seq``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, make_2d_mesh

SEQ_AXIS = "seq"


def make_seq_mesh(dp: int, sp: int, devices=None) -> Mesh:
    """A 2-D ``(data, seq)`` mesh: DP over rows, the SP ring over columns.

    Topology-aware (parallel.mesh._device_grid): on real TPU slices the
    ``seq`` ring hops are physical ICI neighbours.
    """
    return make_2d_mesh(dp, sp, SEQ_AXIS, devices)


def _ring_attention_shard(num_shards: int, q, k, v):
    """Per-shard ring attention body. q/k/v: (B, n, H, D) local slabs.

    Online-softmax accumulation in f32; one ppermute ring hop per tick.
    Bidirectional (no causal mask) — matches the ViT attention semantics
    (models/vit.py Attention).
    """
    scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32)
    b, n, h, d = qf.shape
    ring = [(i, (i + 1) % num_shards) for i in range(num_shards)]

    o0 = jnp.zeros((b, h, n, d), jnp.float32)
    l0 = jnp.zeros((b, h, n), jnp.float32)
    m0 = jnp.full((b, h, n), -jnp.inf, jnp.float32)

    def fold(o, l, m, kc, vc):
        s = jnp.einsum(
            "bnhd,bmhd->bhnm", qf, kc.astype(jnp.float32)
        ) * scale
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhnm,bmhd->bhnd", p, vc.astype(jnp.float32)
        )
        return o, l, m_new

    def tick(carry, _):
        o, l, m, kc, vc = carry
        o, l, m = fold(o, l, m, kc, vc)
        kc = jax.lax.ppermute(kc, SEQ_AXIS, ring)
        vc = jax.lax.ppermute(vc, SEQ_AXIS, ring)
        return (o, l, m, kc, vc), None

    # S-1 ring ticks, then the final slab folded without the (otherwise
    # discarded) last ring hop.
    (o, l, m, kc, vc), _ = jax.lax.scan(
        tick, (o0, l0, m0, k, v), None, length=num_shards - 1
    )
    o, l, _ = fold(o, l, m, kc, vc)
    out = o / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mesh: Mesh
) -> jnp.ndarray:
    """Sequence-parallel multi-head attention over the mesh's ``seq`` axis.

    ``q``/``k``/``v``: (B, N, H, D) with N divisible by the ``seq`` axis
    size (and B by the ``data`` axis size when present). Returns the exact
    softmax-attention output ``softmax(q k^T / sqrt(D)) v`` — the ring +
    online softmax change the schedule, not the math.
    """
    sp = int(mesh.shape[SEQ_AXIS])
    assert q.shape[1] % sp == 0, (
        f"token count {q.shape[1]} must divide over {sp} seq shards"
    )
    has_data = DATA_AXIS in mesh.shape
    if has_data:
        dp = int(mesh.shape[DATA_AXIS])
        assert q.shape[0] % dp == 0, (
            f"batch {q.shape[0]} must divide over the {dp}-way data axis"
        )
    batch = DATA_AXIS if has_data else None
    spec = P(batch, SEQ_AXIS, None, None)

    def body(q, k, v):
        return _ring_attention_shard(sp, q, k, v)

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def reference_attention(q, k, v):
    """Plain (unsharded) softmax attention, for equivalence checks."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum(
        "bnhd,bmhd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    a = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", a, v.astype(jnp.float32))
    return out.astype(q.dtype)
