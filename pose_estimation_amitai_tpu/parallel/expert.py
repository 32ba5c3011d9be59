"""Expert parallelism: a mixture-of-experts FFN sharded over an ``expert`` axis.

The reference has no MoE anywhere (SURVEY §2.4: EP n/a), so nothing in the
model zoo *uses* this — it ships so the parallelism surface is complete
(DP/TP/PP/SP/EP) and a sparse trunk is a config away if model capacity ever
needs to grow without growing per-token FLOPs.

TPU-native design:

* expert parameters are **stacked** on a leading ``E`` axis and sharded over
  the mesh's ``expert`` axis — each device owns ``E / ep`` experts in its
  own HBM; the (tiny) gate is replicated.
* routing is **dense dispatch** (the einsum/one-hot formulation): every
  device runs its local experts over the full token set as stacked batched
  matmuls on the MXU, scales by the gate weights (zero for unrouted
  token-expert pairs under top-1 gating), and a single ``psum`` over the
  ``expert`` axis combines. Exact — the output equals the unsharded MoE to
  float tolerance; no capacity factor, no token dropping.
* per-device FLOPs scale as ``E / ep`` — the same win EP gives a
  capacity-routed implementation — while the communication is one psum
  instead of two all_to_alls. The all_to_all token-routing schedule only
  pays off when experts are so large that redundant token compute dominates;
  at that scale swap ``_moe_shard``'s masked matmuls for a
  ``lax.all_to_all`` dispatch without touching the public API.
* composes with data parallelism: the mesh is ``(data, expert)``; batch
  rows shard over ``data``, expert stacks over ``expert``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, make_2d_mesh

EXPERT_AXIS = "expert"


def make_expert_mesh(dp: int, ep: int, devices=None) -> Mesh:
    """A 2-D ``(data, expert)`` mesh (topology-aware device ordering)."""
    return make_2d_mesh(dp, ep, EXPERT_AXIS, devices)


class MoEFeedForward:
    """Top-1-gated MoE FFN (Dense -> GELU -> Dense per expert).

    Drop-in for the transformer FeedForward shape: ``apply(params, x)`` maps
    (B, N, D) tokens -> (B, N, D). ``apply_dense`` is the unsharded
    reference; ``apply`` runs expert-parallel over the mesh.
    """

    def __init__(
        self,
        mesh: Mesh,
        *,
        dim: int,
        hidden_dim: int,
        num_experts: int,
    ):
        self.mesh = mesh
        self.ep = int(mesh.shape[EXPERT_AXIS])
        assert num_experts % self.ep == 0, (
            f"{num_experts} experts must divide over {self.ep} shards"
        )
        self.dim = dim
        self.hidden = hidden_dim
        self.num_experts = num_experts

    # ---------------------------------------------------------------- params
    def init(self, key) -> dict:
        kg, k1, k2 = jax.random.split(key, 3)
        d, h, e = self.dim, self.hidden, self.num_experts
        s1, s2 = (2.0 / d) ** 0.5, (2.0 / h) ** 0.5
        return {
            "gate": jax.random.normal(kg, (d, e), jnp.float32) * d**-0.5,
            "w1": jax.random.normal(k1, (e, d, h), jnp.float32) * s1,
            "b1": jnp.zeros((e, h), jnp.float32),
            "w2": jax.random.normal(k2, (e, h, d), jnp.float32) * s2,
            "b2": jnp.zeros((e, d), jnp.float32),
        }

    def shard_params(self, params: dict) -> dict:
        """Expert stacks split over ``expert``; the gate replicated."""
        repl = NamedSharding(self.mesh, P())
        staged = NamedSharding(self.mesh, P(EXPERT_AXIS))
        out = {"gate": jax.device_put(params["gate"], repl)}
        for k in ("w1", "b1", "w2", "b2"):
            out[k] = jax.device_put(params[k], staged)
        return out

    # --------------------------------------------------------------- compute
    def _gates(self, gate_w, x):
        """Top-1 gate weights (B, N, E): softmax prob at the argmax expert."""
        logits = jnp.einsum("bnd,de->bne", x, gate_w)
        probs = jax.nn.softmax(logits, axis=-1)
        top = jnp.argmax(logits, axis=-1)
        hot = jax.nn.one_hot(top, self.num_experts, dtype=probs.dtype)
        return probs * hot

    def _expert_ffn(self, w1, b1, w2, b2, x):
        """All local experts over all tokens: (le, ...) stacked matmuls."""
        h = jnp.einsum("bnd,edh->ebnh", x, w1) + b1[:, None, None, :]
        h = jax.nn.gelu(h)
        return jnp.einsum("ebnh,ehd->ebnd", h, w2) + b2[:, None, None, :]

    def _moe_shard(self, gate_w, w1, b1, w2, b2, x):
        le = self.num_experts // self.ep
        idx = jax.lax.axis_index(EXPERT_AXIS)
        gates = self._gates(gate_w, x)  # (B, N, E) — full gate, local slice
        local = jax.lax.dynamic_slice_in_dim(gates, idx * le, le, axis=-1)
        y = self._expert_ffn(w1, b1, w2, b2, x)  # (le, B, N, D)
        out = jnp.einsum("bne,ebnd->bnd", local, y)
        return jax.lax.psum(out, EXPERT_AXIS)

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """Expert-parallel forward over the mesh. x: (B, N, D)."""
        has_data = DATA_AXIS in self.mesh.shape
        if has_data:
            dp = int(self.mesh.shape[DATA_AXIS])
            assert x.shape[0] % dp == 0, (
                f"batch {x.shape[0]} must divide over the {dp}-way data axis"
            )
        batch = DATA_AXIS if has_data else None
        tok = P(batch, None, None)
        stk = P(EXPERT_AXIS)
        fn = jax.shard_map(
            self._moe_shard,
            mesh=self.mesh,
            in_specs=(P(), stk, stk, stk, stk, tok),
            out_specs=tok,
            check_vma=False,
        )
        return fn(
            params["gate"], params["w1"], params["b1"], params["w2"],
            params["b2"], x,
        )

    def apply_dense(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """Unsharded reference: identical math on one device."""
        gates = self._gates(params["gate"], x)
        y = self._expert_ffn(
            params["w1"], params["b1"], params["w2"], params["b2"], x
        )
        return jnp.einsum("bne,ebnd->bnd", gates, y)
