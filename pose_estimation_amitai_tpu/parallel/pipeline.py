"""Pipeline parallelism (GPipe schedule) over the ViT transformer trunk.

The reference workload never needs PP — its largest model is ~10^7 params on
one GPU (SURVEY §2.4 lists PP as absent). The rebuild still ships a real,
tested implementation so the parallelism surface is complete and the design
scales past single-chip HBM if model sizes ever grow: the transformer trunk
of the ViT family (models/vit.py, reference pytorch/pytorch_vit_encoder.py:
81-105) is a stack of L homogeneous pre-LN blocks — the textbook pipeline
shape.

TPU-native design (the scaling-book recipe, not an NCCL send/recv port):

* block parameters are **stacked** on a leading layer axis and sharded over
  the mesh's ``pipe`` axis — each stage owns ``L / S`` consecutive blocks in
  its own HBM; embedding/decoder stay replicated (they are tiny). Note the
  memory that shards is the trunk's params + optimizer state (the dominant
  cost for the deep trunks PP targets); the microbatch activation stream
  itself rides in replicated over ``pipe`` — a production placement that
  pins embed to stage 0 and decoder to stage S-1 would shard that too, at
  the cost of losing the plain replicated outer modules this design keeps.
* the schedule runs inside one ``jax.shard_map`` region: a ``lax.scan`` over
  ``M + S - 1`` ticks where every stage applies its local blocks (an inner
  ``lax.scan`` over the stacked leaf axis — one compiled block body, not L
  unrolled copies) and hands its activation to the next stage with a single
  ``lax.ppermute`` ring step riding ICI.
* the bubble is the standard GPipe ``(S-1)/(M+S-1)`` fraction; choose
  ``num_microbatches >= S`` to amortise.
* backward needs no hand-written schedule: ``ppermute`` has a transpose
  (the reversed ring), so ``jax.grad`` through the shard_mapped trunk yields
  the reverse pipeline automatically and XLA overlaps the transfers.
* composes with data parallelism: the mesh is ``(data, pipe)``; microbatch
  rows are sharded over ``data``, block stacks over ``pipe``.

Dropout inside the pipelined trunk is deterministic-off: PP targets
large-model serving/training where the ViT family here uses dropout 0.0
(reference default, pytorch/VITs.py:197-229).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vit import Attention, CNNDecoderViT, FeedForward, PatchEmbed
from .mesh import DATA_AXIS, make_2d_mesh

PIPE_AXIS = "pipe"

from flax import linen as nn


class PipelineBlock(nn.Module):
    """One pre-LN transformer block (attention + MLP, residual both).

    Identical math to one loop iteration of models.vit.Transformer
    (reference: pytorch/pytorch_vit_encoder.py:81-105); factored out so L
    block param sets can be stacked on a leading axis and sharded over the
    ``pipe`` mesh axis.
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 1024
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Attention(self.dim, self.heads, self.dim_head, 0.0, self.dtype,
                      name="attn")(x, train=False) + x
        x = FeedForward(self.dim, self.mlp_dim, 0.0, self.dtype,
                        name="ff")(x, train=False) + x
        return x


def make_pipeline_mesh(dp: int, pp: int, devices=None) -> Mesh:
    """A 2-D ``(data, pipe)`` mesh: DP over ICI rows, PP ring over columns.

    Topology-aware (parallel.mesh._device_grid): on real TPU slices the
    ``pipe`` ring hops are physical ICI neighbours.
    """
    return make_2d_mesh(dp, pp, PIPE_AXIS, devices)


class PipelinedViT:
    """ViT heatmap model with its transformer trunk pipelined over stages.

    Same architecture as models.vit.ViTPoseNet (patch embed -> L pre-LN
    blocks -> final LN -> 4-deconv CNN decoder, reference pytorch/VITs.py:
    197-229) with the block stack executed as a GPipe pipeline over the
    mesh's ``pipe`` axis.
    """

    def __init__(
        self,
        mesh: Mesh,
        *,
        image_hw: int = 192,
        in_channels: int = 4,
        out_channels: int = 18,
        patch_size: int = 16,
        dim: int = 256,
        depth: int = 8,
        heads: int = 8,
        dim_head: int = 64,
        mlp_expand: int = 4,
        kernel_size: int = 3,
        num_microbatches: int | None = None,
        flavor: str = "torch",
        dtype: Any = jnp.bfloat16,
    ):
        self.mesh = mesh
        self.stages = int(mesh.shape[PIPE_AXIS])
        assert depth % self.stages == 0, (
            f"depth {depth} must divide into {self.stages} pipeline stages"
        )
        self.depth = depth
        if num_microbatches is None:
            num_microbatches = self.stages
        assert num_microbatches >= 1, (
            f"num_microbatches must be >= 1, got {num_microbatches}"
        )
        self.num_microbatches = int(num_microbatches)
        self.image_hw = image_hw
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.dim = dim
        self.grid = image_hw // patch_size
        self.tokens = self.grid * self.grid
        # PP stages are pre-LN PipelineBlocks — the torch flavour's trunk;
        # the tf flavour's post-LN blocks are not staged (use plain
        # ViTPoseNet for tf-parity runs)
        assert flavor == "torch", (
            f"pipeline parallelism supports the torch ViT flavour, got "
            f"{flavor!r}"
        )
        self.embed = PatchEmbed(dim, patch_size, post_norm=True, dtype=dtype)
        self.block = PipelineBlock(dim, heads, dim_head, dim * mlp_expand,
                                   dtype)
        self.final_norm = nn.LayerNorm(dtype=jnp.float32)
        self.decoder = CNNDecoderViT(out_channels, dim, kernel_size, flavor,
                                     dtype)
        self.dtype = dtype

    # ---------------------------------------------------------------- init
    def init(self, key) -> dict:
        """Initialise params; block leaves stacked (L, ...) over layers."""
        k_embed, k_blocks, k_norm, k_dec = jax.random.split(key, 4)
        x = jnp.zeros((1, self.image_hw, self.image_hw, self.in_channels),
                      jnp.float32)
        embed_p = self.embed.init(k_embed, x)["params"]
        tok = jnp.zeros((1, self.tokens, self.dim), self.dtype)
        block_keys = jax.random.split(k_blocks, self.depth)
        blocks_p = jax.vmap(
            lambda k: self.block.init(k, tok)["params"]
        )(block_keys)
        norm_p = self.final_norm.init(k_norm, tok.astype(jnp.float32))[
            "params"
        ]
        dec_p = self.decoder.init(k_dec, tok)["params"]
        return {
            "embed": embed_p,
            "blocks": blocks_p,
            "final_norm": norm_p,
            "decoder": dec_p,
        }

    def shard_params(self, params: dict) -> dict:
        """Place params: block stacks split over ``pipe``, rest replicated."""
        repl = NamedSharding(self.mesh, P())
        staged = NamedSharding(self.mesh, P(PIPE_AXIS))
        out = {
            k: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), params[k]
            )
            for k in ("embed", "final_norm", "decoder")
        }
        out["blocks"] = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, staged), params["blocks"]
        )
        return out

    # ------------------------------------------------------------- pipeline
    def _apply_local_blocks(self, local_blocks, x):
        """Scan this stage's (L/S, ...) block stack over one activation."""

        def body(h, bp):
            return self.block.apply({"params": bp}, h), None

        y, _ = jax.lax.scan(body, x, local_blocks)
        return y

    def _trunk_shardmapped(self, blocks, toks):
        """GPipe schedule. toks: (M, mb, N, D) microbatch stream.

        Per (data, pipe) shard: local blocks (L/S, ...), toks
        (M, mb/dp, N, D). Stage 0 ingests microbatch ``t`` at tick ``t``;
        stage ``k`` processes microbatch ``t - k``; the last stage emits
        microbatch ``t - (S-1)``. One ppermute ring step per tick.
        """
        S = self.stages
        M = toks.shape[0]
        T = M + S - 1
        idx = jax.lax.axis_index(PIPE_AXIS)
        ring = [(i, (i + 1) % S) for i in range(S)]
        zero = jnp.zeros(toks.shape[1:], toks.dtype)

        def compute(state, t):
            inp = jax.lax.dynamic_index_in_dim(
                toks, jnp.minimum(t, M - 1), 0, keepdims=False
            )
            x = jnp.where(idx == 0, inp, state)
            y = self._apply_local_blocks(blocks, x)
            out = jnp.where(idx == S - 1, y, jnp.zeros_like(y))
            return y, out

        def tick(state, t):
            y, out = compute(state, t)
            nxt = jax.lax.ppermute(y, PIPE_AXIS, ring)
            return nxt, out

        # T-1 ring ticks, then the final tick without the (otherwise
        # discarded) ring hop — saves one ICI hop per call and its
        # transpose in backward.
        state, outs = jax.lax.scan(tick, zero, jnp.arange(T - 1))
        _, last = compute(state, jnp.asarray(T - 1))
        outs = jnp.concatenate([outs, last[None]], axis=0)
        # outs[S-1 + j] holds microbatch j on the last stage, zeros elsewhere;
        # psum broadcasts it to every stage (transpose = identity partition,
        # so grads flow straight back into the reverse pipeline).
        outs = jax.lax.psum(outs[S - 1 :], PIPE_AXIS)
        return outs

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """Full forward: embed -> pipelined trunk -> final LN -> decoder.

        ``x``: (B, H, W, C) with B divisible by num_microbatches.
        """
        M = self.num_microbatches
        b = x.shape[0]
        assert b % M == 0, f"batch {b} must divide into {M} microbatches"
        dp = int(self.mesh.shape[DATA_AXIS])
        assert (b // M) % dp == 0, (
            f"microbatch size {b // M} (batch {b} / {M} microbatches) must "
            f"divide over the {dp}-way data axis"
        )
        tokens = self.embed.apply({"params": params["embed"]}, x)
        toks = tokens.reshape(M, b // M, self.tokens, self.dim)

        trunk = jax.shard_map(
            self._trunk_shardmapped,
            mesh=self.mesh,
            in_specs=(P(PIPE_AXIS), P(None, DATA_AXIS, None, None)),
            out_specs=P(None, DATA_AXIS, None, None),
            check_vma=False,
        )
        y = trunk(params["blocks"], toks).reshape(b, self.tokens, self.dim)
        y = self.final_norm.apply(
            {"params": params["final_norm"]}, y.astype(jnp.float32)
        )
        return self.decoder.apply({"params": params["decoder"]}, y)

    def apply_sequential(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """Reference forward without the pipeline (same params/math)."""
        tokens = self.embed.apply({"params": params["embed"]}, x)
        y = self._apply_local_blocks(params["blocks"], tokens)
        y = self.final_norm.apply(
            {"params": params["final_norm"]}, y.astype(jnp.float32)
        )
        return self.decoder.apply({"params": params["decoder"]}, y)


def pipeline_params_to_vit(params: dict) -> dict:
    """Convert a pipelined checkpoint to the ViTPoseNet param layout.

    The pipelined model stacks block params on a leading layer axis under
    ``blocks`` (init above); ViTPoseNet (models/vit.py) names them
    ``transformer/attn{i}``/``ff{i}``. Same architecture, same math — this
    is pure tree rearrangement, so PP-trained checkpoints serve through the
    standard inference/export path (infer.Predictor detects the layout).
    """
    leaves = jax.tree_util.tree_leaves(params["blocks"])
    depth = int(leaves[0].shape[0])
    transformer: dict = {}
    for i in range(depth):
        for name in ("attn", "ff"):
            transformer[f"{name}{i}"] = jax.tree_util.tree_map(
                lambda x: x[i], params["blocks"][name]
            )
    transformer["final_norm"] = params["final_norm"]
    return {
        "patch_embed": params["embed"],
        "transformer": transformer,
        "decoder": params["decoder"],
    }


def vit_params_to_pipeline(params: dict, depth: int) -> dict:
    """Inverse of :func:`pipeline_params_to_vit`.

    Stacks a ViTPoseNet checkpoint's per-layer block params so a
    single-chip-trained model can continue training pipelined.
    """
    t = params["transformer"]
    blocks = {
        name: jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[t[f"{name}{i}"] for i in range(depth)],
        )
        for name in ("attn", "ff")
    }
    return {
        "embed": params["patch_embed"],
        "blocks": blocks,
        "final_norm": t["final_norm"],
        "decoder": params["decoder"],
    }


class PipelinedViTFlax:
    """Flax-signature facade over :class:`PipelinedViT`.

    Exposes ``init(rngs, x, train=...)`` / ``apply(variables, x, ...)`` so the
    generic training machinery (train/loop.py create_train_state +
    make_eval_step, parallel/sharded.py make_sharded_train_step, the
    trainer's viz/decode paths) drives the pipelined model unchanged —
    pipeline parallelism becomes a Trainer config knob (``pipeline_stages``)
    instead of a separate code path.

    Batches whose size doesn't divide into ``num_microbatches x dp`` (e.g.
    the trailing val batch) fall back to the numerically-identical
    sequential forward; staged params are gathered by GSPMD for that call.
    Dropout inside the trunk is deterministic-off (see module docstring),
    so the ``rngs``/``train`` arguments are accepted and ignored.
    """

    def __init__(self, pipe: PipelinedViT):
        self.pipe = pipe

    def init(self, rngs, x, *, train: bool = False) -> dict:
        del train
        key = rngs["params"] if isinstance(rngs, dict) else rngs
        assert x.shape[1] == self.pipe.image_hw and (
            x.shape[-1] == self.pipe.in_channels
        ), (
            f"sample batch {x.shape} does not match the pipelined model "
            f"({self.pipe.image_hw}px, {self.pipe.in_channels}ch)"
        )
        return {"params": self.pipe.init(key)}

    def apply(self, variables: dict, x: jnp.ndarray, *, train: bool = False,
              rngs=None, mutable=None, **_) -> jnp.ndarray:
        del train, rngs
        params = variables["params"]
        M = self.pipe.num_microbatches
        dp = int(self.pipe.mesh.shape[DATA_AXIS])
        if x.shape[0] % (M * dp) == 0:
            out = self.pipe.apply(params, x)
        else:
            out = self.pipe.apply_sequential(params, x)
        return (out, {}) if mutable else out


def shard_state_pp(mesh: Mesh, state, cfg=None):
    """Place a TrainState for (data, pipe) training.

    Block stacks (and their Adam moments — ``optax.tree_map_params``) shard
    their leading layer axis over ``pipe``; embed/final_norm/decoder and
    everything else replicate. The result feeds the unchanged
    :func:`..parallel.sharded.make_sharded_train_step`.
    """
    from ..train.loop import create_optimizer

    repl = NamedSharding(mesh, P())
    staged = NamedSharding(mesh, P(PIPE_AXIS))

    def specs_of(params: dict) -> dict:
        return {
            k: jax.tree_util.tree_map(
                lambda _: staged if k == "blocks" else repl, sub
            )
            for k, sub in params.items()
        }

    specs = specs_of(state.params)
    put = lambda x, s: jax.device_put(x, s)
    params = jax.tree_util.tree_map(put, state.params, specs)

    if cfg is not None:
        tx = create_optimizer(cfg)
        opt_state = optax.tree_map_params(
            tx, put, state.opt_state, specs,
            transform_non_params=lambda x: jax.device_put(x, repl),
        )
    else:
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state.opt_state
        )

    return state.replace(
        step=jax.device_put(state.step, repl),
        params=params,
        opt_state=opt_state,
        batch_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state.batch_stats
        ),
        rng=jax.device_put(state.rng, repl),
    )


def make_pipelined_train_step(model: PipelinedViT, learning_rate: float = 1e-3):
    """Jitted MSE train step through the pipelined forward.

    Returns ``(tx, step)`` where ``step(params, opt_state, batch) ->
    (params, opt_state, loss)``; gradients of the staged block stacks stay
    sharded over ``pipe`` (Adam is elementwise, so moments follow), the
    embed/decoder grads are replicated — XLA inserts the DP psum and the
    reverse-pipeline ppermutes from the forward's structure.
    """
    tx = optax.adam(learning_rate)

    def loss_fn(params, images, confmaps):
        pred = model.apply(params, images)
        return jnp.mean((pred.astype(jnp.float32) - confmaps) ** 2)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, batch["image"], batch["confmaps"]
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, step
