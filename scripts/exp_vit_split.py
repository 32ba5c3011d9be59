"""Split timing of the production ViT serving path (fast_softmax engaged):
full vs trunk-only vs decoder-only — at the PRODUCTION dim_head=256 config
(the round-3 profile ran a dim_head=64 build; the split moved).

Run: python scripts/exp_vit_split.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.models import build_model
from pose_estimation_amitai_tpu.models.vit import (
    CNNDecoderViT,
    PatchEmbed,
    Transformer,
    ViTPoseNet,
)
from pose_estimation_amitai_tpu.ops import peaks

HW, BATCH, K_SMALL, K_LARGE = 192, 512, 2, 8


def marginal_ms(forward, *args) -> float:
    def make(K):
        @jax.jit
        def run(*a):
            def body(c, i):
                out = forward(*(x * (1.0 + i.astype(x.dtype) * 1e-3)
                                for x in a))
                leaves = jax.tree_util.tree_leaves(out)
                m = jnp.stack([
                    jnp.max(jnp.abs(
                        (v[:, ::16, ::16] if v.ndim == 4 else v)
                        .astype(jnp.float32)))
                    for v in leaves
                ]).sum()
                return jnp.maximum(c, m), 0

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return c

        return lambda: run(*args)

    r_s, r_l = make(K_SMALL), make(K_LARGE)
    np.asarray(r_s()), np.asarray(r_l())

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    t_s = min(timed(r_s) for _ in range(3))
    t_l = min(timed(r_l) for _ in range(3))
    return (t_l - t_s) / (K_LARGE - K_SMALL) * 1e3


def main() -> None:
    np.asarray(jnp.zeros(()) + 1)
    cfg = Config(model_type=C.MODEL_18_POINTS_PER_WING_VIT,
                 dropout_ratio=0.0)
    model = build_model(cfg, (HW, HW, 4), 18)
    model = model.clone(normalize_output=False, fast_softmax=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, HW, HW, 4)), jnp.bfloat16)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, HW, HW, 4), jnp.bfloat16),
                           train=False)
    variables = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), variables)
    params = variables["params"]

    d = model.dim
    embed = PatchEmbed(d, model.patch_size, post_norm=True,
                       dtype=jnp.bfloat16)
    trunk = Transformer(d, model.depth, model.heads, model.dim_head,
                        d * model.mlp_expand, 0.0, jnp.bfloat16,
                        fast_softmax=True)
    dec = CNNDecoderViT(18, d, model.kernel_size, "torch", jnp.bfloat16,
                        normalize_output=False)

    def full(frames):
        return peaks.find_peaks_with_vals(
            model.apply(variables, frames, train=False))

    def trunk_only(frames):
        t = embed.apply({"params": params["patch_embed"]}, frames)
        return trunk.apply({"params": params["transformer"]}, t,
                           train=False)

    n = (HW // model.patch_size) ** 2
    tokens = jnp.asarray(rng.standard_normal((BATCH, n, d)), jnp.bfloat16)

    def dec_only(tk):
        return dec.apply({"params": params["decoder"]}, tk)

    for name, fwd, args in (("full+decode", full, (x,)),
                            ("trunk", trunk_only, (x,)),
                            ("decoder", dec_only, (tokens,))):
        ms = marginal_ms(fwd, *args)
        print(json.dumps({
            "variant": name, "ms_per_batch": round(ms, 2),
            "samples_per_s": round(BATCH / ms * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
