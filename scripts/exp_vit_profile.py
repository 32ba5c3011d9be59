"""Attribute ViT serving time: trunk vs decoder, LayerNorm/softmax share.

The zoo bench (scripts/bench_zoo.py) showed the ViT family is the one that
does NOT gain from int8 — hypothesis: the transformer trunk is bound by the
LayerNorm/softmax VPU chain, not matmul rate. This experiment measures, on
the real chip at the production batch:

  a) full forward            b) patch-embed + transformer trunk only
  c) decoder only            d) full forward with LayerNorm ablated
  e) full forward with softmax ablated      f) both ablated

(d)-(f) monkeypatch flax's ops with identity-ish stand-ins — numerically
nonsense, but the right FLOP/traffic shape for attribution. Results feed the
decision on a fused-attention Pallas kernel (DESIGN.md serving findings).

Run: python scripts/exp_vit_profile.py
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

import flax.linen as nn

from pose_estimation_amitai_tpu.models import vit as vit_mod

HW, BATCH, K_SMALL, K_LARGE = 192, 512, 2, 8
OUT_CH = 18


def marginal_ms(make_run) -> float:
    """ms per batch, marginal between two scan lengths (cancels dispatch)."""
    r_small, r_large = make_run(K_SMALL), make_run(K_LARGE)
    np.asarray(r_small())
    np.asarray(r_large())

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    t_s = min(timed(r_small) for _ in range(3))
    t_l = min(timed(r_large) for _ in range(3))
    return (t_l - t_s) / (K_LARGE - K_SMALL) * 1e3


def scan_runner(forward, x):
    def make(K):
        @jax.jit
        def run(x):
            def body(c, i):
                frames = x * (1.0 + i.astype(x.dtype) * 1e-3)
                out = forward(frames)
                return c, jnp.sum(out.astype(jnp.float32))

            _, out = jax.lax.scan(body, 0, jnp.arange(K))
            return out

        return lambda: run(x)

    return make


def bench_model(model, x, name, results):
    params = model.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]

    def forward(frames):
        return model.apply({"params": params}, frames, train=False)

    ms = marginal_ms(scan_runner(forward, x))
    fps = BATCH / ms * 1e3
    results[name] = round(ms, 2)
    print(json.dumps({"variant": name, "ms_per_batch": round(ms, 2),
                      "samples_per_s": round(fps, 1)}), flush=True)


class TrunkOnly(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        tokens = vit_mod.PatchEmbed(256, 16, dtype=jnp.bfloat16,
                                    name="patch_embed")(x)
        return vit_mod.Transformer(256, 8, 8, 64, 1024, 0.0, jnp.bfloat16,
                                   name="transformer")(tokens, train=train)


class DecoderOnly(nn.Module):
    @nn.compact
    def __call__(self, tokens, *, train=False):
        return vit_mod.CNNDecoderViT(OUT_CH, 256, 3, "torch", jnp.bfloat16,
                                     name="decoder")(tokens)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, HW, HW, 4)), jnp.bfloat16)
    tokens = jnp.asarray(rng.random((BATCH, 144, 256)), jnp.bfloat16)
    results: dict[str, float] = {}

    full = vit_mod.ViTPoseNet(out_channels=OUT_CH, dropout=0.0)
    bench_model(full, x, "full", results)
    bench_model(TrunkOnly(), x, "trunk_only", results)
    bench_model(DecoderOnly(), tokens, "decoder_only", results)

    # --- ablations (numerically nonsense, right cost shape) ---
    orig_ln = nn.LayerNorm.__call__
    orig_sm = nn.softmax

    def fake_ln(self, x):
        # scale-only stand-in: no mean/var reductions, no normalisation
        return x * jnp.float32(0.999)

    def fake_softmax(x, axis=-1, **kw):
        return x * jnp.float32(1e-3)

    try:
        nn.LayerNorm.__call__ = fake_ln
        bench_model(vit_mod.ViTPoseNet(out_channels=OUT_CH, dropout=0.0),
                    x, "no_layernorm", results)
        nn.LayerNorm.__call__ = orig_ln
        nn.softmax = fake_softmax
        vit_mod.nn.softmax = fake_softmax
        bench_model(vit_mod.ViTPoseNet(out_channels=OUT_CH, dropout=0.0),
                    x, "no_softmax", results)
        nn.LayerNorm.__call__ = fake_ln
        bench_model(vit_mod.ViTPoseNet(out_channels=OUT_CH, dropout=0.0),
                    x, "no_ln_no_softmax", results)
    finally:
        nn.LayerNorm.__call__ = orig_ln
        nn.softmax = orig_sm
        vit_mod.nn.softmax = orig_sm

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
