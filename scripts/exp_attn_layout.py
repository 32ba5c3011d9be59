"""ViT trunk micro-variants at the production config (dim=256, heads=8,
dim_head=256, N=144, B=512) — hunting the last ~1.5% to the 5k line.

The split timing (exp_vit_split.py) puts the trunk at 79 of 99.7 ms/batch
while achieving only ~25% of bf16 MXU peak -> the trunk is bound by
intermediate-tensor traffic (qkv splits, logits, LN streams), not matmuls.
Variants (exact math, serving-only candidates):

  base      — the shipped fast_softmax block
  ln_bf16   — LayerNorms computed in bf16 (stats at ~0.4% rel err)
  h_last    — attention einsums with heads INNERMOST (bnmh logits), so
              q/k/v slices feed dot_general without bhnd input transposes
  both      — ln_bf16 + h_last

Run: python scripts/exp_attn_layout.py
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

B, N, DIM, HEADS, DH, MLP = 512, 144, 256, 8, 256, 1024
DEPTH = 8
K_SMALL, K_LARGE = 2, 8


def make_params(rng):
    def mat(i, o):
        return jnp.asarray(rng.normal(0, 0.02, (i, o)), jnp.float32)

    inner = HEADS * DH
    blocks = []
    for _ in range(DEPTH):
        blocks.append({
            "ln1": (jnp.ones((DIM,)), jnp.zeros((DIM,))),
            "qkv": mat(DIM, 3 * inner),
            "out": mat(inner, DIM),
            "ln2": (jnp.ones((DIM,)), jnp.zeros((DIM,))),
            "fc1": mat(DIM, MLP), "fc2": mat(MLP, DIM),
        })
    final = (jnp.ones((DIM,)), jnp.zeros((DIM,)))
    return blocks, final


def ln(x, g, b, dtype):
    xf = x.astype(dtype)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + b).astype(
        jnp.bfloat16)


def block(x, p, ln_dtype, h_last):
    inner = HEADS * DH
    y = ln(x, p["ln1"][0], p["ln1"][1], ln_dtype)
    qkv = (y @ p["qkv"].astype(jnp.bfloat16))
    qkv = qkv.reshape(B, N, 3, HEADS, DH)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = jnp.asarray(DH ** -0.5, jnp.bfloat16)
    q = q * scale
    if h_last:
        logits = jnp.einsum("bnhd,bmhd->bnmh", q, k)
        m = jnp.max(logits, axis=2, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=2, keepdims=True, dtype=jnp.float32)
        attn = (e.astype(jnp.float32) / s).astype(jnp.bfloat16)
        o = jnp.einsum("bnmh,bmhd->bnhd", attn, v)
    else:
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        attn = (e.astype(jnp.float32) / s).astype(jnp.bfloat16)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
    x = x + (o.reshape(B, N, inner) @ p["out"].astype(jnp.bfloat16))
    y = ln(x, p["ln2"][0], p["ln2"][1], ln_dtype)
    y = jax.nn.gelu(y @ p["fc1"].astype(jnp.bfloat16))
    return x + (y @ p["fc2"].astype(jnp.bfloat16))


def trunk(x, params, ln_dtype, h_last):
    blocks, final = params
    for p in blocks:
        x = block(x, p, ln_dtype, h_last)
    return ln(x, final[0], final[1], ln_dtype)


def marginal_ms(fwd, x) -> float:
    def make(K):
        @jax.jit
        def run(x):
            def body(c, i):
                out = fwd(x * (1.0 + i.astype(x.dtype) * 1e-3))
                return jnp.maximum(c, jnp.max(jnp.abs(
                    out.astype(jnp.float32)))), 0

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return c

        return lambda: run(x)

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
    rng = np.random.default_rng(0)
    params = make_params(rng)
    x = jnp.asarray(rng.standard_normal((B, N, DIM)), jnp.bfloat16)

    variants = (
        ("base", jnp.float32, False),
        ("ln_bf16", jnp.bfloat16, False),
        ("h_last", jnp.float32, True),
        ("both", jnp.bfloat16, True),
    )
    outs = {}
    for name, ln_dtype, h_last in variants:
        fwd = lambda x, d=ln_dtype, h=h_last: trunk(x, params, d, h)
        ms = marginal_ms(fwd, x)
        outs[name] = ms
        print(json.dumps({"variant": name, "ms_per_batch": round(ms, 2)}),
              flush=True)
    # numerics: h_last must be bitwise-equivalent math; ln_bf16 approximate
    o_base = trunk(x, params, jnp.float32, False)
    for name, ln_dtype, h_last in variants[1:]:
        o = trunk(x, params, ln_dtype, h_last)
        diff = float(jnp.max(jnp.abs(
            o.astype(jnp.float32) - o_base.astype(jnp.float32))))
        print(json.dumps({"variant": name, "maxdiff_vs_base": diff}),
              flush=True)


if __name__ == "__main__":
    main()
