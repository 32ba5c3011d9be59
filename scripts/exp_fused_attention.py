"""Fused-attention Pallas kernel experiment for the ViT serving trunk.

exp_vit_profile.py attribution (v5e, batch 512): the softmax chain costs
~14 ms/batch at dim_head=64 and the materialised (B, H, 144, 144) f32
logits + bf16 attn tensors round-trip ~1 GB of HBM per layer. At the
production config (dim_head = projection_dim = 256 — reference semantics
pytorch/VITs.py:212) the q/k/v tensors are 4x fatter still. The 144-token
sequence fits VMEM whole, so a fused kernel needs no online-softmax tiling:

    per (batch, head):  logits = q @ k^T * scale   (MXU, f32 accum)
                        attn   = softmax(logits)    (VPU, in VMEM)
                        out    = attn @ v           (MXU)

Grid tiles the fused (B*H) axis. Known Mosaic constraint from
ops/pallas_conv.py: chained dot_generals must consume slices of *Refs* —
the attn matrix bounces through a VMEM scratch ref between the two dots.

Run: python scripts/exp_fused_attention.py [--cpu]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, attn_scratch, *, scale):
    """One grid step: GB fused (batch*head) rows of full 144-token attention.

    Block shapes: q/k/v/o (GB, N, D); scratch (N, N) f32.
    """
    gb = q_ref.shape[0]
    for g in range(gb):  # static unroll over the block's heads
        logits = jax.lax.dot_general(
            q_ref[g], k_ref[g],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        attn_scratch[:] = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[g] = jax.lax.dot_general(
            attn_scratch[:].astype(q_ref.dtype), v_ref[g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("gb", "interpret"))
def fused_attention(q, k, v, gb: int = 8, interpret: bool = False):
    """q, k, v: (G, N, D) with G = batch*heads fused. Returns (G, N, D)."""
    g, n, d = q.shape
    assert g % gb == 0, (g, gb)
    scale = d**-0.5
    spec = pl.BlockSpec((gb, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((g, n, d), q.dtype),
        grid=(g // gb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        interpret=interpret,
    )(q, k, v)


def reference_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("gnd,gmd->gnm", q, k).astype(jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("gnm,gmd->gnd", attn, v)


def marginal_ms(make_run, k_small=2, k_large=8):
    r_s, r_l = make_run(k_small), make_run(k_large)
    np.asarray(r_s())
    np.asarray(r_l())

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    t_s = min(timed(r_s) for _ in range(3))
    t_l = min(timed(r_l) for _ in range(3))
    return (t_l - t_s) / (k_large - k_small) * 1e3


def scan_runner(fn, q, k, v):
    def make(K):
        @jax.jit
        def run(q, k, v):
            def body(c, i):
                qq = q * (1.0 + i.astype(q.dtype) * 1e-3)
                return c, jnp.sum(fn(qq, k, v).astype(jnp.float32))

            _, out = jax.lax.scan(body, 0, jnp.arange(K))
            return out

        return lambda: run(q, k, v)

    return make


def main():
    on_cpu = "--cpu" in sys.argv
    rng = np.random.default_rng(0)

    # correctness (small, interpret on CPU / compiled on TPU)
    qs, ks, vs = (
        jnp.asarray(rng.standard_normal((16, 144, 64)), jnp.bfloat16)
        for _ in range(3)
    )
    got = fused_attention(qs, ks, vs, gb=8, interpret=on_cpu)
    ref = reference_attention(qs, ks, vs)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    print(json.dumps({"check": "small", "maxdiff": err}), flush=True)
    assert err < 0.02, err
    if on_cpu:
        print("CPU interpret OK; run without --cpu on the chip for perf")
        return

    # perf at the two production shapes: dim_head 64 and 256, B=512 H=8
    for d in (64, 256):
        g = 512 * 8
        q, k, v = (
            jnp.asarray(rng.standard_normal((g, 144, d)), jnp.bfloat16)
            for _ in range(3)
        )
        ms_ref = marginal_ms(scan_runner(reference_attention, q, k, v))
        out = {"d": d, "xla_ms": round(ms_ref, 2)}
        for gb in (4, 8, 16):
            try:
                f = functools.partial(fused_attention, gb=gb)
                err = float(jnp.max(jnp.abs(
                    f(q[:64], k[:64], v[:64]).astype(jnp.float32)
                    - reference_attention(q[:64], k[:64], v[:64])
                    .astype(jnp.float32))))
                ms = marginal_ms(scan_runner(f, q, k, v))
                out[f"pallas_gb{gb}_ms"] = round(ms, 2)
                out[f"pallas_gb{gb}_maxdiff"] = round(err, 5)
            except Exception as e:  # noqa: BLE001 - experiment surface
                out[f"pallas_gb{gb}_error"] = repr(e)[:160]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
