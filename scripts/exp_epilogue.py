"""int8-resident epilogue cost experiment.

exp_stage1.py established that stage-1's quant epilogues (dequant + leaky +
requant + residual chains between the convs) cost ~2.3x the convs
themselves at B=256 — far above their HBM-traffic share (the fusion reads
the int32 conv output + an int8 skip and writes int8: ~6B/elt vs the conv's
~5B/elt). Hypothesis: the epilogue fusions are VPU-compute-bound on the
~10-op f32 chain (casts, fma, leaky, round, clip). This measures cheaper
formulations of the SAME math on the real resident-forward stage-1
structure (models/quantized.py make_quantized_resident_forward):

  a. ep_f32      — the shipping epilogue verbatim (f32 math, bf16 scale hop)
  b. ep_bf16     — the whole epilogue computed in bf16 (ints <= 256 are
                   exact in bf16, so round/clip at int8 range is lossless;
                   the fma/leaky picks up 8-bit-mantissa noise ~0.4% rel)
  c. ep_select   — requant(leaky(dequant(z))) folded to a single two-affine
                   select on the raw int32 z: leaky is piecewise-linear, so
                   y = select(z > t, z*s1 + c1, z*s2 + c2) with
                   t = -bias/mult precomputed; f32 math
  d. ep_select_b — the select form in bf16
  e. convs_only  — the three convs with bare int8 casts (epilogue floor)

Timing: K-batch lax.scan, marginal rate between two K values (bench.py
methodology). Run on the real chip: python scripts/exp_epilogue.py
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

B = 256
HW = 192
K_SMALL, K_LARGE = 2, 10
ALPHA = 0.1


def marginal_us_per_frame(make_run):
    r_s, r_l = make_run(K_SMALL), make_run(K_LARGE)
    np.asarray(r_s())
    np.asarray(r_l())

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    t_s = min(timed(r_s) for _ in range(3))
    t_l = min(timed(r_l) for _ in range(3))
    frames = (K_LARGE - K_SMALL) * B
    return (t_l - t_s) / frames * 1e6


def scan_program(step):
    def make(K):
        @jax.jit
        def run(x):
            def body(c, i):
                y = step(x + (i % 2).astype(jnp.int8))
                return c, jnp.sum(y.astype(jnp.float32))

            _, out = jax.lax.scan(body, 0, jnp.arange(K))
            return out

        rngx = np.random.default_rng(0)
        x = jnp.asarray(rngx.integers(-80, 80, (B, HW, HW, 4)), jnp.int8)
        return lambda: run(x)

    return make


def main():
    rng = np.random.default_rng(0)

    def w8(*shape):
        return jnp.asarray(rng.integers(-90, 90, shape), jnp.int8)

    ws = [w8(3, 3, 4, 64), w8(3, 3, 64, 64), w8(3, 3, 64, 64)]
    mult = jnp.float32(2e-4)
    bias = jnp.asarray(rng.normal(0, 0.02, 64), jnp.float32)
    inv = jnp.float32(37.0)  # 1/s_x of the next layer
    s_x = jnp.float32(1.0 / 37.0)
    dn = ("NHWC", "HWIO", "NHWC")
    conv2d = functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1), padding="SAME", dimension_numbers=dn,
        rhs_dilation=(2, 2), preferred_element_type=jnp.int32,
    )
    pool = lambda q: jax.lax.reduce_window(
        q, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )

    # --- a. shipping epilogue (models/quantized.py verbatim structure) ---
    def leaky_f32(v):
        return jnp.where(v >= 0, v, v * jnp.float32(ALPHA))

    def quant_f32(v):
        return jnp.clip(
            jnp.round((v.astype(jnp.bfloat16) * inv.astype(jnp.bfloat16))
                      .astype(jnp.float32)), -127, 127
        ).astype(jnp.int8)

    def ep_f32(x):
        z1 = conv2d(x, ws[0]).astype(jnp.float32) * mult + bias
        q1 = quant_f32(leaky_f32(z1))
        z2 = conv2d(q1, ws[1]).astype(jnp.float32) * mult + bias
        x2 = leaky_f32(z2) + q1.astype(jnp.float32) * s_x
        q2 = quant_f32(x2)
        z3 = conv2d(q2, ws[2]).astype(jnp.float32) * mult + bias
        x3 = leaky_f32(z3) + q2.astype(jnp.float32) * s_x
        return pool(quant_f32(leaky_f32(x3)))

    # --- b. the same chain entirely in bf16 ---
    mult_b, bias_b = mult.astype(jnp.bfloat16), bias.astype(jnp.bfloat16)
    inv_b, s_x_b = inv.astype(jnp.bfloat16), s_x.astype(jnp.bfloat16)

    def leaky_b(v):
        return jnp.where(v >= 0, v, v * jnp.bfloat16(ALPHA))

    def quant_b(v):
        return jnp.clip(jnp.round(v * inv_b), -127, 127).astype(jnp.int8)

    def ep_bf16(x):
        z1 = conv2d(x, ws[0]).astype(jnp.bfloat16) * mult_b + bias_b
        q1 = quant_b(leaky_b(z1))
        z2 = conv2d(q1, ws[1]).astype(jnp.bfloat16) * mult_b + bias_b
        x2 = leaky_b(z2) + q1.astype(jnp.bfloat16) * s_x_b
        q2 = quant_b(x2)
        z3 = conv2d(q2, ws[2]).astype(jnp.bfloat16) * mult_b + bias_b
        x3 = leaky_b(z3) + q2.astype(jnp.bfloat16) * s_x_b
        return pool(quant_b(leaky_b(x3)))

    # --- c. two-affine select on raw int32 (no-residual layers only; the
    # residual layers keep the f32 add but skip the separate leaky pass) ---
    # requant(leaky(z*m+b)) = select(zf > t, zf*s1 + c1, zf*(a*s1) + a*c1)
    t_thr = -bias / mult  # per-channel threshold in conv-output units
    s1 = mult * inv
    c1 = bias * inv

    def fold_first(z):
        zf = z.astype(jnp.float32)
        y = jnp.where(
            zf > t_thr, zf * s1 + c1,
            zf * (s1 * ALPHA) + c1 * ALPHA,
        )
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    def ep_select(x):
        q1 = fold_first(conv2d(x, ws[0]))
        z2 = conv2d(q1, ws[1]).astype(jnp.float32)
        # residual layer: leaky(z*m+b) + q1*s_x, then requant — fold the
        # two linear pieces of leaky into the select, keep one add
        y2 = jnp.where(z2 > t_thr, z2 * s1 + c1,
                       z2 * (s1 * ALPHA) + c1 * ALPHA)
        q2 = jnp.clip(
            jnp.round(y2 + q1.astype(jnp.float32) * (s_x * inv)), -127, 127
        ).astype(jnp.int8)
        z3 = conv2d(q2, ws[2]).astype(jnp.float32)
        y3 = jnp.where(z3 > t_thr, z3 * s1 + c1,
                       z3 * (s1 * ALPHA) + c1 * ALPHA)
        y3 = y3 + q2.astype(jnp.float32) * (s_x * inv)
        # final leaky before pool operates on the already-requant-scaled y3
        y3 = jnp.where(y3 >= 0, y3, y3 * jnp.float32(ALPHA))
        return pool(jnp.clip(jnp.round(y3), -127, 127).astype(jnp.int8))

    # --- d. select form in bf16 ---
    t_b = t_thr.astype(jnp.bfloat16)
    s1b, c1b = s1.astype(jnp.bfloat16), c1.astype(jnp.bfloat16)
    sxib = (s_x * inv).astype(jnp.bfloat16)

    def ep_select_b(x):
        def fold(z):
            zf = z.astype(jnp.bfloat16)
            return jnp.where(zf > t_b, zf * s1b + c1b,
                             zf * (s1b * jnp.bfloat16(ALPHA))
                             + c1b * jnp.bfloat16(ALPHA))

        q1 = jnp.clip(jnp.round(fold(conv2d(x, ws[0]))), -127, 127).astype(
            jnp.int8)
        y2 = fold(conv2d(q1, ws[1])) + q1.astype(jnp.bfloat16) * sxib
        q2 = jnp.clip(jnp.round(y2), -127, 127).astype(jnp.int8)
        y3 = fold(conv2d(q2, ws[2])) + q2.astype(jnp.bfloat16) * sxib
        y3 = jnp.where(y3 >= 0, y3, y3 * jnp.bfloat16(ALPHA))
        return pool(jnp.clip(jnp.round(y3), -127, 127).astype(jnp.int8))

    # --- e. convs with bare casts (epilogue floor) ---
    def convs_only(x):
        a = conv2d(x, ws[0]).astype(jnp.int8)
        b_ = conv2d(a, ws[1]).astype(jnp.int8)
        return pool(conv2d(b_, ws[2]).astype(jnp.int8))

    cases = {
        "ep_f32": ep_f32,
        "ep_bf16": ep_bf16,
        "ep_select": ep_select,
        "ep_select_b": ep_select_b,
        "convs_only": convs_only,
    }
    results = {}
    for name, fn in cases.items():
        us = marginal_us_per_frame(scan_program(fn))
        results[name] = round(us, 2)
        print(f"[exp] {name}: {us:.1f} us/frame", file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
