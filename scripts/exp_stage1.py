"""Stage-1 MXU utilisation experiment (round-1 verdict #10).

DESIGN.md's profile of the shipping int8-resident forward attributes 41 of
146 ms/1024-frames to encoder stage 1 and parks an im2col-in-VMEM Pallas
conv as the candidate lever. Before building that kernel, this experiment
measures where stage 1 actually is relative to the int8 roofline
(v5e ~394 TOP/s dense int8) and tests the cheap XLA-level reformulations:

  a. stage-1 exactly as the resident forward runs it (quant epilogues,
     skip adds, pooled int8 emit)
  b. the three convs alone (no quant epilogues) — conv vs epilogue split
  c. conv2 alone, dil-2 @ 192px
  d. conv2 parity-decomposed: a dilation-2 conv is 4 independent
     dilation-1 convs on the 96px parity subgrids (space-to-batch) —
     tests whether dilation itself costs XLA anything
  e. conv2 with 128 output channels (same bytes, 2x MACs) — measures the
     depth-utilisation hypothesis directly: if 64-out runs at half the
     TOP/s of 128-out, the MXU sees 64-lane output tiles

Timing: K-batch lax.scan per program, marginal rate between two K values.
Run on the real chip: python scripts/exp_stage1.py
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
                # real i-dependence (bench.py methodology) or XLA hoists
                # the loop-invariant step out of the scan entirely
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

    w1, w2, w3 = w8(3, 3, 4, 64), w8(3, 3, 64, 64), w8(3, 3, 64, 64)
    w2_wide = w8(3, 3, 64, 128)
    mult = jnp.float32(1e-3)
    alpha = jnp.float32(0.1)
    dn = ("NHWC", "HWIO", "NHWC")

    conv2d = functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1), padding="SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )

    def leaky(v):
        return jnp.where(v >= 0, v, v * alpha)

    def quant(v):
        return jnp.clip(jnp.round(v * 64.0), -127, 127).astype(jnp.int8)

    # a. full stage-1 with quant epilogues (resident-forward shape)
    def stage1_full(x):
        y1 = leaky(conv2d(x, w1, rhs_dilation=(2, 2)).astype(jnp.float32)
                   * mult)
        q1 = quant(y1)
        y2 = leaky(conv2d(q1, w2, rhs_dilation=(2, 2)).astype(jnp.float32)
                   * mult) + y1
        q2 = quant(y2)
        y3 = leaky(conv2d(q2, w3, rhs_dilation=(2, 2)).astype(jnp.float32)
                   * mult) + y2
        q = quant(leaky(y3))
        return jax.lax.reduce_window(
            q, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID",
        )

    # b. the three convs alone (int32 accum, single cast epilogue)
    def stage1_convs(x):
        a = conv2d(x, w1, rhs_dilation=(2, 2)).astype(jnp.int8)
        b_ = conv2d(a, w2, rhs_dilation=(2, 2)).astype(jnp.int8)
        return conv2d(b_, w3, rhs_dilation=(2, 2))

    # c. conv2 alone (dil-2, 192px, batch B, 64ch in/out)
    def conv2_only(x):
        a = conv2d(x, w1, rhs_dilation=(2, 2)).astype(jnp.int8)
        return conv2d(a, w2, rhs_dilation=(2, 2))

    # d. conv2 parity-decomposed to 4x dil-1 convs at 96px
    def conv2_parity(x):
        a = conv2d(x, w1, rhs_dilation=(2, 2)).astype(jnp.int8)
        p = a.reshape(B, HW // 2, 2, HW // 2, 2, 64)
        p = p.transpose(0, 2, 4, 1, 3, 5).reshape(4 * B, HW // 2, HW // 2, 64)
        y = conv2d(p, w2)  # dilation 1 on the subgrid
        return y

    # e. conv2 with 128 output channels (depth-utilisation probe)
    def conv2_wide(x):
        a = conv2d(x, w1, rhs_dilation=(2, 2)).astype(jnp.int8)
        return conv2d(a, w2_wide, rhs_dilation=(2, 2))

    conv1_macs = HW * HW * 9 * 4 * 64
    conv_macs = HW * HW * 9 * 64 * 64
    cases = {
        "stage1_full": (stage1_full, conv1_macs + 2 * conv_macs),
        "stage1_convs": (stage1_convs, conv1_macs + 2 * conv_macs),
        "conv2_only": (conv2_only, conv1_macs + conv_macs),
        "conv2_parity": (conv2_parity, conv1_macs + conv_macs),
        "conv2_wide128": (conv2_wide, conv1_macs + 2 * conv_macs),
    }
    results = {}
    for name, (fn, macs) in cases.items():
        us = marginal_us_per_frame(scan_program(fn))
        tops = 2 * macs / (us * 1e-6) / 1e12
        results[name] = {
            "us_per_frame": round(us, 2),
            "eff_TOPs": round(tops, 1),
        }
        print(f"[exp] {name}: {us:.1f} us/frame, {tops:.0f} TOP/s eff",
              file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
