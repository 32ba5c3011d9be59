"""Empirical int8 MXU lane model for v5e (round-3 verdict weak #1).

The bf16 lane-occupancy roofline (RESULTS.md) weights each layer's FLOPs by
``min(C_out,128)/128 * min(K^2*C_in,128)/128``. To extend it to int8 we must
know WHERE the 2x int8 rate comes from, because the two plausible hardware
models give different ceilings for narrow layers:

* **double-pumping**: each 128x128 MXU cell does 2 int8 MACs/cycle —
  occupancy formula identical to bf16, ceiling = 2x the bf16 effective
  ceiling regardless of contraction depth;
* **depth-doubling**: int8 operands pack 2-deep along the contraction dim
  (effective systolic depth 256) — layers with contraction < 256 lose the
  2x benefit proportionally.

Discriminator: achieved TOP/s of square int8 matmuls vs contraction depth
K. Under double-pumping, K=128 int8 runs ~2x the bf16 rate at K=128; under
depth-doubling it runs ~1x (half its K=256 rate). Also probed: conv-shaped
contractions (3x3 kernels at the flagship's channel widths) for the
conv-specific lowering, and output-channel narrowness (C_out 64 vs 128+).

Run on the TPU: ``python scripts/exp_int8_lanes.py``. Prints one JSON line
per probe and a summary verdict to stderr.

Reading the numbers: the consume (full-tensor max) adds one read pass over
the output per iteration, identical for both dtypes at a given shape — so
the int8:bf16 RATIO at each shape is the primary signal and the absolute
TOP/s are mild lower bounds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

REPS_SMALL, REPS_LARGE = 8, 40  # marginal-rate pair of scan lengths


def _marginal_seconds_per_rep(make_prog, *args) -> float:
    """Marginal seconds per scan iteration between two scan lengths.

    A single-length timing is useless here: the relay's fixed
    dispatch+sync floor is ~24 ms, larger than most probes' total compute
    — the first version of this script measured a flat 24 ms for every
    size. The marginal rate between two lengths cancels the floor exactly
    (same methodology as bench.py).
    """
    progs = {}
    for reps in (REPS_SMALL, REPS_LARGE):
        progs[reps] = jax.jit(make_prog(reps))
        np.asarray(progs[reps](*args))  # compile + warm

    def t(reps):
        t0 = time.perf_counter()
        np.asarray(progs[reps](*args))
        return time.perf_counter() - t0

    t_s = min(t(REPS_SMALL) for _ in range(3))
    t_l = min(t(REPS_LARGE) for _ in range(3))
    return max(t_l - t_s, 1e-9) / (REPS_LARGE - REPS_SMALL)


def matmul_probe(M: int, K: int, N: int, dtype) -> dict:
    """Achieved TOP/s (2*M*K*N MACs*2) for a K-deep matmul chain."""
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
        acc = jnp.int32
    else:
        a = jnp.asarray(rng.random((M, K)), dtype)
        b = jnp.asarray(rng.random((K, N)), dtype)
        acc = jnp.float32

    def make_prog(reps):
        def prog(a, b):
            def body(c, i):
                # single-element perturbation: forces a full recompute
                # every iteration (identical iterations get hoisted out of
                # the scan by LICM — measured as dt ~ 0), at negligible
                # cost (one row touched)
                bp = b.at[0].add((i % 2).astype(b.dtype))
                y = lax.dot_general(
                    a, bp, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc,
                )
                # full-tensor max: every output element needed, so XLA
                # cannot narrow the dot to a consumed slice
                return jnp.maximum(c, jnp.max(y)), 0

            c, _ = lax.scan(body, jnp.full((), -(2**30), acc),
                            jnp.arange(reps))
            return c

        return prog

    t = _marginal_seconds_per_rep(make_prog, a, b)
    ops = 2.0 * M * K * N
    return {
        "probe": "matmul", "dtype": str(dtype.__name__), "M": M, "K": K,
        "N": N, "tops": round(ops / t / 1e12, 1),
        "ms": round(t * 1e3, 2),
    }


def conv_probe(hw: int, cin: int, cout: int, batch: int, dtype) -> dict:
    """Achieved TOP/s for a 3x3 SAME conv at the flagship's geometry."""
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, (batch, hw, hw, cin)),
                        jnp.int8)
        w = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)
        acc = jnp.int32
    else:
        x = jnp.asarray(rng.random((batch, hw, hw, cin)), dtype)
        w = jnp.asarray(rng.random((3, 3, cin, cout)), dtype)
        acc = jnp.float32

    def make_prog(reps):
        def prog(x, w):
            def body(c, i):
                wp = w.at[0, 0, 0, 0].add((i % 2).astype(w.dtype))
                y = lax.conv_general_dilated(
                    x, wp, (1, 1), "SAME", rhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc,
                )
                return jnp.maximum(c, jnp.max(y)), 0

            c, _ = lax.scan(body, jnp.full((), -(2**30), acc),
                            jnp.arange(reps))
            return c

        return prog

    t = _marginal_seconds_per_rep(make_prog, x, w)
    ops = 2.0 * batch * hw * hw * 9 * cin * cout
    return {
        "probe": "conv3x3d2", "dtype": str(dtype.__name__), "hw": hw,
        "cin": cin, "cout": cout, "batch": batch,
        "tops": round(ops / t / 1e12, 1), "ms": round(t * 1e3, 2),
    }


def main() -> None:
    np.asarray(jnp.zeros(()) + 1)  # claim device
    rows = []
    # contraction-depth sweep, square matmuls (8192 x K x 8192)
    for K in (64, 128, 256, 512, 1024):
        for dt in (jnp.bfloat16, jnp.int8):
            r = matmul_probe(8192, K, 8192, dt)
            rows.append(r)
            print(json.dumps(r), flush=True)
    # flagship conv geometries: (hw, cin, cout) per stage + narrow edges
    for hw, cin, cout, batch in (
        (192, 4, 64, 256), (192, 64, 64, 256), (96, 64, 128, 256),
        (96, 128, 128, 256), (48, 128, 256, 256), (48, 256, 256, 256),
    ):
        for dt in (jnp.bfloat16, jnp.int8):
            r = conv_probe(hw, cin, cout, batch, dt)
            rows.append(r)
            print(json.dumps(r), flush=True)

    # verdict: compare int8/bf16 ratio at K=128 vs K>=256
    def tops(probe, dt, **sel):
        for r in rows:
            if r["probe"] == probe and r["dtype"] == dt and all(
                r.get(k) == v for k, v in sel.items()
            ):
                return r["tops"]
        return float("nan")

    r128 = tops("matmul", "int8", K=128) / tops("matmul", "bfloat16", K=128)
    r512 = tops("matmul", "int8", K=512) / tops("matmul", "bfloat16", K=512)
    print(
        f"int8/bf16 rate ratio: K=128 {r128:.2f}, K=512 {r512:.2f} -> "
        + ("DOUBLE-PUMPING (depth-independent 2x: bf16-style occupancy, "
           "2x ceiling)" if r128 > 1.5 else
           "DEPTH-DOUBLING (256-deep contraction: occupancy uses "
           "min(K^2*Cin,256)/256)"),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
