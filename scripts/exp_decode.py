"""Peak-decode cost attribution + faster argmax variants.

exp_vit_profile.py exposed a surprise: `find_peaks_with_vals` on the
(512, 192, 192, 18) serving output costs tens of ms — comparable to the
whole CNN decoder. Cause hypotheses: (a) XLA lowers argmax as a variadic
(value, index) reduce, slower than plain max/min reduces; (b) NHWC puts
C=18 in the 128-lane dimension -> 14% lane utilisation for every reduction;
(c) f32 maps double the HBM traffic vs bf16.

Variants measured here, all returning the identical [x, y, val] contract:

  argmax_f32 / argmax_bf16      current implementation at both dtypes
  maskmin_f32 / maskmin_bf16    max-reduce for the value, then
                                where(map==max, linear_iota, BIG) min-reduce
                                for the index - three plain reduces, no
                                variadic reduce
  rowcol_f32 / rowcol_bf16      two-stage: max over H -> (N, W, C) argmax
                                over W, then recover the row via a masked
                                min over H of the winning column

Run: python scripts/exp_decode.py
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

from pose_estimation_amitai_tpu.ops import peaks

N, H, W, C = 512, 192, 192, 18
K_SMALL, K_LARGE = 2, 8


def variadic_argmax_decode(confmaps: jax.Array) -> jax.Array:
    """The ORIGINAL shipped decode: jnp.argmax's variadic (value, index)
    reduce. Kept inline as the baseline — ops/peaks.py itself now ships the
    maskmin variant, so calling find_peaks_with_vals would measure the
    winner against itself."""
    n, h, w, c = confmaps.shape
    flat = confmaps.reshape(n, h * w, c)
    idx = jnp.argmax(flat, axis=1)
    vals = jnp.max(flat, axis=1)
    rows = idx // w
    cols = idx % w
    return jnp.stack([cols.astype(jnp.float32), rows.astype(jnp.float32),
                      vals.astype(jnp.float32)], axis=1)


def maskmin_decode(confmaps: jax.Array) -> jax.Array:
    n, h, w, c = confmaps.shape
    vals = jnp.max(confmaps, axis=(1, 2))  # (N, C)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1) * w + \
        jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)
    big = jnp.int32(h * w)
    masked = jnp.where(confmaps == vals[:, None, None, :], lin, big)
    idx = jnp.min(masked, axis=(1, 2))  # (N, C)
    rows = idx // w
    cols = idx % w
    return jnp.stack([cols.astype(jnp.float32), rows.astype(jnp.float32),
                      vals.astype(jnp.float32)], axis=1)


def rowcol_decode(confmaps: jax.Array) -> jax.Array:
    n, h, w, c = confmaps.shape
    colmax = jnp.max(confmaps, axis=1)  # (N, W, C) max over rows
    vals = jnp.max(colmax, axis=1)  # (N, C)
    cols = jnp.argmax(colmax, axis=1)  # (N, C)
    # winning column's profile over H: gather -> (N, H, C)
    prof = jnp.take_along_axis(confmaps, cols[:, None, None, :], axis=2)[
        :, :, 0, :
    ]
    rows = jnp.argmax(prof, axis=1)
    return jnp.stack([cols.astype(jnp.float32), rows.astype(jnp.float32),
                      vals.astype(jnp.float32)], axis=1)


def marginal_ms(make_run) -> float:
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


def scan_runner(decode, x):
    def make(K):
        @jax.jit
        def run(x):
            def body(c, i):
                maps = x + i.astype(x.dtype)  # defeat CSE, keep maps >= 0
                return c, decode(maps)

            _, out = jax.lax.scan(body, 0, jnp.arange(K))
            return out

        return lambda: run(x)

    return make


def main():
    rng = np.random.default_rng(0)
    maps32 = jnp.asarray(rng.random((N, H, W, C)), jnp.float32)
    maps16 = maps32.astype(jnp.bfloat16)

    # correctness first (on a small slice, vs the variadic baseline)
    ref = np.asarray(variadic_argmax_decode(maps32[:8]))
    for name, fn in [("maskmin", maskmin_decode), ("rowcol", rowcol_decode),
                     ("shipped", peaks.find_peaks_with_vals)]:
        got = np.asarray(fn(maps32[:8]))
        np.testing.assert_allclose(got, ref, rtol=0, atol=0, err_msg=name)
    print("correctness OK", flush=True)

    results = {}
    for name, fn, x in [
        ("argmax_f32", variadic_argmax_decode, maps32),
        ("argmax_bf16", variadic_argmax_decode, maps16),
        ("maskmin_f32", maskmin_decode, maps32),
        ("maskmin_bf16", maskmin_decode, maps16),
        ("rowcol_f32", rowcol_decode, maps32),
        ("rowcol_bf16", rowcol_decode, maps16),
    ]:
        ms = marginal_ms(scan_runner(fn, x))
        results[name] = round(ms, 2)
        print(json.dumps({"variant": name, "ms_per_batch": round(ms, 2),
                          "fps": round(N / ms * 1e3, 1)}), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
