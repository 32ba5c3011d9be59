"""Part 2 of the stage-1 experiment (round-1 verdict #10): the actual
im2col-in-VMEM Pallas conv, measured head-to-head against XLA's conv.

exp_stage1.py established that XLA's int8 dilated convs already run at
~219 TOP/s effective (56% of v5e's 394 TOP/s int8 peak) — not the ~25%
the round-1 profile attributed to them — and that stage-1's remaining
cost is the quant-epilogue/skip HBM chain. The im2col formulation packs
the 9 taps into the contraction (K = 9*64 = 576) but its output tile is
still N = Cout = 64 lanes, i.e. HALF the 128-lane MXU: hard ceiling
197 TOP/s, *below* XLA's measured 219. This script measures the real
kernel anyway (the ceiling argument deserves a direct datapoint).

Kernel: grid over batch; the frame is staged once into a zero-padded
VMEM scratch (SAME border = zero taps); an in-kernel fori_loop walks
16-row tiles; per tile, the 9 shifted windows are lane-concatenated
into the (R*WP, 576) im2col matrix (int8 min tile is (32,128), so
writing 64-lane slices of a 576-lane scratch would be lane-misaligned
— concatenate keeps Mosaic on aligned values), one
(R*WP, 576) x (576, 64) int8 dot hits the MXU, and the
dequant+bias+LeakyReLU+requant epilogue writes int8 out.

Axon-environment compile constraints found while building this
(documented because they bound what the kernel may look like here):
- Mosaic rejects int8 vector arithmetic ("Only vector<i16> and
  vector<i32> are supported") — int8 is load/store/dot only.
- The remote compile helper hard-crashes (HTTP 500, no diagnostic) for
  this kernel at grid >= 16 with VMEM-blockspec'd frame I/O (grid <= 12
  compiles and runs), consistent with double-buffered 2.36 MB in/out
  blocks + 3.7 MB xpad + ~6 MB im2col temporaries exceeding 16 MB VMEM.
- Rewriting frame I/O as manual HBM DMAs (memory_space=ANY +
  make_async_copy) with an in-kernel frame loop also crashes the
  helper, even at tiny batch — so the measurement below uses the
  blockspec form at B=8, with a longer scan to amortize timing noise.

Run on the real chip: python scripts/exp_im2col_pallas.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

B = 8  # grid <= 12 is the axon compile-helper ceiling for this kernel
HW = 192
C = 64
D = 2  # dilation
R = 16  # row tile
COL0 = 32  # 32-aligned col origin of the true image in the padded scratch
WP = 224  # read window width (192 + 4*D, 32-mult)
K_SMALL, K_LARGE = 4, 52


def _im2col_conv_kernel(x_ref, w_ref, m_ref, b_ref, o_ref, xpad, *,
                        alpha, inv_out):
    h = w = HW
    n_tiles = h // R

    # stage the frame once, zero margins (SAME border falls out as 0 taps)
    xpad[:] = jnp.zeros_like(xpad)
    xpad[D : D + h, COL0 : COL0 + w, :] = x_ref[0]

    def tile_body(t, _):
        r0 = t * R
        taps = []
        for tap in range(9):
            ky, kx = divmod(tap, 3)
            taps.append(
                xpad[
                    pl.ds(r0 + ky * D, R),
                    COL0 - D + kx * D : COL0 - D + kx * D + WP, :
                ].reshape(R * WP, C)
            )
        acc = jnp.dot(
            jnp.concatenate(taps, axis=1), w_ref[:],
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * m_ref[:] + b_ref[:]
        y = jnp.where(y >= 0, y, y * alpha)
        yq = jnp.clip(jnp.round(y * inv_out), -127, 127).astype(jnp.int8)
        o_ref[0, pl.ds(r0, R)] = yq.reshape(R, WP, C)[:, 0:w, :]
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


def make_pallas_conv(w, mult, bias, alpha=0.1, inv_out=64.0):
    """w: (3,3,C,C) int8 -> fn(x_int8 (B,H,W,C)) -> int8."""
    w_packed = jnp.asarray(np.asarray(w).reshape(9 * C, C))
    kernel = functools.partial(
        _im2col_conv_kernel, alpha=float(alpha), inv_out=float(inv_out)
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HW, HW, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec((1, HW, HW, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, HW, C), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((HW + 2 * D + 4, COL0 + WP + 32, C), jnp.int8),
        ],
    ), w_packed


def xla_conv(x, w, mult, bias, alpha=0.1, inv_out=64.0):
    """Same conv + epilogue in plain XLA (the resident-forward pattern)."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(D, D),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * mult + bias
    y = jnp.where(y >= 0, y, y * alpha)
    return jnp.clip(jnp.round(y * inv_out), -127, 127).astype(jnp.int8)


def marginal_us_per_frame(make_run):
    r_s, r_l = make_run(K_SMALL), make_run(K_LARGE)
    np.asarray(r_s())
    np.asarray(r_l())

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    t_s = min(timed(r_s) for _ in range(5))
    t_l = min(timed(r_l) for _ in range(5))
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
        x = jnp.asarray(rngx.integers(-80, 80, (B, HW, HW, C)), jnp.int8)
        return lambda: run(x)

    return make


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-90, 90, (3, 3, C, C)), jnp.int8)
    mult = jnp.asarray(rng.uniform(5e-4, 2e-3, (C,)), jnp.float32)
    bias = jnp.asarray(rng.uniform(-0.1, 0.1, (C,)), jnp.float32)

    pallas_fn, w_packed = make_pallas_conv(w, mult, bias)

    # exactness first
    x = jnp.asarray(rng.integers(-80, 80, (B, HW, HW, C)), jnp.int8)
    ref = np.asarray(xla_conv(x, w, mult, bias))
    try:
        got = np.asarray(jax.jit(
            lambda x: pallas_fn(x, w_packed, mult, bias))(x))
    except Exception as e:
        print(json.dumps({"pallas_compile": f"FAIL: {str(e)[:400]}"}))
        return
    exact = np.array_equal(ref, got)
    maxdiff = int(np.abs(ref.astype(np.int32) - got.astype(np.int32)).max())
    print(f"[exp] exactness: equal={exact} maxdiff={maxdiff}",
          file=sys.stderr, flush=True)

    macs = HW * HW * 9 * C * C
    results = {"exact": bool(exact), "maxdiff": maxdiff, "batch": B}
    for name, fn in (
        ("xla_conv_epilogue", lambda xx: xla_conv(xx, w, mult, bias)),
        ("pallas_im2col", lambda xx: pallas_fn(xx, w_packed, mult, bias)),
    ):
        us = marginal_us_per_frame(scan_program(fn))
        tops = 2 * macs / (us * 1e-6) / 1e12
        results[name] = {"us_per_frame": round(us, 2),
                         "eff_TOPs": round(tops, 1)}
        print(f"[exp] {name}: {us:.1f} us/frame, {tops:.0f} TOP/s eff",
              file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
