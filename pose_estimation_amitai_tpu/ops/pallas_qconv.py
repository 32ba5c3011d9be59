"""Pallas TPU kernels: fused int8 encoder stages for quantized serving.

The XLA int8 path (models/quantized.py) spends ~30% of its encoder time on
requantization round-trips through HBM (each conv's input quant pass reads
the bf16 activation and writes the int8 tensor). This kernel keeps a whole
encoder stage in VMEM: int8 taps -> 2D-reshape int8 MXU dots (measured
~424 TOP/s on v5e vs ~47 TFLOP/s for the bf16 3D-contraction form) ->
dequant+bias+LeakyReLU -> bf16 skip adds -> in-register requant for the next
conv. Only int8 activations cross HBM between stages (half of bf16 traffic).

Arithmetic matches models/quantized.py exactly (same scales, same bf16 skip
precision), so its peak-parity guarantees carry over; equality is asserted
in tests/test_pallas_qconv.py.

Layout rules (see pallas_conv.py for the Mosaic bisection story; int8 adds):
* int8 tiling is (32, 128): scratch col origins and 2D-reshape widths are
  32-aligned (every conv computes at a fixed 32-multiple width WP, masked
  garbage beyond the true width);
* channel chunks stay <= 128 lanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
COL0 = 32  # int8-safe column origin in padded scratch


def _cdiv(a, b):
    return -(-a // b)


def _pad32(x):
    return -(-x // 32) * 32


def _mask_cols(a, excess, width):
    """Zero columns outside the true image (original col = local - excess)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, a.shape[:2], 1) - excess
    ok = (cols >= 0) & (cols < width)
    return (a.astype(jnp.float32) * ok.astype(jnp.float32)[..., None]).astype(
        a.dtype
    )


def _mask_rows(a, row0, excess, height):
    rows = (
        jax.lax.broadcasted_iota(jnp.int32, a.shape[:2], 0) + row0 - excess
    )
    ok = (rows >= 0) & (rows < height)
    return (a.astype(jnp.float32) * ok.astype(jnp.float32)[..., None]).astype(
        a.dtype
    )


def _qdot_conv(read_tap, n_in, w_ref, rows_out, wp, dilation, co, cout):
    """int8 VALID 3x3 dilated conv, one <=128-lane output chunk, i32 acc.

    ``read_tap(ci, r0, c0)`` returns an int8 (rows_out, wp, 128) slice —
    Mosaic only supports int8 2D reshapes at exactly 128 lanes, so input
    chunks are always full 128-lane slabs (weights zero-padded to match).
    """
    d = dilation
    co0 = co * LANE
    con = min(LANE, cout - co0)
    acc = jnp.zeros((rows_out * wp, con), jnp.int32)
    for ci in range(n_in):
        for ky in range(3):
            for kx in range(3):
                tap = read_tap(ci, ky * d, kx * d)
                a2 = tap.reshape(rows_out * wp, LANE)
                acc = acc + jnp.dot(
                    a2,
                    w_ref[ky, kx, ci * LANE : (ci + 1) * LANE,
                          co0 : co0 + con],
                    preferred_element_type=jnp.int32,
                )
    return acc.reshape(rows_out, wp, con)


def _stage_kernel(
    x_ref,
    w1, m1, b1, w2, m2, b2, w3, m3, b3,
    out_ref,
    pad_ref, q1_ref, f1_ref, q2_ref, f2_ref,
    *,
    row_tile, n_tiles, height, width, wp, dilation, alpha, pool,
    inv_s2, inv_s3, inv_out,
):
    """One int8 encoder stage for one frame (grid step = one batch elem)."""
    d = dilation
    halo = 3 * d
    r1 = row_tile + 4 * d
    r2 = row_tile + 2 * d
    out_rows = row_tile  # pooling happens outside the kernel
    cin = x_ref.shape[-1]
    cout = w1.shape[-1]
    n_in = _cdiv(max(cin, 1), LANE)
    n_out = _cdiv(cout, LANE)

    def leaky(v):
        return jnp.where(v >= 0, v, v * alpha)

    def quant(v, inv_s):
        return jnp.clip(
            jnp.round((v.astype(jnp.bfloat16)
                       * jnp.bfloat16(inv_s)).astype(jnp.float32)),
            -127, 127,
        ).astype(jnp.int8)

    def chunk_w(co):
        return min(LANE, cout - co * LANE)

    # zero all scratch ONCE per frame (margins are never written in the
    # tile loop; per-tile full zeroing costs ~60MB of VPU writes per frame)
    pad_ref[:] = jnp.zeros_like(pad_ref)
    q1_ref[:] = jnp.zeros_like(q1_ref)
    f1_ref[:] = jnp.zeros_like(f1_ref)
    q2_ref[:] = jnp.zeros_like(q2_ref)
    f2_ref[:] = jnp.zeros_like(f2_ref)

    def tile_body(t, _):
        row0 = t * row_tile
        if n_tiles == 1:
            pad_ref[halo : halo + height, COL0 : COL0 + width, 0:cin] = (
                x_ref[0]
            )
        else:
            @pl.when(t == 0)
            def _():
                pad_ref[halo : halo + row_tile + halo,
                        COL0 : COL0 + width, 0:cin] = x_ref[
                    0, pl.ds(0, row_tile + halo)
                ]

            @pl.when(jnp.logical_and(t > 0, t < n_tiles - 1))
            def _():
                pad_ref[
                    0 : row_tile + 2 * halo, COL0 : COL0 + width, 0:cin
                ] = x_ref[0, pl.ds(row0 - halo, row_tile + 2 * halo)]

            @pl.when(t == n_tiles - 1)
            def _():
                pad_ref[
                    0 : row_tile + halo, COL0 : COL0 + width, 0:cin
                ] = x_ref[0, pl.ds(row0 - halo, row_tile + halo)]
                # rows beyond the image still hold the previous tile's data
                pad_ref[row_tile + halo : row_tile + 2 * halo] = jnp.zeros(
                    (halo,) + pad_ref.shape[1:], pad_ref.dtype
                )

        # conv1: taps from the padded input; a1 col u <-> original u - 2d
        def read_x(ci, r0, c0):
            return pad_ref[r0 : r0 + r1, COL0 - 3 * d + c0 :
                           COL0 - 3 * d + c0 + wp,
                           ci * LANE : (ci + 1) * LANE]

        for co in range(n_out):
            cw = chunk_w(co)
            acc = _qdot_conv(read_x, n_in, w1, r1, wp, d, co, cout)
            y = acc.astype(jnp.float32) * m1[co * LANE : co * LANE + cw] \
                + b1[co * LANE : co * LANE + cw]
            y = leaky(y)
            y = _mask_rows(y, row0, 2 * d, height)
            y = _mask_cols(y, 2 * d, width)
            f1_ref[co, 0:r1, 0:wp, 0:cw] = y.astype(jnp.bfloat16)
            q1_ref[co, 0:r1, 0:wp, 0:cw] = quant(y, inv_s2)

        # conv2 (+skip conv1): a2 col u <-> original u - d
        def read_q1(ci, r0, c0):
            return q1_ref[ci, r0 : r0 + r2, c0 : c0 + wp, :]

        for co in range(n_out):
            cw = chunk_w(co)
            acc = _qdot_conv(read_q1, n_out, w2, r2, wp, d, co, cout)
            y = acc.astype(jnp.float32) * m2[co * LANE : co * LANE + cw] \
                + b2[co * LANE : co * LANE + cw]
            y = leaky(y).astype(jnp.bfloat16) \
                + f1_ref[co, d : d + r2, d : d + wp, 0:cw]
            y = _mask_rows(y, row0, d, height)
            y = _mask_cols(y, d, width)
            f2_ref[co, 0:r2, 0:wp, 0:cw] = y
            q2_ref[co, 0:r2, 0:wp, 0:cw] = quant(y, inv_s3)

        # conv3 (+skip conv2): a3 col u <-> original u
        def read_q2(ci, r0, c0):
            return q2_ref[ci, r0 : r0 + row_tile, c0 : c0 + wp, :]

        for co in range(n_out):
            cw = chunk_w(co)
            acc = _qdot_conv(read_q2, n_out, w3, row_tile, wp, d, co, cout)
            y = acc.astype(jnp.float32) * m3[co * LANE : co * LANE + cw] \
                + b3[co * LANE : co * LANE + cw]
            y = leaky(y).astype(jnp.bfloat16) \
                + f2_ref[co, d : d + row_tile, d : d + wp, 0:cw]

            if pool:
                # max-pool commutes with the monotone quant(leaky(.)) —
                # emit unpooled int8 here; the caller pools in XLA
                # (in-kernel pool reshapes crash this Mosaic build; so does
                # a weakly-typed bf16 leaky — run it in f32)
                yf = y.astype(jnp.float32)
                y = jnp.where(yf >= 0, yf, yf * alpha)
            yq = quant(y, inv_out)
            out_ref[
                0, pl.ds(t * out_rows, out_rows), :,
                co * LANE : co * LANE + cw,
            ] = yq[:, 0:width, :]
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


def _fit_row_tile(h, requested, pool):
    t = min(requested, h)
    while t > 1 and (h % t != 0 or (pool and t % 2 != 0)):
        t -= 1
    return t if h % t == 0 else h


def fused_quantized_stage(
    x_int8: jax.Array,
    w1, m1, b1, w2, m2, b2, w3, m3, b3,
    inv_s2: float, inv_s3: float, inv_out: float,
    *,
    dilation: int = 2,
    alpha: float = 0.1,
    pool: bool = True,
    row_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Fused int8 encoder stage.

    Args:
      x_int8: (B, H, W, Cin) int8, quantized at conv1's input scale;
      wK: (3, 3, Cin/Cout, Cout) int8; mK: (Cout,) f32 dequant multipliers
      (s_x * s_w per channel); bK: (Cout,) f32 biases;
      inv_s2/inv_s3: 1/s_x of conv2/conv3; inv_out: 1/s_x of the NEXT
      layer (the stage output is emitted int8 at that scale).

    Returns:
      (B, H, W, Cout) int8. When ``pool`` the extra LeakyReLU is applied
      pre-quant and the caller must 2x2 max-pool the int8 output (exactly
      equal to pooling before quant: max commutes with monotone maps).
    """
    b, h, w, cin = x_int8.shape
    cout = w1.shape[-1]

    def pad_cin(wk):
        c = wk.shape[2]
        cp = _cdiv(c, LANE) * LANE
        if cp != c:
            wk = jnp.pad(wk, ((0, 0), (0, 0), (0, cp - c), (0, 0)))
        return wk

    w1, w2, w3 = pad_cin(w1), pad_cin(w2), pad_cin(w3)
    d = dilation
    row_tile = _fit_row_tile(h, row_tile, pool)
    n_tiles = h // row_tile
    wp = _pad32(w + 4 * d)
    wbuf = COL0 + _pad32(w + 3 * d + 2) + 32
    n_out = _cdiv(cout, LANE)

    kernel = partial(
        _stage_kernel,
        row_tile=row_tile, n_tiles=n_tiles, height=h, width=w, wp=wp,
        dilation=d, alpha=alpha, pool=pool,
        inv_s2=float(inv_s2), inv_s3=float(inv_s3), inv_out=float(inv_out),
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h, w, cin), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [wspec] * 9,
        out_specs=pl.BlockSpec(
            (1, h, w, cout), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((row_tile + 2 * 3 * d, wbuf, LANE), jnp.int8),
            pltpu.VMEM((n_out, row_tile + 4 * d, wp + 32, LANE),
                       jnp.int8),
            pltpu.VMEM((n_out, row_tile + 4 * d, wp + 32, LANE),
                       jnp.bfloat16),
            pltpu.VMEM((n_out, row_tile + 2 * d, wp + 32, LANE),
                       jnp.int8),
            pltpu.VMEM((n_out, row_tile + 2 * d, wp + 32, LANE),
                       jnp.bfloat16),
        ],
        interpret=interpret,
    )(x_int8, w1, m1, b1, w2, m2, b2, w3, m3, b3)
