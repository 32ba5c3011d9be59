"""Pallas TPU kernels: fused dilated-conv encoder stages.

The flagship CNN (reference: pytorch/CNNs.py:9-88 ``Encoder2DAtrous``) is a
chain of 3x3 dilated convs with LeakyReLU and residual skips. Under plain XLA
every conv round-trips its (H, W, C) activation through HBM — measured ~320
GB/s of traffic and only ~26% MXU utilisation on v5e for the 192x192 flagship
(see bench.py). This kernel fuses one whole encoder stage

    conv1 -> LReLU -> conv2 -> LReLU (+x1) -> conv3 -> LReLU (+x2)
    [-> maxpool 2x2 -> LReLU]

into a single VMEM-resident pass per frame: the padded input frame is staged
into VMEM once by the Pallas pipeline (grid over batch), an in-kernel
``fori_loop`` walks row tiles to bound live activation memory, and each conv
runs as accumulated channel-contraction MXU matmuls (shifted-tap
formulation — no im2col materialisation). Only the (optionally pooled) stage
output is written back: HBM traffic per stage drops from ~6 activation
round-trips to 1 read + 1 write.

Empirical Mosaic constraints shaping the implementation (v5e, libtpu 0.0.34,
found by bisection — each violation hard-crashes the AOT compiler):
* chained dot_generals must consume slices of *Refs*, not of computed
  values -> intermediate activations bounce through VMEM scratch refs;
* vector values wider than 128 lanes in the chain crash -> channels are
  processed in <=128-lane chunks (scratch laid out (chunk, rows, width, 128));
* dot outputs beyond ~2 MB of f32 crash -> small row tiles (16-24 rows);
* staged widths must be 8-aligned -> padded input buffer;
* boolean masks must be expanded via f32 (minor-dim insertion is 32-bit only).

Exposed through models/fast_infer.py (Predictor ``use_fused``); the shipping
benchmark path is the XLA int8-resident forward (models/quantized.py), which
measured faster end to end — see DESIGN.md "Measured verdict". Training
keeps the flax/XLA path (autodiff-friendly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_CHUNK = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _mask_outside_image(a, row0, excess, height, width):
    """Zero activation values that fall outside the original image.

    A SAME conv's input beyond the image border is zero; the fused VALID
    chain instead *evaluates* the previous conv there (bias + LeakyReLU of
    zeros != 0), so halo positions outside the true image must be zeroed
    before feeding the next conv. Local row t maps to original row
    ``row0 + t - excess``; local col u to ``u - excess``.
    """
    rows = (
        jax.lax.broadcasted_iota(jnp.int32, a.shape[:2], 0) + row0 - excess
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, a.shape[:2], 1) - excess
    ok = (rows >= 0) & (rows < height) & (cols >= 0) & (cols < width)
    return (a.astype(jnp.float32) * ok.astype(jnp.float32)[..., None]).astype(
        a.dtype
    )


def _conv_chunked(
    read_chunk, n_in_chunks, w_ref, b_ref, co, rows_out, width_out,
    dilation, alpha,
):
    """One <=128-lane output chunk of a VALID 3x3 dilated conv.

    ``read_chunk(ci, r0, nrows, c0, ncols)`` returns an input-chunk tap
    slice; the contraction accumulates 9 taps x n_in_chunks matmuls on the
    MXU in f32. Returns LeakyReLU(conv + b_chunk), f32.
    """
    d = dilation
    cin_total = w_ref.shape[2]
    co0 = co * LANE_CHUNK
    con = min(LANE_CHUNK, w_ref.shape[3] - co0)
    acc = jnp.zeros((rows_out, width_out, con), jnp.float32)
    for ci in range(n_in_chunks):
        ci0 = ci * LANE_CHUNK
        cin = min(LANE_CHUNK, cin_total - ci0)
        for ky in range(3):
            for kx in range(3):
                tap = read_chunk(ci, ky * d, rows_out, kx * d, width_out, cin)
                w = w_ref[ky, kx, ci0 : ci0 + cin, co0 : co0 + con]
                acc = acc + jax.lax.dot_general(
                    tap, w,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    y = acc + b_ref[co0 : co0 + con].astype(jnp.float32)
    return jnp.where(y >= 0, y, y * alpha)


def _stage_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
    pad_ref, a1_ref, a2_ref,
    *, row_tile, n_tiles, height, width, dilation, alpha, pool, out_dtype,
):
    """One whole encoder stage for one frame (grid step = one batch elem).

    The raw (1, H, W, Cin) frame block is copied into a zeroed, halo-padded
    VMEM scratch first: padding with an XLA ``jnp.pad`` before the
    pallas_call makes layout assignment lane-pad the operand (32x blowup for
    Cin=4) and crashes the compiler for batch >= 8, so SAME-conv borders are
    materialised in-kernel instead.
    """
    d = dilation
    halo = 3 * d
    r1 = row_tile + 4 * d  # rows after conv1
    r2 = row_tile + 2 * d  # rows after conv2
    w1w = width + 4 * d
    w2w = width + 2 * d
    out_rows = row_tile // 2 if pool else row_tile
    cin = x_ref.shape[-1]
    cout = w1_ref.shape[-1]
    n_in = _cdiv(cin, LANE_CHUNK)
    n_out = _cdiv(cout, LANE_CHUNK)

    # Column origin must be 8-aligned: Mosaic silently miscompiles VMEM
    # writes at unaligned sublane offsets (reads are fine). Rows are an
    # untiled dim, so row offsets are unconstrained.
    COL_ORG = 8
    col_shift = COL_ORG - halo  # added to every tap's column start

    def stage_tile(t):
        """Zero + copy this tile's rows (with halos) into pad_ref.

        pad_ref row b corresponds to original row ``t*row_tile - halo + b``;
        rows outside the image stay zero (SAME-conv border semantics).
        Boundary tiles use @pl.when branches so every copy extent is static.
        """
        row0 = t * row_tile
        pad_ref[:] = jnp.zeros_like(pad_ref)
        if n_tiles == 1:
            pad_ref[halo : halo + height, COL_ORG : COL_ORG + width] = x_ref[0]
            return

        @pl.when(t == 0)
        def _():
            pad_ref[halo : halo + row_tile + halo, COL_ORG : COL_ORG + width] = (
                x_ref[0, pl.ds(0, row_tile + halo)]
            )

        @pl.when(jnp.logical_and(t > 0, t < n_tiles - 1))
        def _():
            pad_ref[0 : row_tile + 2 * halo, COL_ORG : COL_ORG + width] = (
                x_ref[0, pl.ds(row0 - halo, row_tile + 2 * halo)]
            )

        @pl.when(t == n_tiles - 1)
        def _():
            pad_ref[0 : row_tile + halo, COL_ORG : COL_ORG + width] = (
                x_ref[0, pl.ds(row0 - halo, row_tile + halo)]
            )

    def tile_body(t, _):
        row0 = t * row_tile
        stage_tile(t)

        def read_x(ci, r0, nrows, c0, ncols, cn):
            # cin <= 128 in every stage: single input chunk, tile-local rows
            return pad_ref[
                r0 : r0 + nrows, c0 + col_shift : c0 + col_shift + ncols, :
            ]

        def read_a(ref):
            def read(ci, r0, nrows, c0, ncols, cn):
                return ref[ci, r0 : r0 + nrows, c0 : c0 + ncols, 0:cn]
            return read

        def chunk_width(co):
            return min(LANE_CHUNK, cout - co * LANE_CHUNK)

        for co in range(n_out):
            a1 = _conv_chunked(
                read_x, n_in, w1_ref, b1_ref, co, r1, w1w, d, alpha
            )
            a1 = _mask_outside_image(a1, row0, 2 * d, height, width)
            a1_ref[co, 0:r1, 0:w1w, 0 : chunk_width(co)] = a1.astype(
                a1_ref.dtype
            )

        for co in range(n_out):
            cw = chunk_width(co)
            a2 = _conv_chunked(
                read_a(a1_ref), n_out, w2_ref, b2_ref, co, r2, w2w, d, alpha
            )
            # residual skip conv2 + conv1 (pytorch/CNNs.py:79-81)
            a2 = a2 + a1_ref[co, d : d + r2, d : d + w2w, 0:cw].astype(
                jnp.float32
            )
            a2 = _mask_outside_image(a2, row0, d, height, width)
            a2_ref[co, 0:r2, 0:w2w, 0:cw] = a2.astype(a2_ref.dtype)

        for co in range(n_out):
            cw = chunk_width(co)
            a3 = _conv_chunked(
                read_a(a2_ref), n_out, w3_ref, b3_ref, co, row_tile, width,
                d, alpha,
            )
            a3 = a3 + a2_ref[
                co, d : d + row_tile, d : d + width, 0:cw
            ].astype(jnp.float32)
            if pool:
                p = a3.reshape(
                    row_tile // 2, 2, width // 2, 2, a3.shape[-1]
                )
                y = jnp.max(jnp.max(p, axis=3), axis=1)
                # post-pool LeakyReLU (pytorch/CNNs.py:83)
                y = jnp.where(y >= 0, y, y * alpha)
            else:
                y = a3
            c0 = co * LANE_CHUNK
            out_ref[
                0, pl.ds(t * out_rows, out_rows), :,
                c0 : c0 + y.shape[-1],
            ] = y.astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


def _fit_row_tile(h: int, requested: int, pool: bool) -> int:
    """Largest divisor of h that is <= requested (and even when pooling)."""
    t = min(requested, h)
    while t > 1 and (h % t != 0 or (pool and t % 2 != 0)):
        t -= 1
    if h % t != 0:
        t = h
    return t


def fused_encoder_stage(
    x: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    w3: jax.Array, b3: jax.Array,
    *,
    dilation: int = 2,
    alpha: float = 0.1,
    pool: bool = True,
    row_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Fused (conv -> conv(+skip) -> conv(+skip) [-> maxpool]) stage.

    Twin of one ``EncoderAtrous`` torch-flavour stage (models/layers.py,
    reference pytorch/CNNs.py:73-88) for inference.

    Args:
      x: (B, H, W, Cin) with Cin <= 128; weights (3, 3, Cin, Cout) HWIO;
      biases (Cout,).

    Returns:
      (B, H/2, W/2, Cout) if pool else (B, H, W, Cout), dtype of x.
    """
    b, h, w, cin = x.shape
    assert cin <= LANE_CHUNK, "input chunking not needed for this family"
    cout = w1.shape[-1]
    d = dilation
    row_tile = _fit_row_tile(h, row_tile, pool)
    if pool:
        assert w % 2 == 0

    halo = 3 * d
    wbuf = _pad8(w + 8 + halo + 2)  # 8-aligned col origin + right halo
    n_tiles = h // row_tile
    out_h = h // 2 if pool else h
    out_w = w // 2 if pool else w
    n_out = _cdiv(cout, LANE_CHUNK)
    chunk_c = min(cout, LANE_CHUNK)

    kernel = partial(
        _stage_kernel,
        row_tile=row_tile, n_tiles=n_tiles, height=h, width=w, dilation=d,
        alpha=alpha, pool=pool, out_dtype=x.dtype,
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h, w, cin),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            wspec, wspec, wspec, wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec(
            (1, out_h, out_w, cout),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((row_tile + 2 * halo, wbuf, cin), x.dtype),
            pltpu.VMEM(
                (n_out, row_tile + 4 * d, _pad8(w + 4 * d), chunk_c), x.dtype
            ),
            pltpu.VMEM(
                (n_out, row_tile + 2 * d, _pad8(w + 2 * d), chunk_c), x.dtype
            ),
        ],
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)


def encoder_forward_fused(
    x: jax.Array,
    stage_params: list[dict],
    *,
    dilation: int = 2,
    alpha: float = 0.1,
    row_tiles: tuple[int, ...] = (16, 24, 24),
    interpret: bool = False,
) -> jax.Array:
    """Full torch-flavour encoder: 3 fused stages (pool after 1 and 2).

    ``stage_params[k]`` holds w1/b1/w2/b2/w3/b3 HWIO arrays for stage k.
    Inference only (dropout is identity at eval).
    """
    for k, p in enumerate(stage_params):
        x = fused_encoder_stage(
            x, p["w1"], p["b1"], p["w2"], p["b2"], p["w3"], p["b3"],
            dilation=dilation, alpha=alpha, pool=k < 2,
            row_tile=row_tiles[k], interpret=interpret,
        )
    return x
