"""Pallas TPU kernel: fully-fused transposed-conv decoder (torch flavour).

Fuses the flagship decoder (models/layers.py DecoderUp, reference:
pytorch/CNNs.py:92-157 — deconv x2up -> two stride-1 deconvs with skips ->
deconv x2up head, LeakyReLU everywhere) into one VMEM-resident kernel per
frame, eliminating the ~5 HBM activation round-trips at 96x96x128.

Math: flax ConvTranspose(k3, s1, SAME) == a plain (unflipped) SAME conv;
the torch-flavour stride-2 ConvTranspose (reference p=1/op=1 crop,
models/layers.py DecoderUp) == conv with lhs_dilation=2, padding=(1, 2)
(verified numerically). The stride-2 layers are computed in *parity-planar*
form — output phase (a, b) of the 2x-upsampled grid is a small conv of the
input (see ``_up_taps``):

    y[2j,   2l  ] = x[j, l] . W[1, 1]
    y[2j+1, 2l  ] = taps W[{0,2}, 1] at x[j / j+1, l]
    y[2j,   2l+1] = taps W[1, {0,2}]
    y[2j+1, 2l+1] = taps W[{0,2}, {0,2}] at x[j / j+1, l / l+1]

so the whole decoder runs on 48x48 planes: d1 produces 4 parity planes of
the 96-grid; d2/d3 (stride-1 convs on the 96-grid) become 9-tap plane-mixing
contractions; d4 produces the 16 phase planes of the 192-grid. Phases are
emitted as 16 separate (B, 48, 48, 32) outputs (lane-aligned, K padded
18->32) and interleaved by XLA outside the kernel — in-kernel strided
sublane writes are miscompiled on this Mosaic build (see pallas_conv.py).

Peak decode / losses consume the XLA-interleaved (B, 192, 192, K) result.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
COL0 = 8  # 8-aligned column origin inside padded scratch planes


def _leaky(x, alpha):
    return jnp.where(x >= 0, x, x * alpha)


def _up_taps(parity: int):
    """Row (or col) taps of a stride-2 k3 ConvTranspose for out parity a.

    Returns a list of (input_index_shift, kernel_row) pairs for
    y[2j + a] = sum_t x[j + shift_t] . W[row_t], in the torch-flavour crop
    convention (ConvTranspose2d p=1/op=1 == lhs-dilated conv, padding
    (1, 2) — models/layers.py DecoderUp): the output is the flax-SAME
    result shifted up/left by one, so
      y[2j]   = x[j]   . W[1]
      y[2j+1] = x[j] . W[0] + x[j+1] . W[2]."""
    if parity == 0:
        return [(0, 1)]
    return [(0, 0), (1, 2)]


def _s1_taps(parity: int):
    """Plane-mixing taps of a stride-1 SAME k3 conv on a 2-interleaved grid.

    For out plane parity ``a`` at index j: source (parity a', shift js) for
    kernel row dy+1, from 2j + a + dy = 2 j' + a'."""
    taps = []
    for dy in (-1, 0, 1):
        m = parity + dy
        a_src = m % 2
        js = (m - a_src) // 2
        taps.append((a_src, js, dy + 1))
    return taps


def _decoder_kernel(
    x_ref, w1, b1, w2, b2, w3, b3, w4, b4, *refs,
    alpha, cin, mid, kout,
):
    """One frame: latent (1, R, W, cin) -> 16 phase planes (1, R, W, kout).

    All intermediates live in ONE (8, rows, cols, 128) scratch to stay
    under the 16MB scoped-VMEM limit; slots are reused as stages die (see
    the slot maps below).
    """
    out_ref = refs[0]
    buf = refs[1]
    n_ci = cin // LANE
    # 8 slots, reused as stages die: latent [0,1] -> d1 planes [2..5] ->
    # d2 planes [0,1,6,7] (latent dead) -> d3 planes [2..5] (d1 dead)
    LAT = [0, 1]
    P1 = [2, 3, 4, 5]
    P2 = [0, 1, 6, 7]
    P3 = [2, 3, 4, 5]
    r = x_ref.shape[1]
    wd = x_ref.shape[2]

    buf[:] = jnp.zeros_like(buf)
    # stage the latent into zero-margined slots (chunked to 128 lanes)
    for ci in range(n_ci):
        buf[LAT[ci], 1 : 1 + r, COL0 : COL0 + wd] = x_ref[
            0, :, :, ci * LANE : (ci + 1) * LANE
        ]

    # ---- d1: stride-2 up, cin -> mid, parity-planar ----------------------
    for ay in (0, 1):
        for ax in (0, 1):
            acc = jnp.zeros((r, wd, mid), jnp.float32)
            for js, ky in _up_taps(ay):
                for ls, kx in _up_taps(ax):
                    for ci in range(n_ci):
                        tap = buf[
                            LAT[ci], 1 + js : 1 + js + r,
                            COL0 + ls : COL0 + ls + wd,
                        ]
                        acc = acc + jax.lax.dot_general(
                            tap,
                            w1[ky, kx, ci * LANE : (ci + 1) * LANE, :],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
            y = _leaky(acc + b1[:].astype(jnp.float32), alpha)
            buf[P1[2 * ay + ax], 1 : 1 + r, COL0 : COL0 + wd, 0:mid] = (
                y.astype(buf.dtype)
            )

    # ---- d2, d3: stride-1 convs on the 96-grid, with residual skips ------
    def s1_conv(src, dst, w, b):
        for ay in (0, 1):
            for ax in (0, 1):
                acc = jnp.zeros((r, wd, mid), jnp.float32)
                for a_sy, js, ky in _s1_taps(ay):
                    for a_sx, ls, kx in _s1_taps(ax):
                        tap = buf[
                            src[2 * a_sy + a_sx],
                            1 + js : 1 + js + r,
                            COL0 + ls : COL0 + ls + wd,
                            0:mid,
                        ]
                        acc = acc + jax.lax.dot_general(
                            tap, w[ky, kx],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                y = _leaky(acc + b[:].astype(jnp.float32), alpha)
                # residual skip (pytorch/CNNs.py:152-153)
                y = y + buf[
                    src[2 * ay + ax], 1 : 1 + r, COL0 : COL0 + wd, 0:mid
                ].astype(jnp.float32)
                buf[
                    dst[2 * ay + ax], 1 : 1 + r, COL0 : COL0 + wd, 0:mid
                ] = y.astype(buf.dtype)

    s1_conv(P1, P2, w2, b2)
    s1_conv(P2, P3, w3, b3)

    # ---- d4: stride-2 up on the 96-grid -> 16 phases of the 192-grid -----
    for qy in range(4):
        a2y, a4y = qy // 2, qy % 2
        for qx in range(4):
            a2x, a4x = qx // 2, qx % 2
            acc = jnp.zeros((r, wd, kout), jnp.float32)
            # 192-grid row 4j + qy = 2*(2j + a2y) + a4y; the stride-2 taps
            # act on the 96-grid index m = 2j + a2y.
            for ms, ky in _up_taps(a4y):
                # m + ms = 2 j' + a'  ->  source plane parity and shift
                myy = a2y + ms
                a_sy, js = myy % 2, (myy - (myy % 2)) // 2
                for ns, kx in _up_taps(a4x):
                    mxx = a2x + ns
                    a_sx, ls = mxx % 2, (mxx - (mxx % 2)) // 2
                    tap = buf[
                        P3[2 * a_sy + a_sx],
                        1 + js : 1 + js + r,
                        COL0 + ls : COL0 + ls + wd,
                        0:mid,
                    ]
                    acc = acc + jax.lax.dot_general(
                        tap, w4[ky, kx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            y = _leaky(acc + b4[:].astype(jnp.float32), alpha)
            # pack the 4 qx phases along lanes: out[0, qy, :, :, 32qx:+32]
            out_ref[0, qy, :, :, qx * kout : (qx + 1) * kout] = y.astype(
                out_ref.dtype
            )


def fused_decoder(
    latent: jax.Array,
    w1, b1, w2, b2, w3, b3, w4, b4,
    *,
    alpha: float = 0.1,
    interpret: bool = False,
) -> jax.Array:
    """Fused torch-flavour DecoderUp: (B, R, W, cin) -> (B, 4R, 4W, kout).

    Weights are flax ConvTranspose HWIO kernels; kout is padded to a
    multiple of 32 internally and sliced back.
    """
    b, r, wd, cin = latent.shape
    assert cin % LANE == 0 and cin <= 2 * LANE, cin
    mid = w1.shape[-1]
    assert mid <= LANE, mid  # unified scratch slots are 128-lane
    k_real = w4.shape[-1]
    kout = -(-k_real // 32) * 32
    if kout != k_real:
        w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, 0), (0, kout - k_real)))
        b4 = jnp.pad(b4, (0, kout - k_real))

    wbuf = -(-(wd + 2 * COL0) // 8) * 8
    kernel = partial(
        _decoder_kernel, alpha=alpha, cin=cin, mid=mid, kout=kout,
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, r, wd, cin), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [wspec] * 8,
        out_specs=pl.BlockSpec(
            (1, 4, r, wd, 4 * kout), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, 4, r, wd, 4 * kout), latent.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((8, r + 2, wbuf, LANE), latent.dtype),
        ],
        interpret=interpret,
    )(latent, w1, b1, w2, b2, w3, b3, w4, b4)

    # unpack phases -> (B, 4R, 4W, k_real), in XLA
    ph = out.reshape(b, 4, r, wd, 4, kout)  # (B, qy, j, l, qx, k)
    ph = jnp.transpose(ph, (0, 1, 4, 2, 3, 5))[..., :k_real]
    # y[4j + qy, 4l + qx] = ph[qy, qx, j, l]
    y = jnp.transpose(ph, (0, 3, 1, 4, 2, 5))  # (B, j, qy, l, qx, k)
    return y.reshape(b, 4 * r, 4 * wd, k_real)
