"""Fused on-device affine augmentation.

TPU-native replacement for the reference's per-sample, per-channel CPU
augmentation loops (reference: pytorch/Augmentor.py:31-43 + :96-103 —
flips / cv2 scale / scipy shift / scipy rotate, one channel at a time;
tensorflow/Augmentor.py:63-110; torchvision ``F.affine`` at
pytorch/Datagenerators.py:186-198). That per-channel Python loop is the
dominant CPU cost of the reference's train step (SURVEY §3.1).

Here the whole transform chain (flip -> scale -> shift -> rotate) is composed
into ONE 3x3 matrix per sample, and image + confidence-map stacks are warped
together in a single vmapped gather pass that XLA keeps entirely on device.
Bilinear and cubic (Catmull-Rom, matching the reference's order-3/INTER_CUBIC
flavour) interpolation are supported; out-of-bounds samples are zero
(cv2 BORDER_CONSTANT 0 semantics, pytorch/Augmentor.py:21-22).

Design note (SURVEY §7 hard part 1): the reference mixes three subtly
different interpolators (scipy order-3 spline, PIL bicubic, cv2 INTER_CUBIC).
We pin ONE resampling definition (Catmull-Rom for order>=2, bilinear
otherwise) and accept pixel-level divergence on augmented samples while
matching the transform *statistics*; parity checks run on un-augmented data.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class AugmentParams(NamedTuple):
    """Per-sample augmentation parameters (each shaped (B,))."""

    angle_deg: jax.Array
    scale: jax.Array
    shift_x: jax.Array
    shift_y: jax.Array
    flip_h: jax.Array  # bool
    flip_v: jax.Array  # bool
    shear_deg: jax.Array | None = None  # keras ImageDataGenerator shear


def sample_augment_params(
    key: jax.Array,
    batch: int,
    rotation_range: float = 30.0,
    xy_shifts: float = 10.0,
    zoom_range: tuple[float, float] = (1.0, 1.0),
    do_horizontal_flip: bool = True,
    do_vertical_flip: bool = True,
    shear_range: float = 0.0,
    rotation_low: float = 0.0,
    quadrants: bool = False,
) -> AugmentParams:
    """Draw per-sample augmentation parameters.

    Distributions mirror the reference's sampling
    (tensorflow/simple_data_generator.py:72-95, pytorch/Datagenerators.py:169-185):
    uniform angle in +-rotation_range, uniform shifts in +-xy_shifts, uniform
    scale in zoom_range, Bernoulli(0.5) flips gated by the config switches.
    ``shear_range`` (degrees) is the keras ``ImageDataGenerator(shear_range=)``
    knob the TF stack's stock augmentation path uses
    (tensorflow/Augmentor.py:44): uniform shear intensity in +-shear_range.

    ``rotation_low``/``quadrants`` serve the canvas-bucketed warp (see
    :func:`rotation_buckets`): the angle MAGNITUDE is drawn uniform in
    [rotation_low, rotation_range] with a random sign, and ``quadrants``
    adds a uniform multiple of 90 deg (full-turn configs — the rot90
    pre-transform of the separable warp absorbs the quadrant exactly).
    """
    k_ang, k_sc, k_sx, k_sy, k_fh, k_fv, k_sh = jax.random.split(key, 7)
    if rotation_low > 0.0 or quadrants:
        k_mag, k_sgn, k_q = jax.random.split(k_ang, 3)
        mag = jax.random.uniform(
            k_mag, (batch,), minval=rotation_low, maxval=rotation_range
        )
        sign = jnp.where(
            jax.random.bernoulli(k_sgn, 0.5, (batch,)), 1.0, -1.0
        )
        angle = sign * mag
        if quadrants:
            angle = angle + 90.0 * jax.random.randint(
                k_q, (batch,), 0, 4
            ).astype(jnp.float32)
    else:
        angle = jax.random.uniform(
            k_ang, (batch,), minval=-rotation_range, maxval=rotation_range
        )
    scale = jax.random.uniform(
        k_sc, (batch,), minval=zoom_range[0], maxval=zoom_range[1]
    )
    shift_x = jax.random.uniform(k_sx, (batch,), minval=-xy_shifts, maxval=xy_shifts)
    shift_y = jax.random.uniform(k_sy, (batch,), minval=-xy_shifts, maxval=xy_shifts)
    flip_h = jax.random.bernoulli(k_fh, 0.5, (batch,)) & do_horizontal_flip
    flip_v = jax.random.bernoulli(k_fv, 0.5, (batch,)) & do_vertical_flip
    shear = (
        jax.random.uniform(
            k_sh, (batch,), minval=-shear_range, maxval=shear_range
        )
        if shear_range > 0 else None
    )
    return AugmentParams(angle, scale, shift_x, shift_y, flip_h, flip_v, shear)


def make_affine_matrix(
    params: AugmentParams, height: int, width: int
) -> jax.Array:
    """Compose the forward transform chain into per-sample 3x3 matrices.

    Order matches ``Augmentor.augment`` (pytorch/Augmentor.py:32-43):
    horizontal flip, vertical flip, scale about centre (cv2
    getRotationMatrix2D semantics, :11-29), integer shift, rotation about
    centre. Returns (B, 3, 3) forward matrices mapping input pixel
    coordinates (x, y, 1) to output coordinates.
    """
    b = params.angle_deg.shape[0]
    cx = (width - 1) / 2.0
    cy = (height - 1) / 2.0
    one = jnp.ones((b,))
    zero = jnp.zeros((b,))

    def mat(rows):
        # rows: list of 3 lists of 3 (B,) arrays -> (B, 3, 3)
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    fh = params.flip_h.astype(jnp.float32)
    fv = params.flip_v.astype(jnp.float32)
    # flip: x' = flip ? (W-1) - x : x
    flip = mat(
        [
            [1.0 - 2.0 * fh, zero, fh * (width - 1)],
            [zero, 1.0 - 2.0 * fv, fv * (height - 1)],
            [zero, zero, one],
        ]
    )
    s = params.scale
    scale = mat(
        [
            [s, zero, cx * (1.0 - s)],
            [zero, s, cy * (1.0 - s)],
            [zero, zero, one],
        ]
    )
    shift = mat(
        [
            [one, zero, params.shift_x],
            [zero, one, params.shift_y],
            [zero, zero, one],
        ]
    )
    # scipy.ndimage.rotate rotates counter-clockwise in array (row, col)
    # space for positive angles; in (x, y)-with-y-down coordinates that is a
    # clockwise rotation about the centre.
    theta = jnp.deg2rad(params.angle_deg)
    c, sn = jnp.cos(theta), jnp.sin(theta)
    rot = mat(
        [
            [c, sn, cx - c * cx - sn * cy],
            [-sn, c, cy + sn * cx - c * cy],
            [zero, zero, one],
        ]
    )
    out = rot @ shift @ scale @ flip
    if params.shear_deg is not None:
        # keras apply_affine_transform shear about the centre:
        # x' = x - sin(s)(y - cy); y' = cos(s)(y - cy) + cy
        sh = jnp.deg2rad(params.shear_deg)
        ssin, scos = jnp.sin(sh), jnp.cos(sh)
        shear = mat(
            [
                [one, -ssin, ssin * cy],
                [zero, scos, cy * (1.0 - scos)],
                [zero, zero, one],
            ]
        )
        out = out @ shear
    return out


def _cubic_weights(t: jax.Array) -> tuple[jax.Array, ...]:
    """Catmull-Rom (Keys a=-0.5) weights for taps at offsets (-1, 0, 1, 2)."""
    a = -0.5
    t2 = t * t
    t3 = t2 * t
    w0 = a * (t3 - 2.0 * t2 + t)
    w1 = (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0
    w2 = -(a + 2.0) * t3 + (2.0 * a + 3.0) * t2 - a * t
    w3 = a * (t2 - t3)
    return w0, w1, w2, w3


def _tap_offsets(order: int) -> list[tuple[int, int]]:
    """(dy, dx) neighbourhood offsets for the interpolation order."""
    rng = (0, 1) if order <= 1 else (-1, 0, 1, 2)
    return [(dy, dx) for dy in rng for dx in rng]


def _shifted_stack(image: jax.Array, order: int) -> jax.Array:
    """(H, W, C) -> ((H+2p)*(W+2p), T*C) tap table over the zero-padded
    grid: channel block t holds the padded image shifted by tap offset t.

    Turns the T separate narrow gathers of the warp into ONE gather with
    T*C-wide rows: the shifts are vectorized pad+slice copies (HBM-bandwidth
    bound, cheap), and a single wide-row gather is several times faster on
    TPU than T narrow ones (gather cost is per-row, not per-byte, at these
    row sizes). Rows are indexed by the *padded* coordinates (y0+p, x0+p),
    so bases down to -p stay exact at the borders (reads land in the zero
    rim, matching BORDER_CONSTANT 0).
    """
    h, w, c = image.shape
    p = 1 if order <= 1 else 2
    # rim of 2p: p for the out-of-range base indices, p for the tap shifts
    padded = jnp.pad(
        image, ((2 * p, 2 * p), (2 * p, 2 * p), (0, 0)), constant_values=0
    )
    # plane_t[yq, xq] = padded_image[(yq - p) + dy, (xq - p) + dx] where
    # (yq, xq) = (y0 + p, x0 + p) are padded-grid base coords; in padded
    # array coords that is a slice starting at (p + dy, p + dx).
    planes = [
        jax.lax.dynamic_slice(
            padded, (p + dy, p + dx, 0), (h + 2 * p, w + 2 * p, c)
        )
        for dy, dx in _tap_offsets(order)
    ]
    return jnp.concatenate(planes, axis=-1).reshape(
        (h + 2 * p) * (w + 2 * p), -1
    )


def affine_warp(
    image: jax.Array, forward_matrix: jax.Array, order: int = 1
) -> jax.Array:
    """Inverse-warp one (H, W, C) image by a forward 3x3 affine matrix.

    All channels are sampled together (the reference warps channel by
    channel in Python, pytorch/Augmentor.py:96-103). Out-of-bounds reads
    return 0. TPU note: the T interpolation taps are pre-shifted into one
    (H*W, T*C) table so the whole warp is ONE wide-row gather over
    flattened spatial indices (see ``_shifted_stack``) — several times
    faster than T narrow gathers on v5e.
    """
    h, w, c = image.shape
    inv = jnp.linalg.inv(forward_matrix.astype(jnp.float32))
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    tx = src_x - x0
    ty = src_y - y0
    if order <= 1:
        wx = (1.0 - tx, tx)
        wy = (1.0 - ty, ty)
    else:
        wx = _cubic_weights(tx)
        wy = _cubic_weights(ty)

    p = 1 if order <= 1 else 2
    table = _shifted_stack(image.astype(jnp.float32), order)
    # clamp the padded-grid base into range: whenever the clamp actually
    # moves the base, every tap is out of bounds (weights masked to 0), so
    # clamped reads never alias a wrong pixel
    xc = jnp.clip(x0, -p, w - 1 + p).astype(jnp.int32) + p
    yc = jnp.clip(y0, -p, h - 1 + p).astype(jnp.int32) + p
    sample = jnp.take(table, (yc * (w + 2 * p) + xc).reshape(-1), axis=0)
    sample = sample.reshape(h, w, len(wx) * len(wy), c)

    out = jnp.zeros((h, w, c), dtype=jnp.float32)
    for t, (dy, dx) in enumerate(_tap_offsets(order)):
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        j = dy if order <= 1 else dy + 1
        i = dx if order <= 1 else dx + 1
        weight = jnp.where(valid, wy[j] * wx[i], 0.0)
        out = out + weight[..., None] * sample[:, :, t, :]
    return out.astype(image.dtype)


def affine_warp_batch(
    images: jax.Array, forward_matrices: jax.Array, order: int = 1
) -> jax.Array:
    """vmapped ``affine_warp`` over a batch: (B, H, W, C), (B, 3, 3)."""
    return jax.vmap(affine_warp, in_axes=(0, 0, None))(
        images, forward_matrices, order
    )


_BUCKET_MIN_HEIGHT = 96  # below this the canvas saving is noise vs 3x compile


def _shear_limit(rotation_range: float, shear_range: float = 0.0) -> float:
    """Static bound on the separable warp's shear coefficients for a given
    rotation (+ keras shear) range in degrees: |tan| of the rot90-normalised
    combined angle (tan is superadditive on [0, 45], so tan(rot+shear)
    bounds the composed coefficient). Sizes the widened intermediate
    canvases, so small-rotation configs stay cheap."""
    deg = min(abs(float(rotation_range)) + abs(float(shear_range)), 45.0)
    return min(1.0, float(np.tan(np.deg2rad(deg))) * 1.01 + 0.01)


def rotation_buckets(
    rotation_range: float, shear_range: float = 0.0
) -> list[tuple[float, float, bool]] | None:
    """Partition the rotation draw into <=3 canvas-width buckets.

    The separable warp's intermediate canvases are sized by the STATIC
    shear bound tan(rotation range) (DESIGN.md "Augmentation"), so a
    +-180 deg config pays the 2x-wide worst-case canvas on every sample
    even though most draws are mild. Bucketing the |angle| draw into
    equal-measure thirds and compiling one warp per bucket (``lax.switch``
    on a per-STEP bucket index) keeps every shape static while the
    EXPECTED canvas width drops to the mean of the three bounds; the
    marginal per-sample angle distribution is exactly unchanged (uniform
    bucket index x uniform magnitude within the bucket = uniform overall).
    The one behavioural delta: samples within one microbatch share a
    magnitude class (the step-level index) — class mixing happens across
    steps, which SGD does not notice.

    Returns ``[(low_deg, high_deg, quadrants), ...]`` or ``None`` when
    bucketing cannot help / be exact: ranges <= 20 deg (canvas already
    narrow), partial turns in (45, 180) (the rot90-normalised residual of
    a uniform draw is NOT uniform there), and shear-augmented configs
    (the keras shear adds to the bound independently of the angle).
    """
    r = abs(float(rotation_range))
    if shear_range or r <= 20.0:
        return None
    # (callers additionally gate on image height >= _BUCKET_MIN_HEIGHT)
    if r <= 45.0:
        dom, quad = r, False
    elif r == 180.0:
        # uniform full turn == uniform quadrant + uniform +-45 residual;
        # the rot90 pre-transform absorbs the quadrant exactly. Ranges
        # in (45, 180) or beyond 180 do NOT reduce to this form (a
        # uniform +-200 draw mod 360 has double density on part of the
        # circle) — those fall back to the single-canvas path.
        dom, quad = 45.0, True
    else:
        return None
    return [
        (0.0, dom / 3.0, quad),
        (dom / 3.0, 2.0 * dom / 3.0, quad),
        (2.0 * dom / 3.0, dom, quad),
    ]


def _kernel_weights(d: jax.Array, order: int) -> jax.Array:
    """Interpolation kernel evaluated at continuous offsets ``d``.

    order<=1: linear hat; order>=2: Catmull-Rom (Keys a=-0.5) — the same
    kernels as :func:`affine_warp`'s tap weights, as a function of distance.
    """
    ad = jnp.abs(d)
    if order <= 1:
        return jnp.maximum(0.0, 1.0 - ad)
    a = -0.5
    ad2, ad3 = ad * ad, ad * ad * ad
    near = (a + 2.0) * ad3 - (a + 3.0) * ad2 + 1.0
    far = a * (ad3 - 5.0 * ad2 + 8.0 * ad - 4.0)
    return jnp.where(ad < 1.0, near, jnp.where(ad < 2.0, far, 0.0))


def _row_fractional_shift(
    images: jax.Array,
    offsets: jax.Array,
    order: int,
    out_width: int | None = None,
    out_origin: int = 0,
    max_offset: int | None = None,
) -> jax.Array:
    """Per-row fractional x-shift: ``out[b, y, x] = img[b, y, x + o[b, y]]``.

    The TPU-friendly shear primitive, gather-free. XLA gathers on v5e pay a
    large per-row cost (a row-level dynamic-slice formulation of this shift
    measured 46 ms at B=256/H=W=192; a per-pixel gather 222 ms), so the
    shift is decomposed radix-K instead: ``o = K*c + rho`` with integer
    coarse digit ``c`` and residual ``rho in [0, K)``:

    * stage A selects among ~2*(W/2)/K+1 statically-shifted copies of each
      row by a one-hot weight (a (B, H, NC) einsum over slices of the padded
      image — pure VPU multiply-adds XLA fuses over the slices),
    * stage B applies the interpolation kernel evaluated at ``rho`` over the
      K+taps static sub-shifts of stage A's output — the same einsum shape.

    Both stages are elementwise-bandwidth bound (13 ms in bf16 at
    B=256/192px) and bit-exact vs direct indexing in f32. Computation runs
    in the input dtype; reads outside the image are 0.

    Generalised contract (used by the separable warp's widened
    intermediates): ``out[b, y, j] = img[b, y, j + out_origin + o[b, y]]``
    for ``j in [0, out_width)``; ``max_offset`` is the static bound on
    ``|o|`` (defaults to W/2 + 1), which sizes the coarse-digit coverage —
    offsets beyond it are clamped to the zero border.
    """
    b, h, w, c = images.shape
    w_out = w if out_width is None else out_width
    dt = images.dtype
    radix = min(14, max(2, w // 8))
    omax = (w // 2 + 1) if max_offset is None else max(int(max_offset), 1)
    cmax = omax // radix + 1
    lo, hi = (0, radix) if order <= 1 else (-1, radix + 2)
    ntap = hi - lo + 1
    pad_amt = (
        abs(out_origin) + cmax * radix + radix + 4 + max(0, w_out - w)
    )

    c_idx = jnp.floor(offsets / radix).astype(jnp.int32)
    c_idx = jnp.clip(c_idx, -cmax, cmax)
    rho = (offsets - c_idx.astype(jnp.float32) * radix).astype(jnp.float32)

    padded = jnp.pad(images, ((0, 0), (0, 0), (pad_amt, pad_amt), (0, 0)))
    # stage A: a[j] = img[j + out_origin + radix*c] for j in [lo, w_out-1+hi]
    planes = jnp.stack(
        [
            jax.lax.slice_in_dim(
                padded, pad_amt + out_origin + radix * cc + lo,
                pad_amt + out_origin + radix * cc + lo + w_out + ntap - 1,
                axis=2,
            )
            for cc in range(-cmax, cmax + 1)
        ],
        axis=3,
    )  # (B, H, w_out+ntap-1, NC, C)
    onehot = (
        c_idx[..., None] == jnp.arange(-cmax, cmax + 1)[None, None, :]
    ).astype(dt)
    a = jnp.einsum("bhwnc,bhn->bhwc", planes, onehot)

    # stage B: out[j] = sum_t kernel(rho - t) * a[j + t], t in [lo, hi]
    j = jnp.arange(lo, hi + 1, dtype=jnp.float32)
    wts = _kernel_weights(rho[..., None] - j[None, None, :], order).astype(dt)
    taps = jnp.stack(
        [jax.lax.slice_in_dim(a, t, t + w_out, axis=2) for t in range(ntap)],
        axis=3,
    )
    return jnp.einsum("bhwnc,bhn->bhwc", taps, wts)


def _row_resample(
    images: jax.Array,
    stride: jax.Array,
    offset: jax.Array,
    order: int,
    out_width: int | None = None,
) -> jax.Array:
    """Per-frame uniform 1-D resample along x: ``out[.., xo] = img[.., u]``,
    ``u = stride[b]*xo + offset[b]`` — a batched (W_in x W_out) matmul on
    the MXU (dense kernel matrix; out-of-range taps get weight 0, giving the
    zero border for free). ``u`` is in input-INDEX space; callers fold any
    canvas-origin shifts into ``offset``."""
    b, h, w, c = images.shape
    w_out = w if out_width is None else out_width
    xo = jnp.arange(w_out, dtype=jnp.float32)
    u = stride[:, None] * xo[None, :] + offset[:, None]  # (B, W_out)
    xi = jnp.arange(w, dtype=jnp.float32)
    kmat = _kernel_weights(xi[None, :, None] - u[:, None, :], order)
    # f32 accumulation on the MXU; CPU's dot thunk lacks bf16xbf16->f32, and
    # there the sum has <= 4 nonzero terms, so native-dtype accumulate is fine
    acc = jnp.float32 if jax.default_backend() != "cpu" else None
    return jnp.einsum(
        "bhxc,bxX->bhXc", images, kmat.astype(images.dtype),
        preferred_element_type=acc,
    ).astype(images.dtype)


def affine_warp_separable_batch(
    images: jax.Array,
    forward_matrices: jax.Array,
    order: int = 1,
    shear_limit: float = 1.0,
) -> jax.Array:
    """Separable affine warp: shear row-gathers + per-frame resample matmuls.

    Same contract as :func:`affine_warp_batch` (inverse-warp by per-sample
    forward 3x3 affines, zero border) but ~20x faster on TPU: the per-pixel
    gather (B*H*W narrow rows — gather cost on TPU is per row) is replaced by

    1. an optional rot90 pre-transform (flip+transpose, selected per sample
       so the x-shear coefficient satisfies |q| <= 1 — handles angles near
       90 deg where the two-pass factorisation degenerates),
    2. pass X: per-row fractional shift by q*(y-cy) (B*H row-level gathers,
       :func:`_row_fractional_shift`) then a per-frame uniform resample
       matmul (:func:`_row_resample`),
    3. pass Y: the same along columns (via transpose).

    The factorisation is the classic two-pass decomposition
    (src_x = p*xo + q*y + r; src_y = a11*yo + a10*xo + t1). Interpolation is
    applied per 1-D pass, so results differ from the exact 2-D kernel at the
    sub-percent level on smooth images (tested); augmentation-statistics
    parity is the contract here (DESIGN.md), not pixel equality.
    The rot90 pre-transform requires square images (the problem's crops are
    always 192x192); non-square inputs fall back to the exact gather warp.
    """
    bsz, h, w, c = images.shape
    if h != w:
        return affine_warp_batch(images, forward_matrices, order)
    inv = jnp.linalg.inv(forward_matrices.astype(jnp.float32))  # (B, 3, 3)

    # rot90 pre-transform when |a01| > |a11|: img2[y2, x2] = img[x2, W-1-y2]
    # i.e. (x, y) = G (x2, y2), G = [[0, -1, W-1], [1, 0, 0]]; warping img2
    # by G^-1 @ I is exact (G is a permutation+flip, no resampling).
    use90 = jnp.abs(inv[:, 0, 1]) > jnp.abs(inv[:, 1, 1])
    g_inv = jnp.array(
        [[0.0, 1.0, 0.0], [-1.0, 0.0, float(w - 1)], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    inv90 = jnp.einsum("ij,bjk->bik", g_inv, inv)
    img90 = jnp.flip(jnp.swapaxes(images, 1, 2), axis=1)
    # compute in the input dtype: f32 paths stay exact for tests; the train
    # pipeline feeds bf16 (pixel noise ~1/255-level, halves all pass traffic)
    x = jnp.where(use90[:, None, None, None], img90, images)
    iv = jnp.where(use90[:, None, None], inv90, inv)

    a00, a01, t0 = iv[:, 0, 0], iv[:, 0, 1], iv[:, 0, 2]
    a10, a11, t1 = iv[:, 1, 0], iv[:, 1, 1], iv[:, 1, 2]
    # guard the (measure-zero) case |a01| == |a11| == 0 degenerating
    safe_a11 = jnp.where(jnp.abs(a11) < 1e-6, 1e-6, a11)
    q = a01 / safe_a11
    p = a00 - q * a10
    r = t0 - q * t1

    # Each pass interpolates twice (shear blend + resample kernel), so a
    # bilinear kernel here smooths FOUR times per pixel — measurably softer
    # images than the exact warp, which cost ~1 px of converged val L2 on
    # the flagship task. Catmull-Rom's negative lobes preserve amplitude
    # under repeated application, so the separable passes always use it;
    # integer shifts, flips and the rot90 branch remain exact (the kernel
    # is a delta at integer offsets).
    o = max(int(order), 3)
    cy = (h - 1) / 2.0
    # Shear coefficients are pure rotation terms for this augmentation
    # family (isotropic zoom cancels in a01/a11 and a10/a11; flips only flip
    # signs), and the rot90 selection bounds them by tan(45 deg) = 1.
    # ``shear_limit`` is the caller's static bound (tan of the rotation
    # range) — it sizes both the widened intermediate canvases and the
    # radix coverage, so small-rotation configs stay cheap.
    lim = float(min(max(shear_limit, 1e-3), 1.0))
    e = int(np.ceil(lim * cy)) + 2  # canvas extension / max shear offset
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    # pass X: u = p*xo + q*y + r. Shear FIRST onto a widened canvas
    # (x' in [-e, w+e)) — truncating to [0, w) here would cut content the
    # stride-p resample legitimately reads back (|p| > 1 under zoom/flips)
    # — then resample consumes the wide canvas (index = coord + e).
    x = _row_fractional_shift(
        x, q[:, None] * ys[None, :], o,
        out_width=w + 2 * e, out_origin=-e, max_offset=e,
    )
    x = _row_resample(x, p, (r + q * cy) + e, o, out_width=w)
    # pass Y: v = a11*yo + a10*xo + t1, along columns. Resample FIRST onto a
    # widened canvas (y' in [-e, h+e), index j <-> coord j - e), THEN shear
    # by g = a10/a11 (bounded like q; raw a10 is NOT bounded under zoom).
    x = jnp.swapaxes(x, 1, 2)
    g = a10 / safe_a11
    x = _row_resample(
        x, a11, (t1 + a10 * cy) - a11 * e, o, out_width=h + 2 * e
    )
    xs = jnp.arange(w, dtype=jnp.float32) - cy
    x = _row_fractional_shift(
        x, g[:, None] * xs[None, :], o,
        out_width=h, out_origin=e, max_offset=e,
    )
    x = jnp.swapaxes(x, 1, 2)
    return x.astype(images.dtype)


def transform_points(points_xy: jax.Array, forward_matrices: jax.Array):
    """Apply per-sample forward 3x3 affines to (B, K, 2) [x, y] points."""
    ones = jnp.ones((*points_xy.shape[:-1], 1), points_xy.dtype)
    ph = jnp.concatenate([points_xy, ones], axis=-1)  # (B, K, 3)
    out = jnp.einsum("bij,bkj->bki", forward_matrices.astype(points_xy.dtype),
                     ph)
    return out[..., :2]


def augment_images_and_peaks(
    key: jax.Array,
    images: jax.Array,
    peaks_xy: jax.Array,
    peak_vals: jax.Array,
    sigma: float = 3.0,
    rotation_range: float = 30.0,
    xy_shifts: float = 10.0,
    zoom_range: tuple[float, float] = (1.0, 1.0),
    do_horizontal_flip: bool = True,
    do_vertical_flip: bool = True,
    shear_range: float = 0.0,
    order: int = 1,
    method: str = "separable",
) -> tuple[jax.Array, jax.Array]:
    """Warp images; transform peaks and re-render exact Gaussian targets.

    The TPU-fast augmentation path: target confidence maps are synthetic
    sigma-Gaussians, so instead of warping all K target channels through the
    (gather-bound) resampler, only the image channels are warped and the
    targets are re-rendered at the transformed peak coordinates — the
    reference's own ``ensure_sigma`` semantics
    (tensorflow/simple_data_generator.py:119-136), and ~5x less gather work
    for the flagship (4 image channels vs 4+18).

    Args:
      images: (B, H, W, C); peaks_xy: (B, K, 2) [x, y]; peak_vals: (B, K)
        target amplitudes (0 for absent keypoints -> zero map).

    Returns:
      (warped images, rendered (B, H, W, K) confmaps).
    """
    warped, maps, _ = augment_views_and_peaks(
        key, images, peaks_xy, peak_vals, num_views=1, sigma=sigma,
        rotation_range=rotation_range, xy_shifts=xy_shifts,
        zoom_range=zoom_range, do_horizontal_flip=do_horizontal_flip,
        do_vertical_flip=do_vertical_flip, shear_range=shear_range,
        order=order, method=method,
    )
    return warped, maps


def augment_views_and_peaks(
    key: jax.Array,
    images: jax.Array,
    peaks_xy: jax.Array,
    peak_vals: jax.Array,
    num_views: int = 1,
    sigma: float = 3.0,
    rotation_range: float = 30.0,
    xy_shifts: float = 10.0,
    zoom_range: tuple[float, float] = (1.0, 1.0),
    do_horizontal_flip: bool = True,
    do_vertical_flip: bool = True,
    shear_range: float = 0.0,
    order: int = 1,
    method: str = "separable",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Independent per-camera-view augmentation with re-rendered targets.

    The multicam models stack camera views as contiguous channel blocks
    (view v owns channels [v*c, (v+1)*c) of the image and [v*k, (v+1)*k) of
    the targets — data/preprocess.py reshape_for_all_cams_18_points). The
    reference augments each view of an ``ALL_CAMS_18_POINTS`` sample with
    its OWN random affine (pytorch/Datagenerators.py:141-153 ``augment_view``
    per split); a single shared transform would shrink the augmentation
    space 4-fold. Here views fold into the batch axis — one
    ``(B*V)``-matrix batched warp, no per-view Python loop.

    Args:
      images: (B, H, W, V*c) view-blocked channels; peaks_xy: (B, V*k, 2)
        view-blocked keypoints; peak_vals: (B, V*k); num_views: V.

    Returns:
      (warped images, rendered (B, H, W, V*k) confmaps, (B, V, 3, 3)
      per-view forward matrices — camera-matrix models compose these into
      P/P_inv via :func:`..geometry.compose_affine_into_cameras`).

    Wide-rotation configs on the separable path are canvas-BUCKETED
    (see :func:`rotation_buckets`): a per-call bucket index selects one of
    three compiled warp branches via ``lax.switch``, so mild draws pay a
    narrow intermediate canvas instead of the worst-case one. Tiny images
    (below ``_BUCKET_MIN_HEIGHT``) skip bucketing — the canvas saving is
    a few pixels there while the 3x warp compile is real (test fixtures,
    the driver dryrun's 48px shapes).
    """
    buckets = (
        rotation_buckets(rotation_range, shear_range)
        if method == "separable" and images.shape[1] >= _BUCKET_MIN_HEIGHT
        else None
    )
    if buckets:
        from functools import partial

        bkey, akey = jax.random.split(key)
        bidx = jax.random.randint(bkey, (), 0, len(buckets))
        branches = [
            partial(
                _augment_views_core,
                num_views=num_views, sigma=sigma,
                rotation_range=hi, rotation_low=lo, quadrants=qd,
                xy_shifts=xy_shifts, zoom_range=zoom_range,
                do_horizontal_flip=do_horizontal_flip,
                do_vertical_flip=do_vertical_flip,
                shear_range=shear_range, order=order, method=method,
                shear_limit=_shear_limit(hi, shear_range),
            )
            for (lo, hi, qd) in buckets
        ]
        return jax.lax.switch(
            bidx, branches, akey, images, peaks_xy, peak_vals
        )
    return _augment_views_core(
        key, images, peaks_xy, peak_vals, num_views=num_views, sigma=sigma,
        rotation_range=rotation_range, rotation_low=0.0, quadrants=False,
        xy_shifts=xy_shifts, zoom_range=zoom_range,
        do_horizontal_flip=do_horizontal_flip,
        do_vertical_flip=do_vertical_flip, shear_range=shear_range,
        order=order, method=method,
        shear_limit=_shear_limit(rotation_range, shear_range),
    )


def _augment_views_core(
    key: jax.Array,
    images: jax.Array,
    peaks_xy: jax.Array,
    peak_vals: jax.Array,
    *,
    num_views: int,
    sigma: float,
    rotation_range: float,
    rotation_low: float,
    quadrants: bool,
    xy_shifts: float,
    zoom_range: tuple[float, float],
    do_horizontal_flip: bool,
    do_vertical_flip: bool,
    shear_range: float,
    order: int,
    method: str,
    shear_limit: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One (possibly bucket-constrained) draw + warp + target re-render."""
    from .gaussian import confmaps_from_peaks

    b, h, w, ctot = images.shape
    v = int(num_views)
    params = sample_augment_params(
        key, b * v,
        rotation_range=rotation_range,
        xy_shifts=xy_shifts,
        zoom_range=zoom_range,
        do_horizontal_flip=do_horizontal_flip,
        do_vertical_flip=do_vertical_flip,
        shear_range=shear_range,
        rotation_low=rotation_low,
        quadrants=quadrants,
    )
    mats = make_affine_matrix(params, h, w)  # (B*V, 3, 3)

    if v > 1:
        c = ctot // v
        assert c * v == ctot, (ctot, v)
        # (B, H, W, V, c) -> (B, V, H, W, c) -> (B*V, H, W, c): views ride
        # the batch axis, so the warp stays ONE batched kernel
        imgs_v = jnp.transpose(
            images.reshape(b, h, w, v, c), (0, 3, 1, 2, 4)
        ).reshape(b * v, h, w, c)
    else:
        imgs_v = images
    if method == "separable":
        warped = affine_warp_separable_batch(
            imgs_v, mats, order, shear_limit=shear_limit,
        )
    else:
        warped = affine_warp_batch(imgs_v, mats, order)
    if v > 1:
        c = ctot // v
        warped = jnp.transpose(
            warped.reshape(b, v, h, w, c), (0, 2, 3, 1, 4)
        ).reshape(b, h, w, ctot)

    ktot = peaks_xy.shape[1]
    k = ktot // v
    pk_v = peaks_xy.astype(jnp.float32).reshape(b * v, k, 2)
    new_peaks = transform_points(pk_v, mats).reshape(b, ktot, 2)
    maps = confmaps_from_peaks(new_peaks, (h, w), sigma)
    maps = maps * peak_vals[:, None, None, :]
    return warped, maps, mats.reshape(b, v, 3, 3)


def augment_pair(
    key: jax.Array,
    images: jax.Array,
    confmaps: jax.Array,
    rotation_range: float = 30.0,
    xy_shifts: float = 10.0,
    zoom_range: tuple[float, float] = (1.0, 1.0),
    do_horizontal_flip: bool = True,
    do_vertical_flip: bool = True,
    shear_range: float = 0.0,
    order: int = 1,
    method: str = "separable",
    num_views: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Apply identical per-sample random affines to images and confmaps.

    The single entry point replacing ``SimpleDataGenerator.perform_augmentations``
    (tensorflow/simple_data_generator.py:72-95): one transform is drawn per
    sample and applied to both the input stack and the target confmaps, fused
    into one warp over the channel-concatenated tensor.

    ``num_views > 1`` draws an independent transform per camera-view channel
    block (pytorch/Datagenerators.py:141-153 ``ALL_CAMS_18_POINTS``
    semantics): view v owns image channels [v*ci/V, ...) and confmap
    channels [v*cm/V, ...), each warped with its own matrix (views fold into
    the batch axis — still one batched warp).

    Note: the default ``method='separable'`` promotes the interpolation
    kernel to Catmull-Rom (order >= 3, see
    :func:`affine_warp_separable_batch`), whose negative lobes can ring
    below zero; warped confmap targets are clamped to >= 0 so the Gaussian
    targets never go negative (the exact order-1 warp never produced
    negatives).
    """
    buckets = (
        rotation_buckets(rotation_range, shear_range)
        if method == "separable" and images.shape[1] >= _BUCKET_MIN_HEIGHT
        else None
    )
    if buckets:
        from functools import partial

        bkey, akey = jax.random.split(key)
        bidx = jax.random.randint(bkey, (), 0, len(buckets))
        branches = [
            partial(
                _augment_pair_core,
                rotation_range=hi, rotation_low=lo, quadrants=qd,
                xy_shifts=xy_shifts, zoom_range=zoom_range,
                do_horizontal_flip=do_horizontal_flip,
                do_vertical_flip=do_vertical_flip,
                shear_range=shear_range, order=order, method=method,
                num_views=num_views,
                shear_limit=_shear_limit(hi, shear_range),
            )
            for (lo, hi, qd) in buckets
        ]
        return jax.lax.switch(bidx, branches, akey, images, confmaps)
    return _augment_pair_core(
        key, images, confmaps,
        rotation_range=rotation_range, rotation_low=0.0, quadrants=False,
        xy_shifts=xy_shifts, zoom_range=zoom_range,
        do_horizontal_flip=do_horizontal_flip,
        do_vertical_flip=do_vertical_flip, shear_range=shear_range,
        order=order, method=method, num_views=num_views,
        shear_limit=_shear_limit(rotation_range, shear_range),
    )


def _augment_pair_core(
    key: jax.Array,
    images: jax.Array,
    confmaps: jax.Array,
    *,
    rotation_range: float,
    rotation_low: float,
    quadrants: bool,
    xy_shifts: float,
    zoom_range: tuple[float, float],
    do_horizontal_flip: bool,
    do_vertical_flip: bool,
    shear_range: float,
    order: int,
    method: str,
    num_views: int,
    shear_limit: float,
) -> tuple[jax.Array, jax.Array]:
    """One (possibly bucket-constrained) draw + fused image+confmap warp."""
    b, h, w, ci = images.shape
    cm = confmaps.shape[-1]
    v = int(num_views)
    params = sample_augment_params(
        key,
        b * v,
        rotation_range=rotation_range,
        xy_shifts=xy_shifts,
        zoom_range=zoom_range,
        do_horizontal_flip=do_horizontal_flip,
        do_vertical_flip=do_vertical_flip,
        shear_range=shear_range,
        rotation_low=rotation_low,
        quadrants=quadrants,
    )
    mats = make_affine_matrix(params, h, w)

    def to_views(x):
        c = x.shape[-1] // v
        return jnp.transpose(
            x.reshape(b, h, w, v, c), (0, 3, 1, 2, 4)
        ).reshape(b * v, h, w, c)

    def from_views(x, ctot):
        c = ctot // v
        return jnp.transpose(
            x.reshape(b, v, h, w, c), (0, 2, 3, 1, 4)
        ).reshape(b, h, w, ctot)

    if v > 1:
        assert ci % v == 0 and cm % v == 0, (ci, cm, v)
        stacked = jnp.concatenate(
            [to_views(images), to_views(confmaps.astype(images.dtype))],
            axis=-1,
        )
    else:
        stacked = jnp.concatenate(
            [images, confmaps.astype(images.dtype)], axis=-1
        )
    if method == "separable":
        warped = affine_warp_separable_batch(
            stacked, mats, order, shear_limit=shear_limit,
        )
    else:
        warped = affine_warp_batch(stacked, mats, order)
    if v > 1:
        warped_imgs = from_views(warped[..., : ci // v], ci)
        warped_maps = from_views(warped[..., ci // v :], cm)
    else:
        warped_imgs = warped[..., :ci]
        warped_maps = warped[..., ci:]
    if method == "separable" or order >= 2:
        warped_maps = jnp.maximum(warped_maps, 0.0)
    return warped_imgs, warped_maps.astype(confmaps.dtype)
