"""Polyphase decomposition of the stride-2 deconvs (serving decoder lever).

The flagship decoder's two stride-2 ConvTranspose layers run as lhs-dilated
convolutions (models/quantized.py `_deconv_s2`): the input is 2x
zero-dilated, so 3/4 of the MXU multiply-accumulates hit structural zeros.
At batch 1024 the decoder costs ~42 us/frame vs a ~31 us/frame MXU roofline
*including* those zeros — i.e. the deconvs are compute-bound, and removing
the zero work is the one decoder lever DESIGN.md has not yet measured.

Polyphase identity (k=3, s=2, flax ConvTranspose SAME == lhs_dilation 2 with
padding (2, 1), see `_deconv_s2`): output pixel (2m+a, 2n+b) only ever reads
input taps of parity (a, b), so the deconv splits into 4 phase convolutions

  phase(0,0): 2x2 kernel [[w00, w02], [w20, w22]] over x[m-1:m+1, n-1:n+1]
  phase(0,1): taps w01 (at m-1, n), w21 (at m, n)
  phase(1,0): taps w10 (at m, n-1), w12 (at m, n)
  phase(1,1): tap  w11 (at m, n)

interleaved back as out[2m+a, 2n+b] = phase(a,b)[m, n]. Two formulations:

  * `poly4`   — 4 separate convs with minimal kernels (2.25/9 of the
                dilated MACs) + stack/reshape interleave
  * `combined`— ONE 2x2 conv producing 4*Cout channels (phases embedded in
                a 2x2 kernel with zeros; 4/9 of the dilated MACs) followed
                by depth-to-space — one big MXU op, better lane utilisation

Both are exact in int8 x int8 -> int32 (integer sums, no reassociation
error). This script verifies bit-exactness against `_deconv_s2` and
measures all three at the decoder's real shapes (int8 resident path):

  deconv1: (B, 48, 48, 256) -> (B, 96, 96, 128)
  deconv4: (B, 96, 96, 128) -> (B, 192, 192, 18)

Timing: K-batch lax.scan, marginal rate between two K values (bench.py
methodology). Run on the real chip: python scripts/exp_deconv_poly.py
(add --e2e for the full resident-forward variants).

MEASURED VERDICT (v5e-1, 2026-08-19): CLOSED — do not ship.

Isolated (B=256, us/frame, sum consumer):
  deconv1: dilated 7.39 | poly4 4.93 | combined 12.27
  deconv4: dilated 7.47 | poly4 6.36 | combined 2.36

End-to-end int8-resident forward + decode (B=1024, frames/s, bit-exact
outputs verified):
  shipping (both dilated)        6,607
  poly4 deconv1 only             6,079
  combined deconv4 only          6,398
  both polyphase                 6,077

The isolated wins are an artifact of the sum consumer: a reduction reads
THROUGH the stack/transpose, so XLA never materialises the interleave. In
the real program the next conv (deconv1's case) and the peak decode
(deconv4's case) need the interleaved layout, and the extra
depth-to-space materialisation pass costs more than the removed zero-MACs
— the dilated deconv's epilogue instead fuses straight into the conv.
Same verdict family as the im2col conv and fused-attention experiments
(DESIGN.md): XLA's conv + fused epilogue is the speed-of-light path here.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pose_estimation_amitai_tpu.models.quantized import _deconv_s2  # noqa: E402

B = 256
K_SMALL, K_LARGE = 2, 10
_DN = ("NHWC", "HWIO", "NHWC")


def _conv_p(x, w, padding):
    return lax.conv_general_dilated(
        x, w, (1, 1), padding, dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


def _interleave(ph00, ph01, ph10, ph11):
    """4 x (B, H, W, C) phase maps -> (B, 2H, 2W, C)."""
    b, h, w, c = ph00.shape
    rows = jnp.stack(
        [jnp.stack([ph00, ph01], axis=3), jnp.stack([ph10, ph11], axis=3)],
        axis=2,
    )  # (B, H, 2a, W, 2b, C)
    return rows.reshape(b, 2 * h, 2 * w, c)


def deconv_s2_poly4(x, w):
    """4-phase exact polyphase form of `_deconv_s2` (minimal kernels)."""
    # w: (3, 3, Cin, Cout)
    k00 = w[0::2, 0::2]                      # (2, 2, Cin, Cout)
    k01 = w[0::2, 1:2]                       # (2, 1, ...)
    k10 = w[1:2, 0::2]                       # (1, 2, ...)
    k11 = w[1:2, 1:2]                        # (1, 1, ...)
    ph00 = _conv_p(x, k00, [(1, 0), (1, 0)])
    ph01 = _conv_p(x, k01, [(1, 0), (0, 0)])
    ph10 = _conv_p(x, k10, [(0, 0), (1, 0)])
    ph11 = _conv_p(x, k11, [(0, 0), (0, 0)])
    return _interleave(ph00, ph01, ph10, ph11)


def poly_combined_kernel(w: np.ndarray) -> np.ndarray:
    """(3, 3, Cin, Cout) -> (2, 2, Cin, 4*Cout) phase-embedded kernel.

    Phase p = 2a + b lives at output channels [p*Cout, (p+1)*Cout); all
    phases share the (1, 0)/(1, 0) padding of the 2x2 footprint, with the
    narrow phases' unused taps zeroed.
    """
    w = np.asarray(w)
    cin, cout = w.shape[2], w.shape[3]
    k = np.zeros((2, 2, cin, 4 * cout), w.dtype)
    # phase (0, 0): full 2x2 of the even-parity taps
    k[:, :, :, 0 * cout : 1 * cout] = w[0::2, 0::2]
    # phase (0, 1): taps (m-1, n), (m, n) -> kernel positions (0, 1), (1, 1)
    k[0, 1, :, 1 * cout : 2 * cout] = w[0, 1]
    k[1, 1, :, 1 * cout : 2 * cout] = w[2, 1]
    # phase (1, 0): taps (m, n-1), (m, n) -> kernel positions (1, 0), (1, 1)
    k[1, 0, :, 2 * cout : 3 * cout] = w[1, 0]
    k[1, 1, :, 2 * cout : 3 * cout] = w[1, 2]
    # phase (1, 1): tap (m, n) -> kernel position (1, 1)
    k[1, 1, :, 3 * cout : 4 * cout] = w[1, 1]
    return k


def deconv_s2_combined(x, k4):
    """One 2x2 conv to 4*Cout channels + depth-to-space; exact."""
    y = _conv_p(x, k4, [(1, 0), (1, 0)])     # (B, H, W, 4*Cout)
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, 2, 2, c)          # (.., a, b, C)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))  # (B, H, a, W, b, C)
    return y.reshape(b, 2 * h, 2 * w, c)


def check_exact():
    rng = np.random.default_rng(0)
    for cin, cout, hw in ((256, 128, 48), (128, 18, 96), (64, 32, 12)):
        x = jnp.asarray(rng.integers(-127, 128, (2, hw, hw, cin)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
        ref = np.asarray(_deconv_s2(x, w, acc=jnp.int32))
        p4 = np.asarray(jax.jit(deconv_s2_poly4)(x, w))
        k4 = jnp.asarray(poly_combined_kernel(np.asarray(w)))
        cb = np.asarray(jax.jit(deconv_s2_combined)(x, k4))
        assert ref.shape == p4.shape == cb.shape, (ref.shape, p4.shape)
        assert (ref == p4).all(), f"poly4 mismatch at {cin}x{cout}"
        assert (ref == cb).all(), f"combined mismatch at {cin}x{cout}"
    print("[exact] poly4 + combined bit-exact vs _deconv_s2", flush=True)


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
    return (t_l - t_s) / ((K_LARGE - K_SMALL) * B) * 1e6


def scan_program(step, x):
    def make(K):
        @jax.jit
        def run(x):
            def body(c, i):
                y = step((x + (i % 2).astype(jnp.int8)).astype(jnp.int8))
                return c, jnp.sum(y, dtype=jnp.int32)

            _, out = jax.lax.scan(body, 0, jnp.arange(K))
            return out

        return lambda: run(x)

    return make


def make_resident_variant(model, params, scales, p1: bool, p4: bool):
    """The int8-resident forward (models/quantized.py) with the stride-2
    deconvs optionally swapped to their polyphase forms — bit-identical
    outputs (per-phase epilogues are the same per-element f32 math)."""
    from pose_estimation_amitai_tpu.models import quantized as Q

    q = Q.quantize_params(params, scales)
    inv = {n: jnp.bfloat16(1.0 / q[n]["s_x"]) for n in q}
    k4 = jnp.asarray(poly_combined_kernel(np.asarray(q["deconv4"]["w_q"])))
    mult4 = jnp.tile(q["deconv4"]["mult"], 4)
    bias4 = jnp.tile(q["deconv4"]["bias"], 4)

    def quant_to(name, x):
        return jnp.clip(
            jnp.round((x.astype(jnp.bfloat16) * inv[name]).astype(
                jnp.float32)), -127, 127,
        ).astype(jnp.int8)

    def qconv(name, x_q, conv_fn):
        layer = q[name]
        y = conv_fn(x_q, layer["w_q"]).astype(jnp.float32)
        return y * layer["mult"] + layer["bias"]

    def dq(name, x_q):
        return x_q.astype(jnp.float32) * jnp.float32(q[name]["s_x"])

    def phases(x, w):
        conv = lambda v, k, pad: lax.conv_general_dilated(
            v, k, (1, 1), pad, dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        return (
            conv(x, w[0::2, 0::2], [(1, 0), (1, 0)]),
            conv(x, w[0::2, 1:2], [(1, 0), (0, 0)]),
            conv(x, w[1:2, 0::2], [(0, 0), (1, 0)]),
            conv(x, w[1:2, 1:2], [(0, 0), (0, 0)]),
        )

    def forward(x):
        c2 = lambda a, w: Q._conv(a, w, 2, acc=jnp.int32)
        d2s = lambda a, w: Q._deconv_s2(a, w, acc=jnp.int32)
        d1s = lambda a, w: Q._deconv_s1(a, w, acc=jnp.int32)
        h = quant_to("conv1", x.astype(jnp.float32))
        for s in range(3):
            n1, n2, n3 = (f"conv{3 * s + k + 1}" for k in range(3))
            nxt = f"conv{3 * s + 4}" if s < 2 else "deconv1"
            q1 = quant_to(n2, Q._leaky(qconv(n1, h, c2)))
            x2 = Q._leaky(qconv(n2, q1, c2)) + dq(n2, q1)
            q2 = quant_to(n3, x2)
            x3 = Q._leaky(qconv(n3, q2, c2)) + dq(n3, q2)
            h = Q._pool(quant_to(nxt, Q._leaky(x3))) if s < 2 else quant_to(
                nxt, x3)
        if p1:
            d1l = q["deconv1"]
            q1 = _interleave(*(
                quant_to("deconv2", Q._leaky(
                    ph.astype(jnp.float32) * d1l["mult"] + d1l["bias"]))
                for ph in phases(h, d1l["w_q"])
            ))
        else:
            q1 = quant_to("deconv2", Q._leaky(qconv("deconv1", h, d2s)))
        y2 = Q._leaky(qconv("deconv2", q1, d1s)) + dq("deconv2", q1)
        q2 = quant_to("deconv3", y2)
        y3 = Q._leaky(qconv("deconv3", q2, d1s)) + dq("deconv3", q2)
        q3 = quant_to("deconv4", y3)
        if p4:
            z = _conv_p(q3, k4, [(1, 0), (1, 0)]).astype(jnp.float32)
            z = Q._leaky(z * mult4 + bias4).astype(jnp.bfloat16)
            b, hh, ww, c4 = z.shape
            c = c4 // 4
            z = z.reshape(b, hh, ww, 2, 2, c)
            return jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(
                b, 2 * hh, 2 * ww, c)
        return Q._leaky(qconv("deconv4", q3, d2s)).astype(jnp.bfloat16)

    return forward


def e2e():
    """Full resident-forward + decode throughput of the 4 variants."""
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.models import build_model
    from pose_estimation_amitai_tpu.models.quantized import calibrate
    from pose_estimation_amitai_tpu.ops import peaks

    hw, in_ch, out_ch, bb = 192, 4, 18, 1024
    cfg = Config()
    model = build_model(cfg, (hw, hw, in_ch), out_ch)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32),
        model.init({"params": jax.random.key(0)},
                   jnp.zeros((1, hw, hw, in_ch), jnp.bfloat16),
                   train=False)["params"],
    )
    rng = np.random.default_rng(0)
    scales = calibrate(
        params, rng.random((8, hw, hw, in_ch)).astype(np.float32), batch=4
    )
    variants = {
        "shipping": (False, False),
        "d1_poly4": (True, False),
        "d4_combined": (False, True),
        "both_poly": (True, True),
    }
    fwds = {
        k: make_resident_variant(model, params, scales, *v)
        for k, v in variants.items()
    }
    # bit-exactness across all variants
    x8 = jnp.asarray(rng.random((8, hw, hw, in_ch), np.float32), jnp.bfloat16)
    ref = np.asarray(jax.jit(fwds["shipping"])(x8))
    for k, f in fwds.items():
        assert (np.asarray(jax.jit(f)(x8)) == ref).all(), f"{k} not exact"
    print("[e2e] all variants bit-exact", flush=True)

    base = jnp.asarray(rng.random((bb, hw, hw, in_ch), np.float32),
                       jnp.bfloat16)

    def scan_runner(forward):
        def make(K):
            @jax.jit
            def run(base):
                def body(c, i):
                    frames = base * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
                    return c, peaks.find_peaks_with_vals(forward(frames))

                _, out = jax.lax.scan(body, 0, jnp.arange(K))
                return out

            return lambda: run(base)

        return make

    def fps(make_run, ks=4, kl=20):
        rs, rl = make_run(ks), make_run(kl)
        np.asarray(rs())
        np.asarray(rl())

        def timed(fn):
            t0 = time.perf_counter()
            np.asarray(fn())
            return time.perf_counter() - t0

        t_s = min(timed(rs) for _ in range(3))
        t_l = min(timed(rl) for _ in range(3))
        return (kl - ks) * bb / (t_l - t_s)

    out = {k: round(fps(scan_runner(f)), 1) for k, f in fwds.items()}
    print(json.dumps(out))


def main():
    check_exact()
    rng = np.random.default_rng(1)
    out = {}
    for name, cin, cout, hw in (
        ("deconv1", 256, 128, 48),
        ("deconv4", 128, 18, 96),
    ):
        x = jnp.asarray(rng.integers(-127, 128, (B, hw, hw, cin)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
        k4 = jnp.asarray(poly_combined_kernel(np.asarray(w)))
        rows = {
            "dilated": scan_program(lambda v: _deconv_s2(v, w, acc=jnp.int32), x),
            "poly4": scan_program(lambda v: deconv_s2_poly4(v, w), x),
            "combined": scan_program(lambda v: deconv_s2_combined(v, k4), x),
        }
        out[name] = {
            k: round(marginal_us_per_frame(mk), 2) for k, mk in rows.items()
        }
        print(f"[{name}] us/frame: {out[name]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--e2e" in sys.argv:
        e2e()
    else:
        main()
