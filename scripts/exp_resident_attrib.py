"""Per-layer timing attribution of the int8-resident serving path
(round-3 verdict weak #1: "the int8-resident bottleneck is unattributed").

Method: rebuild models/quantized.py's resident forward as a family of
PREFIX programs (stop after layer k, materialising exactly the tensor the
real program stores at that point), run each prefix as the benched K-batch
``lax.scan`` at B=1024 with a scalar max-reduce consumer (so only a scalar
crosses the relay), and attribute layer k's cost as t_k - t_{k-1}.

Caveats (stated so the numbers are read right): the reduce adds one read
pass over each prefix's output (differs between prefixes by that tensor's
size — small vs conv cost); fusion across the cut boundary is lost, so
per-layer deltas are upper bounds within ~the epilogue cost. The TOTAL row
is the real program's time (with decode), measured identically.

Per layer, reports: dt/frame (us), analytic GMAC/frame, achieved TOP/s,
modeled int8 HBM bytes/frame (in+out stored tensors), achieved GB/s —
whichever utilisation is high names the bottleneck class.

Run on the TPU: ``python scripts/exp_resident_attrib.py``.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.models import build_model
from pose_estimation_amitai_tpu.models.quantized import (
    _conv,
    _deconv_s1,
    _deconv_s2,
    _leaky,
    _pool,
    calibrate,
    quantize_params,
)
from pose_estimation_amitai_tpu.ops import peaks

B = 1024
K_SMALL, K_LARGE = 2, 8
HW = 192

PEAK_INT8_TOPS = 394.0
PEAK_HBM_GBPS = 819.0


def build():
    cfg = Config()
    model = build_model(cfg, (HW, HW, 4), 18)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32),
        model.init({"params": jax.random.key(0)},
                   jnp.zeros((1, HW, HW, 4), jnp.bfloat16),
                   train=False)["params"],
    )
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((B, HW, HW, 4), np.float32), jnp.bfloat16)
    scales_file = "bench_scales.npz"
    try:
        with np.load(scales_file) as z:
            scales = {k: float(z[k]) for k in z.files}
    except Exception:
        scales = calibrate(params,
                           rng.random((8, HW, HW, 4)).astype(np.float32),
                           batch=4)
    return model, params, scales, base


def make_prefix_forward(q, upto: str):
    """Resident forward truncated after ``upto``; mirrors
    models/quantized.py make_quantized_resident_forward exactly."""
    inv = {n: jnp.bfloat16(1.0 / q[n]["s_x"]) for n in q}

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

    def forward(x):
        c2 = lambda a, w: _conv(a, w, 2, acc=jnp.int32)
        d2s = lambda a, w: _deconv_s2(a, w, acc=jnp.int32)
        d1s = lambda a, w: _deconv_s1(a, w, acc=jnp.int32)

        h = quant_to("conv1", x.astype(jnp.float32))
        if upto == "quant_in":
            return h
        for s in range(3):
            n1, n2, n3 = (f"conv{3 * s + k + 1}" for k in range(3))
            nxt = f"conv{3 * s + 4}" if s < 2 else "deconv1"
            q1 = quant_to(n2, _leaky(qconv(n1, h, c2)))
            if upto == n1:
                return q1
            x2 = _leaky(qconv(n2, q1, c2)) + dq(n2, q1)
            q2 = quant_to(n3, x2)
            if upto == n2:
                return q2
            x3 = _leaky(qconv(n3, q2, c2)) + dq(n3, q2)
            if s < 2:
                h = _pool(quant_to(nxt, _leaky(x3)))
            else:
                h = quant_to(nxt, x3)
            if upto == n3:
                return h
        y1 = _leaky(qconv("deconv1", h, d2s))
        q1 = quant_to("deconv2", y1)
        if upto == "deconv1":
            return q1
        y2 = _leaky(qconv("deconv2", q1, d1s)) + dq("deconv2", q1)
        q2 = quant_to("deconv3", y2)
        if upto == "deconv2":
            return q2
        y3 = _leaky(qconv("deconv3", q2, d1s)) + dq("deconv3", q2)
        q3 = quant_to("deconv4", y3)
        if upto == "deconv3":
            return q3
        maps = _leaky(qconv("deconv4", q3, d2s)).astype(jnp.bfloat16)
        if upto == "deconv4":
            return maps
        return peaks.find_peaks_with_vals(maps)  # upto == "decode"

    return forward


def marginal_time(forward, base) -> float:
    """Marginal seconds per batch between K_SMALL and K_LARGE scans."""

    def make(K):
        @jax.jit
        def run(base):
            def body(c, i):
                frames = base * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
                out = forward(frames)

                def consume(v):
                    # strided sample: forces materialisation while reading
                    # back only ~1/256 of the tensor (a full max-reduce
                    # would add one whole HBM read pass per prefix and
                    # skew the deltas)
                    if v.ndim == 4:
                        v = v[:, ::16, ::16]
                    return jnp.max(jnp.abs(v.astype(jnp.float32)))

                leaves = jax.tree_util.tree_leaves(out)
                m = jnp.stack([consume(v) for v in leaves]).sum()
                return jnp.maximum(c, m), 0

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return c

        return lambda: run(base)

    r_s, r_l = make(K_SMALL), make(K_LARGE)
    np.asarray(r_s()), np.asarray(r_l())

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    t_s = min(timed(r_s) for _ in range(3))
    t_l = min(timed(r_l) for _ in range(3))
    return max(t_l - t_s, 1e-9) / (K_LARGE - K_SMALL)


# analytic per-layer MACs/frame and stored-int8 bytes/frame (in + out)
def _layer_models():
    hw = HW
    st = [(hw, 4, 64), (hw, 64, 64), (hw, 64, 64),
          (hw // 2, 64, 128), (hw // 2, 128, 128), (hw // 2, 128, 128),
          (hw // 4, 128, 256), (hw // 4, 256, 256), (hw // 4, 256, 256)]
    out = {}
    out["quant_in"] = (0.0, hw * hw * (4 * 2 + 4))  # bf16 read, int8 write
    for i, (s, ci, co) in enumerate(st, start=1):
        macs = s * s * 9 * ci * co
        bytes_ = s * s * ci + (s // (2 if i in (3, 6) else 1)) ** 2 * co
        out[f"conv{i}"] = (macs, bytes_)
    d = hw // 4
    # transposed-conv MACs = in_pixels * k^2 * cin * cout
    out["deconv1"] = (d * d * 9 * 256 * 128, d * d * 256 + 4 * d * d * 128)
    out["deconv2"] = (4 * d * d * 9 * 128 * 128, 2 * 4 * d * d * 128)
    out["deconv3"] = (4 * d * d * 9 * 128 * 128, 2 * 4 * d * d * 128)
    out["deconv4"] = (4 * d * d * 9 * 128 * 18,
                      4 * d * d * 128 + 16 * d * d * 18 * 2)
    out["decode"] = (0.0, hw * hw * 18 * 2)
    return out


def main() -> None:
    np.asarray(jnp.zeros(()) + 1)  # claim device
    model, params, scales, base = build()
    q = quantize_params(params, scales)

    stages = (["quant_in"] + [f"conv{i}" for i in range(1, 10)]
              + [f"deconv{i}" for i in range(1, 5)] + ["decode"])
    models = _layer_models()
    t_prev, rows = 0.0, []
    for st in stages:
        fwd = make_prefix_forward(q, st)
        t = marginal_time(fwd, base)
        dt = max(t - t_prev, 0.0)
        macs, byts = models.get(st, (0.0, 0.0))
        us_pf = dt / B * 1e6
        tops = 2.0 * macs * B / max(dt, 1e-12) / 1e12
        gbps = byts * B / max(dt, 1e-12) / 1e9
        row = {
            "layer": st, "t_cum_ms": round(t * 1e3, 2),
            "dt_us_per_frame": round(us_pf, 2),
            "gmac_per_frame": round(macs / 1e9, 3),
            "tops": round(tops, 1),
            "int8_util_pct": round(100 * tops / PEAK_INT8_TOPS, 1),
            "hbm_gbps": round(gbps, 1),
            "hbm_util_pct": round(100 * gbps / PEAK_HBM_GBPS, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        t_prev = t

    total = t_prev
    print(f"TOTAL {total * 1e3:.2f} ms/batch -> {B / total:.0f} fps "
          f"(prefix-sum; bench.py's number is the same program without "
          f"the per-prefix reduce)", file=sys.stderr)
    top = sorted(rows[1:], key=lambda r: -r["dt_us_per_frame"])[:5]
    print("top costs: " + ", ".join(
        f"{r['layer']} {r['dt_us_per_frame']}us "
        f"(mxu {r['int8_util_pct']}%, hbm {r['hbm_util_pct']}%)"
        for r in top), file=sys.stderr)


if __name__ == "__main__":
    main()
