"""Round-5: re-measure the Pallas fused encoder stages at PRODUCTION batch.

Round 2 built ops/pallas_qconv.py (whole encoder stage resident in VMEM:
int8 taps -> 128-lane int8 MXU dots -> dequant+LeakyReLU -> bf16 skips ->
in-register requant) but the axon compile helper hard-crashed at
grid >= 16, capping the kernel at toy batches. The round-5 toolchain
probe (scripts/exp_mosaic_probe.py) shows grids 16-64 now compile, so
this benchmarks the full serving stack (decode included, marginal-rate
scan) with the fused encoder vs the shipped XLA int8-resident path at the
headline batch.

Run: python scripts/exp_fused_stage_bench.py [--batch 1024]
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

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.models import build_model
from pose_estimation_amitai_tpu.models.quantized import (
    calibrate,
    make_quantized_fused_forward,
    make_quantized_resident_forward,
)
from pose_estimation_amitai_tpu.ops import peaks

B = 1024
for a in sys.argv[1:]:
    if a.startswith("--batch"):
        B = int(a.split("=", 1)[1]) if "=" in a else int(
            sys.argv[sys.argv.index(a) + 1])

K_SMALL, K_LARGE = 4, 20
HW, IN_CH, OUT_CH = 192, 4, 18


def measure(forward, base) -> tuple[float, float]:
    def make(K):
        @jax.jit
        def run(base):
            def body(c, i):
                frames = base * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
                return c, peaks.find_peaks_with_vals(forward(frames))

            _, out = jax.lax.scan(body, 0, jnp.arange(K))
            return out

        return lambda: run(base)

    r_s, r_l = make(K_SMALL), make(K_LARGE)

    def t(fn):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        return time.perf_counter() - t0

    t(r_s), t(r_l)
    t_s = min(t(r_s) for _ in range(3))
    t_l = min(t(r_l) for _ in range(3))
    marginal = (K_LARGE - K_SMALL) * B / max(t_l - t_s, 1e-9)
    whole = K_LARGE * B / t_l
    return whole, marginal


def main() -> None:
    np.asarray(jnp.zeros(()) + 1)
    cfg = Config()
    model = build_model(cfg, (HW, HW, IN_CH), OUT_CH)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32),
        model.init({"params": jax.random.key(0)},
                   jnp.zeros((1, HW, HW, IN_CH), jnp.bfloat16),
                   train=False)["params"],
    )
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((B, HW, HW, IN_CH), np.float32),
                       jnp.bfloat16)
    scales_file = "bench_scales.npz"
    try:
        with np.load(scales_file) as z:
            scales = {k: float(z[k]) for k in z.files}
    except Exception:
        scales = calibrate(
            params, rng.random((8, HW, HW, IN_CH)).astype(np.float32),
            batch=4)

    resident = make_quantized_resident_forward(
        model, params, scales, out_dtype=jnp.bfloat16)
    variants = [("xla_resident", resident)]
    for chunk in (8, 64, 256):
        variants.append((
            f"pallas_fused_chunk{chunk}",
            make_quantized_fused_forward(
                model, params, scales, out_dtype=jnp.bfloat16,
                max_chunk=chunk),
        ))

    for name, fwd in variants:
        try:
            whole, marginal = measure(fwd, base)
            print(json.dumps({
                "variant": name, "batch": B,
                "fps_whole_run": round(whole, 1),
                "fps_marginal": round(marginal, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "batch": B,
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
