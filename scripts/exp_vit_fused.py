"""Round-5 ViT serving levers, measured on the chip: the fused trunk
(LN->qkv weight fold + merged V/out projection, models/vit.py
Attention.fused_serving) vs the round-4 fast-softmax baseline, plus a
serving batch-size sweep (the round-4 verdict's third named lever).

Full-family numbers (forward + on-device argmax decode) with the
bench.py marginal-rate methodology: one jitted ``lax.scan`` movie loop,
marginal rate between two scan lengths.

Run: python scripts/exp_vit_fused.py [--batches 512,768,1024]
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

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.models import build_model
from pose_estimation_amitai_tpu.ops import peaks

HW, K_SMALL, K_LARGE = 192, 2, 8


def family_sps(model, variables, batch: int) -> float:
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((batch, HW, HW, 4)), jnp.bfloat16)

    def make(K):
        @jax.jit
        def run(base):
            def body(c, i):
                frames = base * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
                return c, peaks.find_peaks_with_vals(
                    model.apply(variables, frames, train=False)
                )

            _, out = jax.lax.scan(body, 0, jnp.arange(K))
            return out

        return lambda: run(base)

    r_s, r_l = make(K_SMALL), make(K_LARGE)

    def timed(fn):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        return time.perf_counter() - t0

    timed(r_s), timed(r_l)  # compile + warm
    t_s = min(timed(r_s) for _ in range(3))
    t_l = min(timed(r_l) for _ in range(3))
    return (K_LARGE - K_SMALL) * batch / max(t_l - t_s, 1e-9)


def main() -> None:
    np.asarray(jnp.zeros(()) + 1)
    batches = [512, 768, 1024]
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--batches" and i + 1 < len(argv):
            batches = [int(x) for x in argv[i + 1].split(",")]
        elif a.startswith("--batches="):
            batches = [int(x) for x in a.split("=", 1)[1].split(",")]

    cfg = Config(model_type=C.MODEL_18_POINTS_PER_WING_VIT,
                 dropout_ratio=0.0)
    base_model = build_model(cfg, (HW, HW, 4), 18).clone(
        normalize_output=False, fast_softmax=True
    )
    variables = base_model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, 4), jnp.bfloat16), train=False,
    )
    variables = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), variables
    )

    for name, model in (("fast_softmax(r4)", base_model),
                        ("fused_trunk(r5)",
                         base_model.clone(fused_serving=True))):
        for b in batches:
            sps = family_sps(model, variables, b)
            print(json.dumps({
                "variant": name, "batch": b,
                "samples_per_s": round(sps, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
