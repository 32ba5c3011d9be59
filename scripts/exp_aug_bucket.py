"""A/B of the round-5 canvas-bucketed warp vs the single-canvas path.

Times ONLY the augmentation call (augment_views_and_peaks: warp 4 image
channels + re-render 18 Gaussian targets, batch 256 @ 192px) with the
bench.py marginal-rate methodology, at:

* rotation ±15°  (narrow canvas, bucketing inactive — the control)
* rotation ±180° BUCKETED (lax.switch over 3 canvas widths, shipped)
* rotation ±180° UNBUCKETED (worst-case canvas on every sample — the
  pre-round-5 behaviour, reached via _augment_views_core directly)

Run: python scripts/exp_aug_bucket.py
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

from pose_estimation_amitai_tpu.ops import affine

B, HW, K = 256, 192, 18
K_SMALL, K_LARGE = 4, 16


def timed_variant(name: str, call) -> None:
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, HW, HW, 4)), jnp.bfloat16)
    pks = jnp.asarray(rng.uniform(20, HW - 20, (B, K, 2)), jnp.float32)
    vals = jnp.ones((B, K), jnp.float32)

    def make(reps):
        @jax.jit
        def run(imgs, pks, vals):
            def body(c, i):
                key = jax.random.fold_in(jax.random.key(0), i)
                w, m, _ = call(key, imgs, pks, vals)
                return c + jnp.max(w).astype(jnp.float32) + jnp.max(m), 0

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return c

        return lambda: run(imgs, pks, vals)

    r_s, r_l = make(K_SMALL), make(K_LARGE)

    def t(fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    t(r_s), t(r_l)
    t_s = min(t(r_s) for _ in range(3))
    t_l = min(t(r_l) for _ in range(3))
    ms = (t_l - t_s) / (K_LARGE - K_SMALL) * 1e3
    print(json.dumps({"variant": name, "ms_per_step": round(ms, 1),
                      "batch": B}), flush=True)


def main() -> None:
    np.asarray(jnp.zeros(()) + 1)

    def rot15(key, imgs, pks, vals):
        return affine.augment_views_and_peaks(
            key, imgs, pks, vals, rotation_range=15.0, xy_shifts=10.0,
            zoom_range=(0.9, 1.1),
        )

    def rot180_bucketed(key, imgs, pks, vals):
        return affine.augment_views_and_peaks(
            key, imgs, pks, vals, rotation_range=180.0, xy_shifts=10.0,
            zoom_range=(0.9, 1.1),
        )

    def rot180_flat(key, imgs, pks, vals):
        return affine._augment_views_core(
            key, imgs, pks, vals, num_views=1, sigma=3.0,
            rotation_range=180.0, rotation_low=0.0, quadrants=False,
            xy_shifts=10.0, zoom_range=(0.9, 1.1),
            do_horizontal_flip=True, do_vertical_flip=True,
            shear_range=0.0, order=1, method="separable",
            shear_limit=affine._shear_limit(180.0),
        )

    for name, call in (("rot15", rot15),
                       ("rot180_bucketed", rot180_bucketed),
                       ("rot180_flat", rot180_flat)):
        timed_variant(name, call)


if __name__ == "__main__":
    main()
