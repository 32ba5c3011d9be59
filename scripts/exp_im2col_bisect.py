"""Bisect which feature of the im2col Pallas kernel kills the TPU
remote compiler (HTTP 500 with no diagnostic). Each case is a minimal
pallas_call; progress prints before each compile so the first crash
identifies the culprit."""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

HW, C, D, R, COL0, WP = 192, 64, 2, 16, 32, 224


def run_case(name, kernel, scratch_shapes, out_shape):
    print(f"[bisect] {name}: compiling...", file=sys.stderr, flush=True)
    x = jnp.asarray(
        np.random.default_rng(0).integers(-80, 80, (1, HW, HW, C)), jnp.int8
    )
    try:
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
        )
        np.asarray(jax.jit(fn)(x))
        print(f"[bisect] {name}: OK", file=sys.stderr, flush=True)
        return True
    except Exception as e:
        print(f"[bisect] {name}: FAIL {str(e)[:200]}", file=sys.stderr,
              flush=True)
        return False


O8 = jax.ShapeDtypeStruct((1, HW, HW, C), jnp.int8)
XPAD = pltpu.VMEM((HW + 2 * D + 4, COL0 + WP + 32, C), jnp.int8)


def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def k_stage(x_ref, o_ref, xpad):
    xpad[:] = jnp.zeros_like(xpad)
    xpad[D : D + HW, COL0 : COL0 + HW, :] = x_ref[0]
    o_ref[0] = xpad[D : D + HW, COL0 : COL0 + HW, :]


def k_dyn_read(x_ref, o_ref, xpad):
    xpad[:] = jnp.zeros_like(xpad)
    xpad[D : D + HW, COL0 : COL0 + HW, :] = x_ref[0]

    def body(t, _):
        r0 = t * R
        tile = xpad[pl.ds(r0 + D, R), COL0 - D : COL0 - D + WP, :]
        o_ref[0, pl.ds(r0, R)] = tile[:, D : D + HW, :]
        return 0

    jax.lax.fori_loop(0, HW // R, body, 0)


def k_reshape(x_ref, o_ref, xpad):
    xpad[:] = jnp.zeros_like(xpad)
    xpad[D : D + HW, COL0 : COL0 + HW, :] = x_ref[0]

    def body(t, _):
        r0 = t * R
        tile = xpad[pl.ds(r0 + D, R), COL0 - D : COL0 - D + WP, :]
        flat = tile.reshape(R * WP, C)
        back = flat.reshape(R, WP, C)
        o_ref[0, pl.ds(r0, R)] = back[:, D : D + HW, :]
        return 0

    jax.lax.fori_loop(0, HW // R, body, 0)


def k_concat_dot(x_ref, o_ref, xpad):
    xpad[:] = jnp.zeros_like(xpad)
    xpad[D : D + HW, COL0 : COL0 + HW, :] = x_ref[0]
    w = jnp.ones((9 * C, C), jnp.int8)

    def body(t, _):
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
        acc = jnp.dot(jnp.concatenate(taps, axis=1), w,
                      preferred_element_type=jnp.int32)
        yq = jnp.clip(acc, -127, 127).astype(jnp.int8)
        o_ref[0, pl.ds(r0, R)] = yq.reshape(R, WP, C)[:, 0:HW, :]
        return 0

    jax.lax.fori_loop(0, HW // R, body, 0)


def full_kernel(x_ref, w_ref, m_ref, b_ref, o_ref, xpad):
    xpad[:] = jnp.zeros_like(xpad)
    xpad[D : D + HW, COL0 : COL0 + HW, :] = x_ref[0]

    def body(t, _):
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
        acc = jnp.dot(jnp.concatenate(taps, axis=1), w_ref[:],
                      preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * m_ref[:] + b_ref[:]
        y = jnp.where(y >= 0, y, y * 0.1)
        yq = jnp.clip(jnp.round(y * 64.0), -127, 127).astype(jnp.int8)
        o_ref[0, pl.ds(r0, R)] = yq.reshape(R, WP, C)[:, 0:HW, :]
        return 0

    jax.lax.fori_loop(0, HW // R, body, 0)


def run_full(name, grid_b):
    print(f"[bisect] {name}: compiling...", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-80, 80, (grid_b, HW, HW, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-90, 90, (9 * C, C)), jnp.int8)
    m = jnp.asarray(rng.uniform(5e-4, 2e-3, (C,)), jnp.float32)
    b = jnp.asarray(rng.uniform(-0.1, 0.1, (C,)), jnp.float32)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    try:
        fn = pl.pallas_call(
            full_kernel,
            grid=(grid_b,),
            in_specs=[
                pl.BlockSpec((1, HW, HW, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                wspec, wspec, wspec,
            ],
            out_specs=pl.BlockSpec((1, HW, HW, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid_b, HW, HW, C), jnp.int8),
            scratch_shapes=[XPAD],
        )
        np.asarray(jax.jit(fn)(x, w, m, b))
        print(f"[bisect] {name}: OK", file=sys.stderr, flush=True)
        return True
    except Exception as e:
        print(f"[bisect] {name}: FAIL {str(e)[:200]}", file=sys.stderr,
              flush=True)
        return False


def main():
    if not run_case("concat_dot", k_concat_dot, [XPAD], O8):
        return
    if not run_full("full_epilogue_grid1", 1):
        return
    run_full("full_epilogue_grid4", 4)


if __name__ == "__main__":
    main()
