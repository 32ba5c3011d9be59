"""Bounded re-probe of the round-2 Pallas/Mosaic blockers (round-4 verdict
item #3: "re-attempt only if the toolchain moves" needs a dated check).

Two minimal repros, each isolated so one crash doesn't sink the other:

1. int8 vector arithmetic outside dot: a trivial kernel computing
   ``out = a * 2 + b`` on int8 VMEM refs. Round-2 Mosaic rejected this
   ("Only vector<i16> and wider supported"), which blocks the int8
   requant epilogue inside a fused conv kernel.
2. grid size ceiling: the same trivial (f32) kernel at grid sizes
   8 / 16 / 32 / 64. Round 2's remote compile helper hard-crashed
   (HTTP 500) at grid >= 16 for the im2col conv kernel, capping any
   whole-stage resident kernel at toy batch sizes.

Run:  python scripts/exp_mosaic_probe.py        (on the TPU)
Each probe prints one JSON line; exit code 0 either way. Record the date
+ outcome in DESIGN.md "Roadmap".
"""

from __future__ import annotations

import functools
import json
import sys
import traceback

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from jax.experimental import pallas as pl


def probe_int8_vector_arith() -> dict:
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        o_ref[...] = a * jnp.int8(2) + b

    a = jnp.arange(8 * 128, dtype=jnp.int8).reshape(8, 128)
    b = jnp.ones((8, 128), jnp.int8)
    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int8),
        )(a, b)
        ok = np.array_equal(
            np.asarray(out),
            (np.asarray(a, np.int32) * 2 + 1).astype(np.int8),
        )
        return {"probe": "int8_vector_arith", "ok": bool(ok)}
    except Exception as e:
        return {
            "probe": "int8_vector_arith", "ok": False,
            "error": repr(e)[:400],
        }


def probe_grid(n: int) -> dict:
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = jnp.ones((n, 8, 128), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        )(x)
        return {"probe": f"grid_{n}", "ok": bool(
            np.allclose(np.asarray(out), 2.0)
        )}
    except Exception as e:
        return {"probe": f"grid_{n}", "ok": False, "error": repr(e)[:400]}


def probe_int8_vector_in_grid(n: int) -> dict:
    """The combination the resident kernel actually needs: int8 loads,
    int32 accumulate-style arithmetic, int8 store, under a real grid."""
    def kernel(x_ref, o_ref):
        x = x_ref[...].astype(jnp.int32)
        y = (x * 3 + 7) >> 2
        o_ref[...] = y.astype(jnp.int8)

    x = jnp.ones((n, 8, 128), jnp.int8)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.int8),
        )(x)
        return {"probe": f"int8_int32_grid_{n}", "ok": bool(
            np.all(np.asarray(out) == 2)
        )}
    except Exception as e:
        return {"probe": f"int8_int32_grid_{n}", "ok": False,
                "error": repr(e)[:400]}


def main() -> None:
    np.asarray(jnp.zeros(()) + 1)  # claim device first
    results = []
    for fn in (
        probe_int8_vector_arith,
        functools.partial(probe_grid, 8),
        functools.partial(probe_grid, 16),
        functools.partial(probe_grid, 32),
        functools.partial(probe_grid, 64),
        functools.partial(probe_int8_vector_in_grid, 16),
    ):
        try:
            r = fn()
        except BaseException:  # compile-helper hard crashes
            r = {"probe": getattr(fn, "__name__", str(fn)), "ok": False,
                 "error": traceback.format_exc()[-400:]}
        results.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
