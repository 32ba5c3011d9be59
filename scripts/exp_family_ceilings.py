"""Per-family measured-ceiling composites (round-4 verdict #5 / #1b).

For each serving family, this tool answers "is its throughput
speed-of-light or just a number?" the same way round 4 answered it for
the flagship (exp_int8_lanes + exp_resident_attrib): a MAC-weighted
composite of MEASURED per-geometry op rates.

Method:
1. Build the family's production serving program (best path per
   RESULTS.md: bf16 for the ViT families, generic-int8 for the conv
   families) and walk its jaxpr, collecting every conv_general_dilated /
   dot_general with shapes, dtypes and MAC counts.
2. Group ops by geometry; for every group covering the top ~92% of MACs,
   probe THAT op in isolation on the chip (marginal-rate scan with a
   one-element perturbation against LICM and a full-tensor max against
   DCE — the exp_int8_lanes methodology). The remaining tail is credited
   at the fastest probed rate (conservative: it can only make the
   ceiling harder to reach).
3. Composite ceiling time = sum(MACs_g / rate_g); achieved% =
   ceiling_time / measured_time of the full program (which also carries
   the non-matmul work: softmax/LN chains, requant epilogues, decode).

Run on the TPU:
  python scripts/exp_family_ceilings.py [vit vit4cam ftl resnet gptnet]
Prints per-family JSON lines (per-geometry table to stderr).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.models import build_model, needs_camera_matrices
from pose_estimation_amitai_tpu.ops import peaks

HW = 192
REPS_SMALL, REPS_LARGE = 4, 16
# hardware MAC-rate ceilings (v5e-1: 197 TFLOP/s bf16, 394 TOP/s int8;
# 2 ops per MAC) — probe rates are clamped here so timer-resolution noise
# on tiny ops cannot credit a group at an impossible rate
PEAK_MACS = {"int8": 394e12 / 2, "bfloat16": 197e12 / 2,
             "float32": 197e12 / 4}

# family -> (model_type, in_ch, out_ch, cams, batch, mode)
FAMILIES = {
    "vit": (C.MODEL_18_POINTS_PER_WING_VIT, 4, 18, 1, 768, "bf16"),
    "vit4cam": (C.ALL_CAMS_18_POINTS_VIT, 16, 72, 4, 128, "bf16"),
    "ftl": (C.ALL_CAMS_DISENTANGLED_PER_WING_CNN, 16, 72, 4, 128, "int8"),
    "resnet": (C.RESNET_18_POINTS_PER_WING, 4, 18, 1, 256, "int8"),
    "gptnet": (C.GPTNET, 4, 18, 1, 256, "int8"),
}


# ---------------------------------------------------------------------------
# jaxpr walk: collect conv/dot ops with MACs
# ---------------------------------------------------------------------------
def _collect_ops(jaxpr, ops):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            out = eqn.outvars[0].aval
            p = eqn.params
            dn = p["dimension_numbers"]
            # flax uses NHWC/HWIO->NHWC; read sizes via dim numbers
            ls, rs, os_ = lhs.shape, rhs.shape, out.shape
            # generic: kernel spatial dims + I/O channels from rhs_spec
            rspec = dn.rhs_spec  # (out_c, in_c, *spatial)
            kout = rs[rspec[0]]
            kin = rs[rspec[1]]
            ksp = [rs[i] for i in rspec[2:]]
            ospec = dn.out_spec  # (batch, feature, *spatial)
            ob = os_[ospec[0]]
            osp = [os_[i] for i in ospec[2:]]
            groups = p.get("feature_group_count", 1)
            macs = (
                ob * int(np.prod(osp)) * int(np.prod(ksp)) * kin * kout
            )  # kin is already per-group
            # lhs-dilated (transposed) convs: only ~1/prod(dilation) of
            # kernel taps align with nonzero inputs — count EFFECTIVE
            # MACs so probe rates stay <= hardware peak (XLA's emitter
            # skips the structural zeros; nominal-MAC rates came out at
            # 761 "TOP/s" on a 197-peak chip). Convention is applied
            # uniformly to collection and probes, so composites are
            # unchanged; only the reported rates become interpretable.
            macs = int(macs // int(np.prod(p["lhs_dilation"])))
            key = (
                "conv", str(lhs.dtype), tuple(ls), tuple(rs), tuple(os_),
                tuple(p["window_strides"]), tuple(p["padding"]),
                tuple(p["lhs_dilation"]), tuple(p["rhs_dilation"]),
                groups,
            )
            ops.append((key, macs, eqn.params, (lhs, rhs, out)))
        elif name == "dot_general":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            out = eqn.outvars[0].aval
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            contract = int(np.prod([lhs.shape[i] for i in lc])) or 1
            macs = int(np.prod(out.shape)) * contract
            key = ("dot", str(lhs.dtype), tuple(lhs.shape),
                   tuple(rhs.shape), tuple(out.shape),
                   tuple(lc), tuple(rc), tuple(lb), tuple(rb))
            ops.append((key, macs, eqn.params, (lhs, rhs, out)))
        else:
            for sub in jax.core.jaxprs_in_params(eqn.params):
                _collect_ops(getattr(sub, "jaxpr", sub), ops)
    return ops


def collect_ops(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    return _collect_ops(jaxpr.jaxpr, [])


# ---------------------------------------------------------------------------
# probes
# ---------------------------------------------------------------------------
def _rand_for(aval):
    rng = np.random.default_rng(0)
    dt = aval.dtype
    if np.issubdtype(dt, np.integer):
        return jnp.asarray(
            rng.integers(-100, 100, aval.shape).astype(dt)
        )
    return jnp.asarray(rng.random(aval.shape) * 0.1, dt)


def _marginal_seconds(make_body, consume_init, args,
                      est_sec_per_rep: float = 0.0) -> float:
    # adaptive scan lengths: tiny ops at reps 4/16 produce a marginal dt
    # below timer/relay resolution (observed: "521838526 TOP/s") — scale
    # the pair so the large run is >= ~0.4 s of estimated compute
    reps_small, reps_large = REPS_SMALL, REPS_LARGE
    if est_sec_per_rep > 0:
        reps_large = int(min(512, max(REPS_LARGE, 0.4 / est_sec_per_rep)))
        reps_small = max(REPS_SMALL, reps_large // 4)
    progs = {}
    for reps in (reps_small, reps_large):
        def prog(*a, _reps=reps):
            def body(c, i):
                return jnp.maximum(c, make_body(i, *a)), 0

            c, _ = lax.scan(body, consume_init, jnp.arange(_reps))
            return c

        progs[reps] = jax.jit(prog)
        np.asarray(progs[reps](*args))

    def t(reps):
        t0 = time.perf_counter()
        np.asarray(progs[reps](*args))
        return time.perf_counter() - t0

    t_s = min(t(reps_small) for _ in range(3))
    t_l = min(t(reps_large) for _ in range(3))
    return max(t_l - t_s, 1e-9) / (reps_large - reps_small)


def probe_rate(key, params, avals) -> float:
    """SECONDS per iteration for one conv/dot geometry, measured in
    isolation (clamped below by the hardware-peak time for its effective
    MACs); callers divide MACs by this to get the rate."""
    lhs, rhs, out = avals
    a, b = _rand_for(lhs), _rand_for(rhs)
    acc = jnp.int32 if np.issubdtype(lhs.dtype, np.integer) else jnp.float32
    init = jnp.full((), -(2**30) if acc == jnp.int32 else -1e30, acc)

    if key[0] == "conv":
        def body(i, a, b):
            bp = b.at[(0,) * b.ndim].add(
                (i % 2).astype(b.dtype)
            )  # defeat LICM
            y = lax.conv_general_dilated(
                a, bp,
                window_strides=params["window_strides"],
                padding=params["padding"],
                lhs_dilation=params["lhs_dilation"],
                rhs_dilation=params["rhs_dilation"],
                dimension_numbers=params["dimension_numbers"],
                feature_group_count=params["feature_group_count"],
                preferred_element_type=acc,
            )
            return jnp.max(y)  # defeat DCE
    else:
        def body(i, a, b):
            bp = b.at[(0,) * b.ndim].add((i % 2).astype(b.dtype))
            y = lax.dot_general(
                a, bp, params["dimension_numbers"],
                preferred_element_type=acc,
            )
            return jnp.max(y)

    est = _group_probe_macs(key, params, avals) / (100e12 / 2)
    sec = _marginal_seconds(body, init, (a, b), est_sec_per_rep=est)
    # clamp to the hardware bound: a probe can never beat the chip
    floor = _group_probe_macs(key, params, avals) / PEAK_MACS.get(
        key[1], 197e12 / 2
    )
    return max(sec, floor)


def build_family(name):
    mt, in_ch, out_ch, cams, batch, mode = FAMILIES[name]
    cfg = Config(model_type=mt, dropout_ratio=0.0)
    model = build_model(cfg, (HW, HW, in_ch), out_ch)
    if batch >= 128 and getattr(model, "fold_views", None) is True:
        model = model.clone(fold_views=False)
    if getattr(model, "normalize_output", None) is True:
        model = model.clone(normalize_output=False)
    if getattr(model, "fast_softmax", None) is False:
        model = model.clone(fast_softmax=True)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((batch, HW, HW, in_ch)), jnp.bfloat16)
    extra = ()
    if needs_camera_matrices(mt):
        P = np.tile(np.eye(3, 4, dtype=np.float32), (batch, 4, 1, 1))
        P += rng.normal(0, 0.05, P.shape).astype(np.float32)
        P_inv = np.linalg.pinv(P)
        P_inv /= np.linalg.norm(P_inv, axis=(-2, -1), keepdims=True)
        extra = (jnp.asarray(P), jnp.asarray(P_inv))
    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, HW, HW, in_ch), jnp.bfloat16),
        *(e[:1] for e in extra), train=False,
    )
    variables = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), variables
    )
    if mode == "int8":
        from pose_estimation_amitai_tpu.models.quantized_generic import (
            calibrate_apply, make_quantized_apply,
        )

        calib = [(np.asarray(base[:8], np.float32),)
                 + tuple(e[:8] for e in extra)]
        scales = calibrate_apply(model, variables, calib)
        q = make_quantized_apply(model, variables, scales,
                                 out_dtype=jnp.bfloat16)

        def forward(frames, *args):
            return q(frames, *args)
    else:
        def forward(frames, *args):
            return model.apply(variables, frames, *args, train=False)

    return forward, base, extra, batch


def family_seconds(forward, base, extra, batch) -> float:
    """Measured seconds/batch of the FULL serving program (incl. decode)."""
    def make(K):
        @jax.jit
        def run(base, *args):
            def body(c, i):
                frames = base * (1.0 + i.astype(jnp.bfloat16) * 1e-3)
                return c, peaks.find_peaks_with_vals(forward(frames, *args))

            _, out = lax.scan(body, 0, jnp.arange(K))
            return out

        return lambda: run(base, *extra)

    r_s, r_l = make(2), make(8)

    def t(fn):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        return time.perf_counter() - t0

    t(r_s), t(r_l)
    t_s = min(t(r_s) for _ in range(3))
    t_l = min(t(r_l) for _ in range(3))
    return max(t_l - t_s, 1e-9) / 6.0


def analyze(name: str, max_probes: int = 8, coverage: float = 0.92) -> dict:
    forward, base, extra, batch = build_family(name)
    ops = collect_ops(lambda b, *e: forward(b, *e), base, *extra)
    groups: dict = {}
    for key, macs, params, avals in ops:
        g = groups.setdefault(key, [0, params, avals])
        g[0] += macs
    total_macs = sum(g[0] for g in groups.values())
    ranked = sorted(groups.items(), key=lambda kv: -kv[1][0])
    probed, acc_macs = [], 0
    for key, (macs, params, avals) in ranked:
        if len(probed) >= max_probes or (
            probed and acc_macs / total_macs >= coverage
        ):
            break
        probed.append((key, macs, params, avals))
        acc_macs += macs

    rates = {}
    for key, macs, params, avals in probed:
        sec = probe_rate(key, params, avals)
        rate = _group_probe_macs(key, params, avals) / sec
        rates[key] = rate
        print(json.dumps({
            "family": name, "probe": key[0], "dtype": key[1],
            "out": list(key[4]),
            "tops": round(2 * rate / 1e12, 1),
            "mac_share": round(macs / total_macs, 3),
        }), file=sys.stderr, flush=True)

    best_rate = max(rates.values())
    ceiling_s = 0.0
    for key, (macs, params, avals) in groups.items():
        ceiling_s += macs / rates.get(key, best_rate)

    meas_s = family_seconds(forward, base, extra, batch)
    out = {
        "family": name,
        "measured_ms_per_batch": round(meas_s * 1e3, 2),
        "ceiling_ms_per_batch": round(ceiling_s * 1e3, 2),
        "achieved_pct_of_ceiling": round(100 * ceiling_s / meas_s, 1),
        "samples_per_s": round(batch / meas_s, 1),
        "gmacs_per_sample": round(total_macs / batch / 1e9, 2),
        "probed_groups": len(probed),
        "probed_mac_coverage": round(acc_macs / total_macs, 3),
    }
    print(json.dumps(out), flush=True)
    return out


def _group_probe_macs(key, params, avals) -> int:
    """MAC count of ONE probe iteration for this geometry (same formula
    as collection, on the probe's own shapes)."""
    lhs, rhs, out = avals
    if key[0] == "conv":
        dn = params["dimension_numbers"]
        rspec = dn.rhs_spec
        kout = rhs.shape[rspec[0]]
        kin = rhs.shape[rspec[1]]
        ksp = [rhs.shape[i] for i in rspec[2:]]
        ospec = dn.out_spec
        ob = out.shape[ospec[0]]
        osp = [out.shape[i] for i in ospec[2:]]
        macs = ob * int(np.prod(osp)) * int(np.prod(ksp)) * kin * kout
        return int(macs // int(np.prod(params["lhs_dilation"])))
    (lc, _), _ = params["dimension_numbers"]
    contract = int(np.prod([lhs.shape[i] for i in lc])) or 1
    return int(np.prod(out.shape)) * contract


def main() -> None:
    np.asarray(jnp.zeros(()) + 1)
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(
        FAMILIES
    )
    for n in names:
        try:
            analyze(n)
        except Exception as e:
            print(json.dumps({"family": n, "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
