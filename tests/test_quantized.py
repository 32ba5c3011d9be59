"""Calibrated int8 inference: numerics + peak-decode parity on a trained net.

The int8 path only counts if it preserves the reference's eval metric (pixel
L2 of decoded peaks, pytorch/train_pytorch.py:199-213) — verified here on a
model trained to localise synthetic keypoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.pipeline import build_dataset
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
from pose_estimation_amitai_tpu.models import build_model
from pose_estimation_amitai_tpu.models.quantized import (
    calibrate,
    make_quantized_forward,
    reference_forward,
)
from pose_estimation_amitai_tpu.ops import peaks


@pytest.fixture(scope="module")
def trained():
    """BasicNet overfit on one synthetic batch until it localises peaks."""
    arrays = make_synthetic_arrays(num_frames=4, num_points=8, image_size=48,
                                   seed=5)
    cfg = Config(num_base_filters=8, dropout_ratio=0.0,
                 compute_dtype="float32")
    ds, _ = build_dataset(cfg, arrays)
    x = ds.data["box"][:8].astype(jnp.float32)
    y = ds.data["confmaps"][:8].astype(jnp.float32)
    model = build_model(cfg, x.shape[1:], y.shape[-1])
    params = model.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            pred = model.apply({"params": p}, x, train=False)
            return jnp.mean(jnp.square(pred - y))

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(1200):
        params, opt, _ = step(params, opt)
    return model, params, x, y


def test_reference_forward_exact(trained):
    model, params, x, _ = trained
    ref = model.apply({"params": params}, x, train=False)
    mine = reference_forward(params, x)
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=1e-5)


def test_quantized_peak_parity(trained):
    model, params, x, y = trained
    scales = calibrate(params, np.asarray(x), batch=4)
    qf = make_quantized_forward(model, params, scales)
    ref_maps = model.apply({"params": params}, x, train=False)
    q_maps = qf(x)

    ref_pts = np.asarray(peaks.find_peaks(ref_maps))
    q_pts = np.asarray(peaks.find_peaks(jnp.asarray(q_maps, jnp.float32)))
    d = np.linalg.norm(ref_pts - q_pts, axis=-1)
    # decoded peaks must match the float model to ~1px for most channels
    assert np.median(d) <= 1.0, np.median(d)
    # and the quantized model's own accuracy (L2 to GT) must match float
    l2_ref = np.median(np.asarray(peaks.l2_distances(ref_maps, y)))
    l2_q = np.median(
        np.asarray(peaks.l2_distances(jnp.asarray(q_maps, jnp.float32), y))
    )
    assert l2_q <= l2_ref + 1.0, (l2_q, l2_ref)


def test_quantized_resident_peak_parity(trained):
    """The int8-resident serving path (activations stored int8 between
    layers — the HBM-traffic-halving variant) preserves decoded peaks."""
    from pose_estimation_amitai_tpu.models.quantized import (
        make_quantized_resident_forward,
    )

    model, params, x, y = trained
    scales = calibrate(params, np.asarray(x), batch=4)
    qr = make_quantized_resident_forward(
        model, params, scales, out_dtype=jnp.float32
    )
    ref_maps = model.apply({"params": params}, x, train=False)
    q_maps = qr(x)
    d = np.linalg.norm(
        np.asarray(peaks.find_peaks(ref_maps))
        - np.asarray(peaks.find_peaks(jnp.asarray(q_maps, jnp.float32))),
        axis=-1,
    )
    assert np.median(d) <= 1.0, np.median(d)
    l2_ref = np.median(np.asarray(peaks.l2_distances(ref_maps, y)))
    l2_q = np.median(
        np.asarray(peaks.l2_distances(jnp.asarray(q_maps, jnp.float32), y))
    )
    assert l2_q <= l2_ref + 1.0, (l2_q, l2_ref)


def test_generic_quantized_matches_basicnet(trained):
    """The interceptor-based generic int8 path decodes the same peaks as the
    hand-written BasicNet int8 path on a trained model."""
    from pose_estimation_amitai_tpu.models.quantized_generic import (
        quantize_predict_fn,
    )

    model, params, x, y = trained
    qf = jax.jit(quantize_predict_fn(model, params, np.asarray(x)))
    ref_maps = model.apply({"params": params}, x, train=False)
    q_maps = qf(x)
    d = np.linalg.norm(
        np.asarray(peaks.find_peaks(ref_maps))
        - np.asarray(peaks.find_peaks(jnp.asarray(q_maps, jnp.float32))),
        axis=-1,
    )
    assert np.median(d) <= 1.0, np.median(d)


def test_generic_quantized_vit_peak_parity():
    """int8 serving extends to the ViT family (DESIGN roadmap): a trained
    ViT's decoded peaks survive quantization."""
    from pose_estimation_amitai_tpu.models.quantized_generic import (
        calibrate_apply,
        make_quantized_apply,
    )

    arrays = make_synthetic_arrays(num_frames=4, num_points=8, image_size=48,
                                   seed=7)
    cfg = Config(model_type="MODEL_18_POINTS_PER_WING_VIT", patch_size=16,
                 projection_dim=64, transformer_layers=2, num_heads=4,
                 dropout_ratio=0.0, compute_dtype="float32")
    ds, _ = build_dataset(cfg, arrays)
    x = ds.data["box"][:8].astype(jnp.float32)
    y = ds.data["confmaps"][:8].astype(jnp.float32)
    model = build_model(cfg, x.shape[1:], y.shape[-1])
    params = model.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            pred = model.apply({"params": p}, x, train=False)
            return jnp.mean(jnp.square(pred - y))

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(600):
        params, opt, _ = step(params, opt)

    scales = calibrate_apply(model, params, [(x,)])
    # every Dense/Conv/ConvTranspose was seen by calibration: patch conv,
    # 2 layers x (qkv, out, fc1, fc2), 4 decoder deconvs
    assert len(scales) >= 1 + 2 * 4 + 4, sorted(scales)
    qf = jax.jit(make_quantized_apply(model, params, scales))
    ref_maps = model.apply({"params": params}, x, train=False)
    q_maps = qf(x)
    ref_pts = np.asarray(peaks.find_peaks(ref_maps))
    q_pts = np.asarray(peaks.find_peaks(jnp.asarray(q_maps, jnp.float32)))
    d = np.linalg.norm(ref_pts - q_pts, axis=-1)
    assert np.median(d) <= 1.0, np.median(d)
    l2_ref = np.median(np.asarray(peaks.l2_distances(ref_maps, y)))
    l2_q = np.median(
        np.asarray(peaks.l2_distances(jnp.asarray(q_maps, jnp.float32), y))
    )
    assert l2_q <= l2_ref + 1.5, (l2_q, l2_ref)


def test_generic_quantized_multicam_peak_parity():
    """int8 serving extends to the 4-camera fusion family: a trained
    MultiCamNet's decoded peaks survive generic quantization (one
    interceptor serves the whole zoo — DESIGN.md)."""
    from pose_estimation_amitai_tpu.models.quantized_generic import (
        calibrate_apply,
        make_quantized_apply,
    )

    hw, k = 48, 8
    rng = np.random.default_rng(11)
    cfg = Config(model_type="ALL_CAMS_18_POINTS", num_base_filters=8,
                 num_blocks=2, dropout_ratio=0.0, compute_dtype="float32")
    x = jnp.asarray(rng.random((6, hw, hw, 16), np.float32))
    pk = jnp.asarray(rng.uniform(8, 40, (6, 4 * k, 2)).astype(np.float32))
    from pose_estimation_amitai_tpu.ops.gaussian import confmaps_from_peaks

    y = confmaps_from_peaks(pk, (hw, hw), 3.0)
    model = build_model(cfg, x.shape[1:], 4 * k)
    params = model.init({"params": jax.random.key(1)}, x, train=False)[
        "params"
    ]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            pred = model.apply({"params": p}, x, train=False)
            return jnp.mean(jnp.square(pred - y))

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(150):
        params, opt, _ = step(params, opt)

    scales = calibrate_apply(model, params, [(x,)])
    qf = jax.jit(make_quantized_apply(model, params, scales))
    ref_maps = model.apply({"params": params}, x, train=False)
    q_maps = qf(x)
    ref_pts = np.asarray(peaks.find_peaks(ref_maps))
    q_pts = np.asarray(peaks.find_peaks(jnp.asarray(q_maps, jnp.float32)))
    d = np.linalg.norm(ref_pts - q_pts, axis=-1)
    assert np.median(d) <= 1.0, np.median(d)


def test_selective_quantization_layer_filter():
    """``layer_filter`` restricts quantisation to a layer subset: the
    conv-only mixed-precision serving mode for the ViT family leaves the
    Dense transformer trunk untouched (bit-identical to float when only
    unquantised layers run), and an empty filter reproduces the float
    forward exactly."""
    from pose_estimation_amitai_tpu.models.quantized_generic import (
        calibrate_apply,
        conv_layers_only,
        make_quantized_apply,
    )

    rng = np.random.default_rng(3)
    cfg = Config(model_type="MODEL_18_POINTS_PER_WING_VIT", patch_size=16,
                 projection_dim=64, transformer_layers=2, num_heads=4,
                 dropout_ratio=0.0, compute_dtype="float32")
    x = jnp.asarray(rng.random((4, 48, 48, 4), np.float32))
    model = build_model(cfg, x.shape[1:], 8)
    params = model.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]

    # conv-only filter: scales cover the 4 decoder deconvs and exclude
    # every Dense (to_qkv/to_out/fc1/fc2) AND the patch-embed stem conv
    # (it feeds every token of the kept-float trunk)
    scales = calibrate_apply(model, params, [(x,)],
                             layer_filter=conv_layers_only)
    assert len(scales) == 4, sorted(scales)
    assert not any(
        k.rsplit("/", 1)[-1] in ("to_qkv", "to_out", "fc1", "fc2")
        or "patch_embed" in k
        for k in scales
    ), sorted(scales)

    # jitted float forward closing over params exactly like
    # make_quantized_apply does (argument- vs constant-params change XLA's
    # fusion choices at the 1e-7 level, so the baseline must match its
    # structure for a bit-exactness comparison)
    ref = np.asarray(jax.jit(
        lambda x: model.apply({"params": params}, x, train=False)
    )(x))

    # empty filter -> no layer quantised -> exactly the float forward
    none_scales = calibrate_apply(model, params, [(x,)],
                                  layer_filter=lambda m: False)
    assert none_scales == {}
    ident = jax.jit(make_quantized_apply(model, params, none_scales))
    np.testing.assert_array_equal(np.asarray(ident(x)), ref)

    # conv-only mixed forward: int8 error confined to the decoder stack;
    # min-max-normalised heatmaps stay close to the float model's
    mixed = jax.jit(make_quantized_apply(model, params, scales))
    out = np.asarray(mixed(x))
    assert np.isfinite(out).all()
    assert np.median(np.abs(out - ref)) < 0.05, np.median(np.abs(out - ref))
