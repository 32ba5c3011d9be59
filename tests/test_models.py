"""Shape-contract tests for every model type in the registry.

The reference's only model QA is ``__main__`` smoke blocks pushing random
tensors through each net (SURVEY §4); this is the systematic equivalent: for
each dispatchable model-type string, build via the registry and check the
(B, H, W, C_out) heatmap contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_amitai_tpu import constants as C
from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.models import build_model, needs_camera_matrices

pytestmark = pytest.mark.quick  # gate-style subset: python -m pytest -m quick

HW = 48
SMALL = dict(num_base_filters=8, projection_dim=32, transformer_layers=1,
             num_heads=2, patch_size=16, fully_connected_expand=2)

# (model_type, in_channels, out_channels)
CASES = [
    (C.MODEL_18_POINTS_PER_WING, 4, 9),
    (C.TWO_WINGS_TOGATHER, 5, 8),
    (C.ALL_CAMS_18_POINTS, 16, 12),
    (C.HEAD_TAIL_ALL_CAMS, 16, 8),
    (C.ALL_CAMS_AND_3_GOOD_CAMS, 12, 9),
    (C.COARSE_PER_WING, 4, 7),
    (C.C2F_PER_WING, 4, 9),
    (C.MODEL_18_POINTS_PER_WING_VIT, 4, 9),
    (C.ALL_CAMS_18_POINTS_VIT, 16, 12),
    (C.ALL_CAMS_DISENTANGLED_PER_WING_CNN, 16, 12),
]


def _build_and_run(model_type, in_ch, out_ch, flavor="torch", hw=HW):
    cfg = Config(model_type=model_type, arch_flavor=flavor, **SMALL)
    model = build_model(cfg, (hw, hw, in_ch), out_ch)
    x = jnp.zeros((2, hw, hw, in_ch), jnp.float32)
    args = (x,)
    if needs_camera_matrices(model_type):
        P = jnp.tile(jnp.eye(3, 4), (2, 4, 1, 1))
        P_inv = jnp.transpose(P, (0, 1, 3, 2))
        args = (x, P, P_inv)
    variables = model.init({"params": jax.random.key(0)}, *args, train=False)
    out = model.apply(variables, *args, train=False)
    return out


@pytest.mark.parametrize("model_type,in_ch,out_ch", CASES)
def test_model_output_contract(model_type, in_ch, out_ch):
    out = _build_and_run(model_type, in_ch, out_ch)
    assert out.shape == (2, HW, HW, out_ch)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_unknown_model_type_falls_back_to_basic():
    # tensorflow/Network.py:59-60 else-branch behaviour
    out = _build_and_run("SOME_FUTURE_MODEL", 4, 5)
    assert out.shape == (2, HW, HW, 5)


def test_tf_flavor_basic():
    out = _build_and_run(C.MODEL_18_POINTS_PER_WING, 4, 9, flavor="tf")
    assert out.shape == (2, HW, HW, 9)


def test_resnet_contract():
    # ResNet50 needs /32-divisible inputs; use 64px
    out = _build_and_run(C.RESNET_18_POINTS_PER_WING, 4, 9, hw=64)
    assert out.shape == (2, 64, 64, 9)


def test_tf_flavor_vit_is_post_ln():
    """arch_flavor='tf' builds the TF post-LN transformer
    (tensorflow/vitPose.py:63-79): per-block post-norms, no trailing
    pre-LN final_norm, relu FFN — not the torch pre-LN stack."""
    import jax
    import jax.numpy as jnp

    from pose_estimation_amitai_tpu.models.vit import ViTPoseNet

    vit = ViTPoseNet(out_channels=6, patch_size=16, dim=32, depth=2,
                     heads=2, dim_head=16, mlp_expand=2, flavor="tf")
    x = jnp.zeros((1, 48, 48, 4), jnp.float32)
    params = vit.init({"params": jax.random.key(0)}, x, train=False)["params"]
    t = params["transformer"]
    assert "postnorm0a" in t and "postnorm1b" in t
    assert "final_norm" not in t
    # post-LN attention takes the raw input: no pre-norm params inside
    assert "norm" not in t["attn0"]
    out = vit.apply({"params": params}, x, train=False)
    assert out.shape == (1, 48, 48, 6)


@pytest.mark.quick
def test_vit_fast_softmax_argmax_parity():
    """Serving bf16 softmax chain (models/vit.py Attention.fast_softmax):
    decoded argmax peaks must equal the exact f32-softmax path's, and the
    heatmap values must agree to bf16 precision. Also pins that
    infer.Predictor engages the flag for argmax peaks-only serving and
    that ``fast_softmax=False`` forces the exact chain."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from pose_estimation_amitai_tpu.infer import Predictor
    from pose_estimation_amitai_tpu.models.vit import ViTPoseNet
    from pose_estimation_amitai_tpu.ops import peaks as peaks_ops

    vit = ViTPoseNet(out_channels=6, patch_size=16, dim=64, depth=2,
                     heads=2, dim_head=64, mlp_expand=2,
                     normalize_output=False)
    rng = _np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 48, 48, 4)), jnp.float32)
    params = vit.init({"params": jax.random.key(1)}, x, train=False)["params"]
    exact = vit.apply({"params": params}, x, train=False)
    fast = vit.clone(fast_softmax=True).apply(
        {"params": params}, x, train=False
    )
    pe = _np.asarray(peaks_ops.find_peaks_with_vals(
        jnp.asarray(exact, jnp.float32)))
    pf = _np.asarray(peaks_ops.find_peaks_with_vals(
        jnp.asarray(fast, jnp.float32)))
    _np.testing.assert_array_equal(pe[:, :2], pf[:, :2])  # argmax parity
    _np.testing.assert_allclose(
        _np.asarray(fast, _np.float32), _np.asarray(exact, _np.float32),
        rtol=0.05, atol=0.05,
    )

    # TF flavour (post-LN blocks, biased qkv) rides the same fast chain
    vit_tf = ViTPoseNet(out_channels=6, patch_size=16, dim=64, depth=2,
                        heads=2, dim_head=64, mlp_expand=2, flavor="tf")
    params_tf = vit_tf.init({"params": jax.random.key(2)}, x,
                            train=False)["params"]
    exact_tf = vit_tf.apply({"params": params_tf}, x, train=False)
    fast_tf = vit_tf.clone(fast_softmax=True).apply(
        {"params": params_tf}, x, train=False)
    _np.testing.assert_array_equal(
        _np.asarray(peaks_ops.find_peaks_with_vals(
            jnp.asarray(exact_tf, jnp.float32)))[:, :2],
        _np.asarray(peaks_ops.find_peaks_with_vals(
            jnp.asarray(fast_tf, jnp.float32)))[:, :2])

    cfg = Config(model_type=C.MODEL_18_POINTS_PER_WING_VIT,
                 projection_dim=64, num_heads=2, transformer_layers=2,
                 fully_connected_expand=2)
    p_auto = Predictor(cfg, params, (48, 48, 4), 6, chunk_size=4,
                       model=vit)
    assert p_auto.model.fast_softmax is True
    p_exact = Predictor(cfg, params, (48, 48, 4), 6, chunk_size=4,
                        model=vit, fast_softmax=False)
    assert p_exact.model.fast_softmax is False
    xa = _np.asarray(x, _np.float32)
    _np.testing.assert_array_equal(p_auto(xa)[:, :2], p_exact(xa)[:, :2])


def test_torch_vit_decoder_normalisation_is_per_sample():
    """Per-sample min-max: the same image decodes identically regardless
    of what else is in the batch (the reference's batch-global min-max
    couples samples — latent defect, fixed per DESIGN deviations)."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from pose_estimation_amitai_tpu.models.vit import ViTPoseNet

    vit = ViTPoseNet(out_channels=6, patch_size=16, dim=32, depth=1,
                     heads=2, dim_head=16, mlp_expand=2)
    rng = _np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((1, 48, 48, 4)), jnp.float32)
    b = jnp.asarray(10 * rng.standard_normal((1, 48, 48, 4)), jnp.float32)
    params = vit.init({"params": jax.random.key(0)}, a, train=False)["params"]
    solo = vit.apply({"params": params}, a, train=False)
    batched = vit.apply(
        {"params": params}, jnp.concatenate([a, b]), train=False
    )[:1]
    _np.testing.assert_allclose(
        _np.asarray(solo), _np.asarray(batched), rtol=1e-5, atol=1e-5
    )


def test_all_cams_all_points_trains_end_to_end(tmp_path):
    """The ALL_CAMS_ALL_POINTS path through the full Trainer: 4-camera
    channel concat reshape -> MultiCamNet -> one epoch (regression: the
    model type used to fall through to the per-wing reshape and crash with
    a channel mismatch in the loss)."""
    import numpy as np

    from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
    from pose_estimation_amitai_tpu.train.trainer import Trainer

    arrays = make_synthetic_arrays(num_frames=6, num_points=8, image_size=48,
                                   seed=0)
    cfg = Config(model_type=C.ALL_CAMS_ALL_POINTS, epochs=1, batch_size=4,
                 batches_per_epoch=1, num_base_filters=8, dropout_ratio=0.0,
                 base_output_path=str(tmp_path), do_augmentations=True,
                 rotation_range=10.0, xy_shifts=2.0, val_fraction=0.5, seed=0)
    trainer = Trainer(cfg, arrays=arrays)
    history = trainer.train()
    assert np.isfinite(history["train_loss"][0])
    assert np.isfinite(history["val_loss"][0])


@pytest.mark.quick
@pytest.mark.parametrize("flavor", ["torch", "tf"])
def test_multicam_view_fold_bit_parity(flavor):
    """Round-2 verdict #6: folding the 4 views into the batch axis for the
    shared encoder/decoder (one conv dispatch at 4x batch instead of 4
    sequential view passes) must be numerically identical to the per-view
    path — same param tree, same outputs."""
    from pose_estimation_amitai_tpu.models.multicam import MultiCamNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 48, 48, 16), np.float32))
    folded = MultiCamNet(out_channels=8, filters=8, flavor=flavor,
                         dtype=jnp.float32)
    params = folded.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]
    unfolded = folded.clone(fold_views=False)
    # identical param trees: the folded path applies the same modules
    p2 = unfolded.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)
    a = folded.apply({"params": params}, x, train=False)
    c = unfolded.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.quick
def test_vit4cam_view_fold_bit_parity():
    """View-fold parity for the 4-camera cross-attention ViT: encoder,
    fusion blocks and decoder run at 4x batch; outputs must match the
    per-view path on the same param tree (incl. the per-(sample, view)
    min-max normalisation)."""
    from pose_estimation_amitai_tpu.models.vit import ViT4Cameras

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 32, 32, 16), np.float32))
    folded = ViT4Cameras(out_channels=8, patch_size=16, dim=24, depth=1,
                         heads=2, dim_head=12, num_fuse_layers=2,
                         dtype=jnp.float32)
    params = folded.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]
    unfolded = folded.clone(fold_views=False)
    p2 = unfolded.init({"params": jax.random.key(0)}, x, train=False)[
        "params"
    ]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)
    a = folded.apply({"params": params}, x, train=False)
    c = unfolded.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.quick
def test_vit_fused_serving_parity():
    """Round-5 fused trunk (models/vit.py Attention.fused_serving: LN
    folded into the qkv kernel + merged V/out projection): identical
    param tree AND init values, argmax peak parity vs the unfused fast
    chain, heatmaps within bf16 rounding; infer.Predictor engages it with
    the fast chain and disables it when the exact softmax is forced."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from pose_estimation_amitai_tpu.infer import Predictor
    from pose_estimation_amitai_tpu.models.vit import ViT4Cameras, ViTPoseNet
    from pose_estimation_amitai_tpu.ops import peaks as peaks_ops

    vit = ViTPoseNet(out_channels=6, patch_size=16, dim=64, depth=2,
                     heads=2, dim_head=64, mlp_expand=2,
                     normalize_output=False, fast_softmax=True)
    rng = _np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 48, 48, 4)), jnp.float32)
    params = vit.init({"params": jax.random.key(1)}, x, train=False)["params"]
    fused_model = vit.clone(fused_serving=True)
    # the fused path claims the IDENTICAL param tree (same names, shapes,
    # init stream) — checkpoints serve through it unchanged
    params_f = fused_model.init({"params": jax.random.key(1)}, x,
                                train=False)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_f)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_f)):
        _np.testing.assert_array_equal(_np.asarray(a), _np.asarray(b))

    def assert_argmax_near_parity(a, b, min_agree=0.85, tie_tol=5e-3):
        """Approximate serving contract: argmax peaks agree except at
        GENUINE near-ties — wherever they differ, the reference map's
        values at the two competing locations must be within ``tie_tol``
        of each other (random-init fixtures are full of exact ties, which
        bf16-level drift legitimately flips)."""
        a = _np.asarray(a, _np.float32)
        b = _np.asarray(b, _np.float32)
        bsz, hh, ww, kk = a.shape
        fa = a.reshape(bsz, hh * ww, kk)
        fb = b.reshape(bsz, hh * ww, kk)
        ia = fa.argmax(axis=1)
        ib = fb.argmax(axis=1)
        agree = (ia == ib).mean()
        assert agree >= min_agree, f"argmax agreement {agree:.2%}"
        bi, ki = _np.nonzero(ia != ib)
        va = fa[bi, ia[bi, ki], ki]
        vb = fa[bi, ib[bi, ki], ki]
        _np.testing.assert_allclose(va, vb, rtol=0, atol=tie_tol)

    base = vit.apply({"params": params}, x, train=False)
    fused = fused_model.apply({"params": params}, x, train=False)
    assert_argmax_near_parity(base, fused)
    _np.testing.assert_allclose(
        _np.asarray(fused, _np.float32), _np.asarray(base, _np.float32),
        rtol=0.05, atol=0.05,
    )

    # training path is untouched by the flag (exact LN/Dense modules)
    tr_base = vit.apply({"params": params}, x, train=True,
                        rngs={"dropout": jax.random.key(0)})
    tr_fused = fused_model.apply({"params": params}, x, train=True,
                                 rngs={"dropout": jax.random.key(0)})
    _np.testing.assert_array_equal(_np.asarray(tr_base),
                                   _np.asarray(tr_fused))

    # 4-camera ViT rides the same switch (shared encoder + fusion blocks)
    v4 = ViT4Cameras(out_channels=8, patch_size=16, dim=32, depth=1,
                     heads=2, dim_head=32, mlp_expand=2, num_fuse_layers=1,
                     normalize_output=False, fast_softmax=True)
    x4 = jnp.asarray(rng.standard_normal((2, 48, 48, 8)), jnp.float32)
    p4 = v4.init({"params": jax.random.key(3)}, x4, train=False)["params"]
    b4 = v4.apply({"params": p4}, x4, train=False)
    f4 = v4.clone(fused_serving=True).apply({"params": p4}, x4, train=False)
    assert_argmax_near_parity(b4, f4)

    cfg = Config(model_type=C.MODEL_18_POINTS_PER_WING_VIT,
                 projection_dim=64, num_heads=2, transformer_layers=2,
                 fully_connected_expand=2)
    p_auto = Predictor(cfg, params, (48, 48, 4), 6, chunk_size=4,
                       model=vit.clone(fast_softmax=False))
    assert p_auto.model.fast_softmax is True
    # fused_serving measured SLOWER on v5e (scripts/exp_vit_fused.py) and
    # is therefore NOT auto-engaged — available only as an explicit clone
    assert p_auto.model.fused_serving is False
    p_exact = Predictor(cfg, params, (48, 48, 4), 6, chunk_size=4,
                        model=vit, fast_softmax=False)
    assert p_exact.model.fused_serving is False
