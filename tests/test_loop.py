"""Training-loop pieces: PlateauScheduler torch semantics, loss selection,
train-step determinism."""

import numpy as np

import jax
import jax.numpy as jnp

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.models import build_model
from pose_estimation_amitai_tpu.train.loop import (
    PlateauScheduler,
    create_train_state,
    make_loss_fn,
    make_train_step,
)


def test_plateau_scheduler_torch_semantics():
    """mode='min', rel threshold, patience, min_lr — parity with
    torch.optim.lr_scheduler.ReduceLROnPlateau as configured at
    pytorch/train_pytorch.py:112-114."""
    cfg = Config(learning_rate=1.0, reduce_lr_factor=0.5,
                 reduce_lr_patience=2, reduce_lr_min_delta=0.01,
                 reduce_lr_min_lr=0.2)
    s = PlateauScheduler(cfg)
    assert s.lr_scale == 1.0
    s.step(1.0)   # best=1.0
    s.step(0.5)   # improvement -> best=0.5
    s.step(0.5)   # bad 1 (not < 0.5*(1-0.01))
    s.step(0.5)   # bad 2
    assert s.lr == 1.0
    s.step(0.5)   # bad 3 > patience -> drop
    assert s.lr == 0.5
    s.step(0.5); s.step(0.5); s.step(0.5)
    assert s.lr == 0.25
    for _ in range(6):
        s.step(0.5)
    assert s.lr == 0.2  # clamped at min_lr
    # state round-trips
    d = s.state_dict()
    s2 = PlateauScheduler(cfg)
    s2.load_state_dict(d)
    assert s2.lr == s.lr and s2.best == s.best


def test_loss_fn_selection():
    cfg_mse = Config(loss_function="mean_squared_error")
    cfg_pw = Config(loss_function="pointwise")
    pred = jnp.zeros((2, 16, 16, 3))
    tgt = jnp.ones((2, 16, 16, 3))
    assert float(make_loss_fn(cfg_mse)(pred, tgt)) == 1.0
    # pointwise loss of identical heatmaps is 0
    assert float(make_loss_fn(cfg_pw)(tgt, tgt)) == 0.0


def test_train_step_reproducible():
    """Same state + data + indices -> identical loss (PRNG is folded from
    the step counter, SURVEY §7 hard part 5)."""
    cfg = Config(num_base_filters=8, do_augmentations=True,
                 rotation_range=10.0, xy_shifts=2.0)
    model = build_model(cfg, (48, 48, 4), 6)
    rng = np.random.default_rng(0)
    data = {
        "box": jnp.asarray(rng.random((8, 48, 48, 4), np.float32)),
        "confmaps": jnp.asarray(rng.random((8, 48, 48, 6), np.float32)),
    }
    batch = {"image": data["box"][:2], "confmaps": data["confmaps"][:2]}
    state = create_train_state(model, cfg, batch)
    step = make_train_step(model, cfg)
    idx = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    _, loss_a = step(state, data, idx, 1.0)
    _, loss_b = step(state, data, idx, 1.0)
    assert float(loss_a) == float(loss_b)
    # different step counter -> different augmentation draw
    state2, _ = step(state, data, idx, 1.0)
    _, loss_c = step(state2, data, idx, 1.0)
    assert float(loss_c) != float(loss_a)


def test_head_zero_init_starts_at_all_zeros_prediction():
    """head_zero_init: initial forward emits exactly zeros (loss = background
    MSE), and only the output-head leaves are zeroed."""
    import numpy as np
    from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
    from pose_estimation_amitai_tpu.data.pipeline import build_dataset
    from pose_estimation_amitai_tpu.models import build_model
    from pose_estimation_amitai_tpu.train.loop import create_train_state

    arrays = make_synthetic_arrays(num_frames=2, num_points=8, image_size=48,
                                   seed=0)
    cfg = Config(num_base_filters=8, head_zero_init=True)
    ds, _ = build_dataset(cfg, arrays)
    x = ds.data["box"][:2]
    model = build_model(cfg, x.shape[1:], int(ds.data["confmaps"].shape[-1]))
    state = create_train_state(model, cfg, {"image": x})
    head = state.params["decoder"]["deconv4"]
    assert all(float(jnp.abs(v).max()) == 0.0 for v in jax.tree.leaves(head))
    enc = [v for k, v in state.params.items() if k != "decoder"]
    assert any(float(jnp.abs(v).max()) > 0 for v in jax.tree.leaves(enc))
    out = model.apply({"params": state.params}, x, train=False)
    assert float(jnp.abs(out).max()) == 0.0

    # default stays library init (non-zero head)
    cfg2 = Config(num_base_filters=8)
    state2 = create_train_state(model, cfg2, {"image": x})
    head2 = state2.params["decoder"]["deconv4"]
    assert any(float(jnp.abs(v).max()) > 0 for v in jax.tree.leaves(head2))
