"""Learning actually happens.

The reference's only quality control was watching val MSE / pixel L2 fall per
epoch over 2000 epochs (SURVEY §4); these are the bounded automated
equivalents: (1) short full-pipeline training must beat the zero-prediction
baseline on held-out data, (2) the model must localise peaks to a few pixels
when overfitting one batch (the fast proof that heatmap regression + decode
work end to end)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pose_estimation_amitai_tpu.config import Config
from pose_estimation_amitai_tpu.data.pipeline import build_dataset
from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
from pose_estimation_amitai_tpu.models import build_model
from pose_estimation_amitai_tpu.ops import peaks
from pose_estimation_amitai_tpu.train.trainer import Trainer


def test_flagship_beats_zero_baseline_on_val(tmp_path):
    arrays = make_synthetic_arrays(num_frames=12, num_points=8, image_size=48,
                                   seed=5)
    cfg = Config(
        epochs=22, batch_size=8, batches_per_epoch=10,
        num_base_filters=8, learning_rate=1e-3,
        dropout_ratio=0.0,  # p=0.5 needs the reference's 2000-epoch horizon
        base_output_path=str(tmp_path),
        do_augmentations=False,  # isolate optimisation from augmentation
        val_fraction=0.25, seed=0,
    )
    trainer = Trainer(cfg, arrays=arrays)
    # the do-nothing baseline: predicting all-zero heatmaps
    val_cm = np.asarray(
        trainer.dataset.data["confmaps"]
    )[trainer.dataset.val_inds]
    zero_baseline = float(np.mean(np.square(val_cm)))
    history = trainer.train()
    best = min(history["val_loss"])
    assert best < 0.9 * zero_baseline, (best, zero_baseline)
    assert np.isfinite(history["l2"]).all()


def test_overfit_one_batch_localises_peaks():
    """300 Adam steps on one batch -> decoded peaks within ~3px of GT."""
    arrays = make_synthetic_arrays(num_frames=4, num_points=8, image_size=48,
                                   seed=5)
    cfg = Config(num_base_filters=8, dropout_ratio=0.0)
    ds, _ = build_dataset(cfg, arrays)
    x = ds.data["box"][:8]
    y = ds.data["confmaps"][:8]
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
        params, opt, loss = step(params, opt)

    pred = model.apply({"params": params}, x, train=False)
    l2 = np.asarray(peaks.l2_distances(pred, y))
    # random-guess distance on a 48px image is ~19px; a localising model
    # lands within a few pixels (mean is skewed by the handful of synthetic
    # keypoints that fall outside their crops)
    assert np.median(l2) <= 3.0, np.median(l2)
