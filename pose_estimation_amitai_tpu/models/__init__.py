"""Model registry: reference model-type strings -> flax modules.

Mirrors both reference dispatchers (tensorflow/Network.py:42-61
``config_model`` and pytorch/Network.py:15-26) so reference
``train_config.json`` files select the same architectures here. Unknown model
types fall through to ``BasicNet``, matching the TF dispatcher's ``else``
branch (tensorflow/Network.py:59-60).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .. import constants as C
from ..config import Config
from .cnn import BasicNet, C2FPerWing, CoarsePerWing, TwoWingsNet
from .disentangled import FourCamDisentangled
from .multicam import MultiCamNet
from .resnet import GPTResNet, ResNetHeatmapNet
from .vit import ViT4Cameras, ViTPoseNet

__all__ = [
    "BasicNet", "CoarsePerWing", "C2FPerWing", "TwoWingsNet", "MultiCamNet",
    "FourCamDisentangled", "ResNetHeatmapNet", "GPTResNet", "ViTPoseNet",
    "ViT4Cameras",
    "build_model", "needs_camera_matrices", "augmentation_views",
    "vit_single_kwargs",
]

_VIT_SINGLE = {
    C.MODEL_18_POINTS_PER_WING_VIT,
    C.ALL_POINTS_MODEL_VIT,
    C.MODEL_18_POINTS_3_GOOD_CAMERAS_VIT,
    C.MODEL_18_POINTS_PER_WING_VIT_TO_POINTS,
}
_VIT_4CAM = {C.ALL_CAMS_18_POINTS_VIT, C.ALL_CAMS_VIT, C.VIT_4_CAMERAS}
_MULTICAM_4 = {C.ALL_CAMS, C.ALL_CAMS_18_POINTS, C.ALL_CAMS_ALL_POINTS,
               C.HEAD_TAIL_ALL_CAMS}
_DISENTANGLED = {
    C.ALL_CAMS_DISENTANGLED_PER_WING_CNN,
    C.ALL_CAMS_DISENTANGLED_PER_WING_VIT,
}


def needs_camera_matrices(model_type: str) -> bool:
    """True for models whose forward takes (x, P, P_inv) batch inputs."""
    return model_type in _DISENTANGLED


def augmentation_views(model_type: str) -> int:
    """Camera-view count for INDEPENDENT per-view augmentation.

    The reference draws one random affine PER CAMERA VIEW for
    ``ALL_CAMS_18_POINTS`` samples (pytorch/Datagenerators.py:141-153) —
    views are channel blocks, each warped on its own. The same layout holds
    for the ViT twin and the disentangled camera-matrix models (whose
    per-view warps are folded into P/P_inv,
    ops/geometry.compose_affine_into_cameras). Everything else augments
    with one shared transform per sample (the reference default path).
    """
    if model_type in {C.ALL_CAMS_18_POINTS, C.ALL_CAMS_18_POINTS_VIT}:
        return 4
    if model_type in _DISENTANGLED:
        return 4
    return 1


def layout_views(model_type: str) -> int:
    """Camera views stacked on the CHANNEL axis of this model's samples.

    Distinct from :func:`augmentation_views` (how many independent affine
    transforms to draw — 1 for most multicam models, the reference's
    shared-transform default): this is the physical channel layout, which
    mask-channel logic (ops/morphology.random_mask_redilation's per-view
    mask table, reference tensorflow/simple_data_generator.py:104-111)
    must follow regardless of the augmentation policy.
    """
    if model_type == C.ALL_CAMS_AND_3_GOOD_CAMS:
        return 3
    if model_type in _MULTICAM_4 or model_type in _VIT_4CAM or (
        model_type in _DISENTANGLED
    ):
        return 4
    return 1


def layout_masks_per_view(model_type: str) -> int | None:
    """Wing-mask channels in each view block, or ``None`` to let
    ops/morphology.random_mask_redilation infer them from channel
    arithmetic.

    ``BODY_PART_MODEL`` samples carry 3 body-part masks after the time
    channels (data/preprocess.reshape_to_body_parts) — a channel width the
    reference's dilation table never handles (it asserts on unknown widths,
    tensorflow/simple_data_generator.py:104-111), so those masks must never
    be re-dilated: return 0.
    """
    if model_type == C.BODY_PARTS_MODEL:
        return 0
    return None


def _vit_arch_kwargs(cfg: Config, num_output_channels: int) -> dict[str, Any]:
    """Shared ViT architecture kwargs (single-view + 4-cam families).

    Dropout is deliberately NOT threaded: the reference ViT paths run with
    dropout 0.0 (pytorch/VITs.py:197-229 defaults; ``dropout_ratio`` in the
    config dialect feeds the CNN encoder stages only,
    tensorflow/Network.py:416-447), so ViTPoseNet keeps its 0.0 default.
    """
    # pytorch/VITs.py:212: dim_head = projection_dim if config["dim head"] else 64
    dim_head = cfg.projection_dim if cfg.dim_head else 64
    return dict(
        out_channels=num_output_channels,
        patch_size=cfg.patch_size,
        dim=cfg.projection_dim,
        depth=cfg.transformer_layers,
        heads=cfg.num_heads,
        dim_head=dim_head,
        mlp_expand=cfg.fully_connected_expand,
        kernel_size=cfg.kernel_size,
        dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
    )


def vit_single_kwargs(cfg: Config, num_output_channels: int) -> dict[str, Any]:
    """ViT architecture kwargs for ``cfg`` (single-view heatmap family).

    Shared between :func:`build_model`'s ViTPoseNet construction and the
    trainer's pipeline-parallel path (parallel/pipeline.py PipelinedViT),
    which builds the same architecture with its trunk staged over a mesh.
    Raises for model types outside the single-view ViT family — the only
    family with the homogeneous block stack pipeline stages require.
    """
    if cfg.model_type not in _VIT_SINGLE:
        raise ValueError(
            f"pipeline_stages requires a single-view ViT model type, got "
            f"{cfg.model_type!r} (supported: {sorted(_VIT_SINGLE)})"
        )
    return dict(_vit_arch_kwargs(cfg, num_output_channels),
                flavor=cfg.arch_flavor)


def build_model(
    cfg: Config, image_size: tuple[int, ...], num_output_channels: int
) -> nn.Module:
    """Construct the model for ``cfg.model_type``.

    Args:
      cfg: typed config (``arch_flavor`` pins TF vs PyTorch parity details).
      image_size: (H, W, C) of the preprocessed input.
      num_output_channels: confmap channel count of the preprocessed targets.
    """
    mt = cfg.model_type
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    cnn_kw: dict[str, Any] = dict(
        out_channels=num_output_channels,
        filters=cfg.num_base_filters,
        kernel_size=cfg.kernel_size,
        dilation=cfg.dilation_rate,
        dropout=cfg.dropout_ratio,
        num_blocks=cfg.num_blocks,
        flavor=cfg.arch_flavor,
        dtype=dtype,
    )
    vit_kw = _vit_arch_kwargs(cfg, num_output_channels)

    if mt in _MULTICAM_4:
        return MultiCamNet(num_cams=4, do_attention=cfg.do_attention, **cnn_kw)
    if mt == C.ALL_CAMS_AND_3_GOOD_CAMS:
        return MultiCamNet(num_cams=3, do_attention=cfg.do_attention, **cnn_kw)
    if mt == C.TWO_WINGS_TOGATHER:
        return TwoWingsNet(**cnn_kw)
    if mt == C.C2F_PER_WING:
        # the frozen coarse stage regresses the same target set
        # (tensorflow/Network.py:169-198 loads a coarse model trained on
        # identical per-wing confmaps)
        return C2FPerWing(coarse_out_channels=num_output_channels, **cnn_kw)
    if mt == C.COARSE_PER_WING:
        kw = dict(cnn_kw)
        kw.pop("num_blocks", None)
        kw.pop("flavor", None)
        return CoarsePerWing(**kw)
    if mt in _VIT_SINGLE:
        return ViTPoseNet(**vit_single_kwargs(cfg, num_output_channels))
    if mt in _VIT_4CAM:
        return ViT4Cameras(**vit_kw)
    if mt in _DISENTANGLED:
        return FourCamDisentangled(**cnn_kw)
    if mt == C.RESNET_18_POINTS_PER_WING:
        return ResNetHeatmapNet(
            out_channels=num_output_channels, kernel_size=cfg.kernel_size,
            flavor=cfg.resnet_flavor, dtype=dtype,
        )
    if mt == C.GPTNET:
        # pytorch/Network.py:15-26 routes GPTNET to the hand-written
        # residual enc-dec (NNs warehouse/NNs.py:70-136)
        return GPTResNet(out_channels=num_output_channels, dtype=dtype)
    # default: per-wing basic encoder-decoder (tensorflow/Network.py:59-60)
    return BasicNet(**cnn_kw)
