"""pose_estimation_amitai_tpu — TPU-native 3D fly pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``lior-kotlar/pose-estimation-amitai`` (2D heatmap regression for up to 18
keypoints per wing from 4-camera high-speed video, plus multi-view 3D
lifting), designed TPU-first:

* NHWC tensors, bf16 compute / f32 params, everything under ``jax.jit``
* on-device augmentation + Gaussian target synthesis + peak decode
  (the reference does all three on CPU per channel)
* data parallelism via ``jax.sharding.Mesh`` + NamedSharding — scaling is a
  sharding annotation, not a rewrite
* a single checkpoint format with working resume (the reference writes
  checkpoints every epoch but never loads them, SURVEY §5)
"""

__version__ = "0.1.0"

from .config import Config  # noqa: F401
