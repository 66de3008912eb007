"""picopose_tpu — a TPU-native zero-shot 6D pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of PicoPose
(arXiv:2504.02617, reference implementation foollh/PicoPose): zero-shot 6D pose
of novel rigid objects from a single RGB crop via a three-stage pipeline
(DINOv2 template matching -> global 2D affine -> local correspondence offsets)
followed by on-device RANSAC-PnP pose recovery.

Design goals (vs. the PyTorch/CUDA/OpenCV reference):
  * the whole crop -> (R, t) path is ONE jitted XLA program per batch,
    including RANSAC-PnP (reference: per-hypothesis python loops + CPU OpenCV,
    run_test.py:151-186, utils/pose_recovery.py:93-96);
  * template feature banks cache ALL four DINOv2 levels so hypotheses never
    re-run the backbone (reference re-runs the ViT per hypothesis,
    model/picopose.py:78);
  * hypotheses are a vmapped batch axis, not a python loop
    (reference: model/picopose.py:107-110);
  * scaling is data-parallel over a `jax.sharding.Mesh` (reference: NCCL DDP,
    config/base.yaml:5).

Layout conventions (TPU-native, unlike the reference's torch NCHW):
  * images / feature maps are NHWC;
  * 2D points are (..., 2) == (x, y) in pixels;
  * flow fields are (B, H, W, 2) with channels (x, y) in units of the level's
    feature-grid cells;
  * affines are (3, 3) acting on homogeneous (x, y, 1) column vectors;
  * poses are (4, 4) camera-from-model, metric units (meters).
"""

__version__ = "0.1.0"

from picopose_tpu import geom  # noqa: F401
