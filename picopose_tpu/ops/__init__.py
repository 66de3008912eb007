"""TPU-native compute ops: sampling, resizing, matching, correlation, PnP.

These replace the reference's torch/OpenCV op surface (F.grid_sample,
F.interpolate, einsum matching, RAFT correlation, cv2.solvePnPRansac) with
jit-safe, statically-shaped JAX implementations; the hot ones have Pallas TPU
kernels with XLA fallbacks (see picopose_tpu/ops/pallas/).
"""

from picopose_tpu.ops.resize import (
    avg_pool2d,
    resize_bilinear,
    resize_nearest,
)
from picopose_tpu.ops.sample import bilinear_sample, warp_by_flow
from picopose_tpu.ops.matching import (
    feature_similarity_volume,
    match_templates,
)
from picopose_tpu.ops.corr import correlation_pyramid, corr_lookup
from picopose_tpu.ops.preprocess import preprocess_frame
