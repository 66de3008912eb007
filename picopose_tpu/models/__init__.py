"""Neural network modules (flax.linen): DINOv2 backbone + stage-2/3 heads.

Parameter trees are named to map 1:1 onto the reference's torch state dicts
so checkpoints can be ported mechanically (picopose_tpu/utils/torch_port.py).
"""

from picopose_tpu.models.dinov2 import DinoViT, FeatureExtractor, VIT_CONFIGS
from picopose_tpu.models.affine_head import AffineRegressor
from picopose_tpu.models.dpt import DPTHead
from picopose_tpu.models.flow import FlowDecoder
from picopose_tpu.models.picopose import PicoPose
