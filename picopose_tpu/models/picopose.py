"""PicoPose: the three-stage zero-shot pose network (flax module).

Equivalent of model/picopose.py `Net`, re-architected for TPU execution:

  * the neural stages (ViT features, affine head, DPT + flow decoder) live
    here; geometry (affine composition, pose recovery) and RANSAC-PnP are
    pure functions composed around `apply` by the eval/train pipelines so
    the whole crop -> (R, t) path jits into one XLA program;
  * test-time hypotheses are folded into the batch axis ((B, hyp) ->
    (B*hyp)) instead of a python loop (reference: model/picopose.py:107-110);
  * the template bank caches ALL four backbone levels, so hypotheses never
    re-run the ViT (the reference re-runs it per hypothesis because its bank
    keeps only the last level — model/picopose.py:78, run_test.py:130-132).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from picopose_tpu.models.affine_head import AffineRegressor
from picopose_tpu.models.dinov2 import VIT_CONFIGS, FeatureExtractor
from picopose_tpu.models.dpt import DPTHead
from picopose_tpu.models.flow import FlowDecoder
from picopose_tpu.ops.matching import feature_similarity_volume


class PicoPose(nn.Module):
    vit_type: str = "dinov2_vitl14"
    blocks_to_take: Sequence[int] = (5, 11, 17, 23)
    hypotheses: int = 5
    num_levels: int = 3
    radius: int = 4
    compute_dtype: Any = jnp.bfloat16
    # rematerialize ViT block activations in the backward pass (training
    # memory saver for large per-chip batches; no effect on inference)
    remat_vit: bool = False
    # int8-MXU stage-3 convs (opt-in serving mode; changes numerics vs the
    # reference's float convs — ops/qconv.py, docs/PERF.md)
    quantize_stage3: bool = False
    # fused flow+mask XHead pairs (same params/math, fewer passes over the
    # shared 640-ch input — models/flow.py::_fused_xheads)
    fuse_xheads: bool = True

    def setup(self):
        cfg = VIT_CONFIGS[self.vit_type]
        self.feature_extractor = FeatureExtractor(
            self.vit_type, self.blocks_to_take, self.compute_dtype,
            remat=self.remat_vit, name="feature_extractor",
        )
        self.affine_regressor = AffineRegressor(name="affine_regressor")
        self.dpt_head = DPTHead(in_channels=cfg.embed_dim, name="dpt_head")
        self.flow_decoder = FlowDecoder(
            self.num_levels, self.radius, quantize=self.quantize_stage3,
            fuse_xheads=self.fuse_xheads, name="flow_decoder",
        )

    def features(self, images: jnp.ndarray) -> list[jnp.ndarray]:
        """(B, 224, 224, 3) normalized crops -> 4 x (B, 16, 16, C) taps."""
        return self.feature_extractor(images)

    def stage2(
        self,
        tem_last: jnp.ndarray,
        real_last: jnp.ndarray,
        tem_mask: jnp.ndarray,
    ):
        """Similarity volume + affine regression.

        Returns (translation (B, 2), scale (B,), inplane cos/sin (B, 2)).
        Mirrors model/picopose.py:81-84 / :125-126.
        """
        sim = feature_similarity_volume(
            tem_last.astype(jnp.float32), real_last.astype(jnp.float32), tem_mask
        )
        return self.affine_regressor(sim)

    def dpt(self, feats: list[jnp.ndarray], train: bool = False):
        """DPT pyramid on a 4-level backbone stack (compute_dtype).

        Exposed separately so template pyramids can be cached in the bank
        and query pyramids computed once per batch (the reference recomputes
        both per hypothesis inside OffsetRegressor, offset_regressor.py:17).
        """
        cast = [x.astype(self.compute_dtype) for x in feats]
        return self.dpt_head(cast, train=train)

    def flow(
        self,
        tem_pyr: list[jnp.ndarray],
        real_pyr: list[jnp.ndarray],
        init_flow: jnp.ndarray,
        init_certainty: jnp.ndarray,
        train: bool = False,
    ):
        """Flow decoding over precomputed DPT pyramids; fp32 outputs."""
        flows, certs = self.flow_decoder(
            [x.astype(self.compute_dtype) for x in tem_pyr],
            [x.astype(self.compute_dtype) for x in real_pyr],
            init_flow.astype(jnp.float32), init_certainty.astype(jnp.float32),
            train=train,
        )
        f32 = lambda xs: [x.astype(jnp.float32) for x in xs]
        return f32(flows), f32(certs)

    def stage3(
        self,
        tem_feats: list[jnp.ndarray],
        real_feats: list[jnp.ndarray],
        init_flow: jnp.ndarray,
        init_certainty: jnp.ndarray,
        train: bool = False,
    ):
        """DPT on both feature stacks (shared weights) + flow decoding.

        Mirrors model/stage3/offset_regressor.py:16-19.  Returns per-level
        (flows, certainty logits, in fp32).

        The conv stacks run in compute_dtype (bf16 on TPU — they are the
        pipeline's FLOP hotspot, ~60 TFLOP per 80-crop batch at the 64^2
        level); flow/certainty accumulate in fp32 via the residual adds.
        """
        tem_pyr = self.dpt(tem_feats, train=train)
        real_pyr = self.dpt(real_feats, train=train)
        return self.flow(tem_pyr, real_pyr, init_flow, init_certainty, train=train)

    def __call__(self, images: jnp.ndarray, masks: jnp.ndarray, train: bool = False):
        """Parameter-initialization path: touches every submodule once.

        Not a semantic forward — the real pipelines are in
        picopose_tpu/eval/pipeline.py and picopose_tpu/train/step.py.
        """
        feats = self.features(images)
        translation, scale, inplane = self.stage2(feats[-1], feats[-1], masks)
        B = images.shape[0]
        g = feats[-1].shape[1]
        init_flow = jnp.zeros((B, g, g, 2), jnp.float32)
        init_cert = jnp.zeros((B, g, g, 1), jnp.float32)
        flows, certs = self.stage3(feats, feats, init_flow, init_cert, train=train)
        return translation, scale, inplane, flows, certs
