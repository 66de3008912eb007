"""Stage-3 flow decoder: coarse-to-fine RAFT-style correspondence refinement.

Equivalent of model/stage3/flow_decoder.py:9-94 + the pieces of
model/stage3/raft_decoder.py it instantiates (MotionEncoder :56-161,
XHead :251-289), with the correlation lookup running in direct (volume-free)
form (picopose_tpu/ops/corr.py).

Per level l in {0, 1, 2} at resolution 16*2^l:
  proj: 1x1 conv + BN on both feature maps;
  corr = direct lookup, pyramid depth l+1, radius 2 ((2r+1)^2 = 25 taps);
  motion = MotionEncoder(corr, flow) -> 126 ch + flow -> 128;
  x = concat[tem_feat, warp(real_feat, flow), motion] (640 ch);
  flow += XHead_flow(x); certainty += XHead_mask(x);  (iters = 1)
  between levels: flow -> 2 * bilinear x2 (align_corners=True), certainty
  likewise without the value scale.

Flow fields are (B, H, W, 2), channels (x, y), units of level cells.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from picopose_tpu.ops.corr import corr_lookup
from picopose_tpu.ops.resize import resize_bilinear
from picopose_tpu.ops.sample import warp_by_flow


def _conv_relu(x, ch: int, k: int, pad: int, name: str, quantize: bool = False):
    # dtype=x.dtype keeps the conv in the caller's compute dtype: without
    # it flax promotes bf16 activations with the fp32 params to FP32
    # activations throughout the stack — 2x the HBM/VMEM traffic of the
    # hottest convs in the model (params stay fp32 either way).
    # quantize=True swaps in the int8-MXU conv (same param tree; opt-in
    # serving mode, ops/qconv.py).
    if quantize:
        from picopose_tpu.ops.qconv import QConv

        x = QConv(ch, (k, k), padding=pad, name=name)(x)
    else:
        x = nn.Conv(ch, (k, k), padding=pad, name=name, dtype=x.dtype)(x)
    return nn.relu(x)


class MotionEncoder(nn.Module):
    """corr/flow conv encoders -> 126-ch motion feature + raw flow (=128).

    Matches raft_decoder.py:56-161 with net_type='Basic', norm None, act ReLU:
    corr_net (1x1 -> 256, 3x3 -> 192), flow_net (7x7 -> 128, 3x3 -> 64),
    out_net (3x3 -> 126); output concat([out, flow]).
    """

    quantize: bool = False

    @nn.compact
    def __call__(self, corr: jnp.ndarray, flow: jnp.ndarray):
        q = self.quantize
        c = _conv_relu(corr, 256, 1, 0, "corr_net_0", q)
        c = _conv_relu(c, 192, 3, 1, "corr_net_1", q)
        f = _conv_relu(flow, 128, 7, 3, "flow_net_0", q)
        f = _conv_relu(f, 64, 3, 1, "flow_net_1", q)
        out = _conv_relu(jnp.concatenate([c, f], axis=-1), 126, 3, 1, "out_net_0", q)
        return jnp.concatenate([out, flow], axis=-1)


class XHead(nn.Module):
    """Two 3x3 conv+ReLU layers then a predict conv (raft_decoder.py:251-289);
    flow variant predicts with 3x3, mask variant with 1x1."""

    out_ch: int
    kind: str  # 'flow' | 'mask'
    quantize: bool = False

    @nn.compact
    def __call__(self, x):
        x = _conv_relu(x, 512, 3, 1, "layers_0", self.quantize)
        x = _conv_relu(x, 256, 3, 1, "layers_1", self.quantize)
        k = 3 if self.kind == "flow" else 1
        # dtype again: an fp32-promoted 1/2-channel predict conv costs ~4 ms
        # per level in the device trace purely from the fp32 layout
        return nn.Conv(
            self.out_ch, (k, k), padding=k // 2, name="predict", dtype=x.dtype
        )(x)


class FlowDecoder(nn.Module):
    num_levels: int = 3
    radius: int = 4  # config radius; per-level lookup uses radius // 2
    # int8-MXU conv serving mode (ops/qconv.py); proj convs stay float
    # (they feed BatchNorm), as do the 2/1-channel predict convs (tiny)
    quantize: bool = False

    @nn.compact
    def __call__(
        self,
        tem_feats: list[jnp.ndarray],
        real_feats: list[jnp.ndarray],
        init_flow: jnp.ndarray,
        init_certainty: jnp.ndarray,
        train: bool = False,
    ):
        """tem/real_feats: DPT outputs [(B,16,16,256), (B,32,32,256),
        (B,64,64,256)]; init flow/certainty at 16^2.  Returns per-level lists
        of flows (B,H,W,2) and certainty logits (B,H,W,1).

        real_feats may carry B // group entries for integer group (the eval
        pipeline folds hypotheses into the template batch axis while the
        query-image features are shared): the real-side projection runs at
        the smaller batch and the lookup/warp kernels index it b // group —
        the tiled copy never materializes."""
        lookup_radius = self.radius // 2
        bt, br = tem_feats[0].shape[0], real_feats[0].shape[0]
        if bt % br != 0:
            raise ValueError(
                f"template batch {bt} is not a multiple of query batch {br}; "
                "the hypothesis-shared query features require an integer "
                "group or the lookup/warp kernels would index the wrong map"
            )
        group = bt // br
        flow, certainty = init_flow, init_certainty
        pred_flow, pred_certainty = [], []
        for level in range(self.num_levels):
            # one shared projection applied to BOTH feature maps
            # (flow_decoder.py:78 uses the same proj module for render/real)
            cdt = tem_feats[level].dtype
            proj_conv = nn.Conv(
                256, (1, 1), name=f"proj_{level}_conv", dtype=cdt
            )
            proj_bn = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"proj_{level}_bn", dtype=cdt,
            )
            ft = proj_bn(proj_conv(tem_feats[level]))
            fr = proj_bn(proj_conv(real_feats[level]))
            corr = corr_lookup(
                ft, fr, flow, lookup_radius, level + 1, group=group
            )
            # keep the conv stacks in the feature compute dtype (bf16 on TPU);
            # flow itself stays fp32 through the residual adds below
            motion = MotionEncoder(name=f"encoder_{level}", quantize=self.quantize)(
                corr.astype(ft.dtype), flow.astype(ft.dtype)
            )
            fr_hat = warp_by_flow(fr, flow, group=group)
            x = jnp.concatenate([ft, fr_hat, motion], axis=-1)
            flow = flow + XHead(
                2, "flow", name=f"flow_pred_{level}", quantize=self.quantize
            )(x)
            certainty = certainty + XHead(
                1, "mask", name=f"mask_pred_{level}", quantize=self.quantize
            )(x)

            pred_flow.append(flow)
            pred_certainty.append(certainty)
            if level != self.num_levels - 1:
                H, W = flow.shape[1:3]
                flow = 2.0 * resize_bilinear(flow, (2 * H, 2 * W), align_corners=True)
                certainty = resize_bilinear(
                    certainty, (2 * H, 2 * W), align_corners=True
                )
        return pred_flow, pred_certainty
