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
import jax
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


class _ConvParams(nn.Module):
    """Declares one conv's {kernel, bias} at this module's scope WITHOUT
    computing, so the fused XHead path below can own the exact same param
    tree (flow_pred_N/layers_0/kernel, ...) as the unfused `XHead` modules:
    checkpoints, the torch porter/exporter, and optimizer trees are
    byte-identical between the two compute paths.  Initializers mirror
    nn.Conv's defaults (lecun_normal kernel, zero bias), and linen derives
    param-init RNG from the scope path alone, so a fused and an unfused
    model init to the SAME weights."""

    kshape: tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kshape
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.kshape[-1],))
        return kernel, bias


class _XHeadParams(nn.Module):
    """XHead's three convs as bare params (layers_0/layers_1/predict)."""

    out_ch: int
    kind: str  # 'flow' | 'mask'
    in_ch: int = 640

    @nn.compact
    def __call__(self):
        k = 3 if self.kind == "flow" else 1
        return (
            _ConvParams((3, 3, self.in_ch, 512), name="layers_0")(),
            _ConvParams((3, 3, 512, 256), name="layers_1")(),
            _ConvParams((k, k, 256, self.out_ch), name="predict")(),
        )


def _conv_same(x, kernel, bias, groups: int = 1):
    """NHWC stride-1 SAME conv in x's dtype (params cast, fp32 accum)."""
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + bias.astype(x.dtype)


def _fused_xheads(x, flow_params, mask_params):
    """Run the flow and mask XHeads as ONE conv stack over their shared
    640-ch input.

    The two heads read the same activation map x but have independent
    weights, so the reference runs the stack twice (raft_decoder.py:251-289
    instantiated at flow_decoder.py:36-37).  Fused: layers_0 concatenates
    output channels (one 640->1024 conv = one pass over x instead of two),
    layers_1 and predict become feature_group_count=2 convs (block-diagonal
    = the two independent 512->256 / 256->out stacks, same FLOPs, half the
    kernel launches and activation round-trips).  The mask head's 1x1
    predict is zero-padded to 3x3 (identical math under SAME padding) and
    given a dead 2nd output channel so the grouped conv splits evenly;
    per-channel contractions are unchanged, so this is numerics-equivalent
    to the unfused path up to compiler reassociation.

    Returns (dflow (B,H,W,2), dcert (B,H,W,1)) in x.dtype."""
    (kf0, bf0), (kf1, bf1), (kfp, bfp) = flow_params
    (km0, bm0), (km1, bm1), (kmp, bmp) = mask_params

    k0 = jnp.concatenate([kf0, km0], axis=-1)
    b0 = jnp.concatenate([bf0, bm0], axis=-1)
    h = nn.relu(_conv_same(x, k0, b0))  # (B, H, W, 1024)

    k1 = jnp.concatenate([kf1, km1], axis=-1)  # (3,3,512,512), groups=2
    b1 = jnp.concatenate([bf1, bm1], axis=-1)
    h = nn.relu(_conv_same(h, k1, b1, groups=2))  # (B, H, W, 512)

    # mask predict: (1,1,256,1) -> centered (3,3,256,2) with a zero channel
    kmp3 = jnp.pad(kmp, ((1, 1), (1, 1), (0, 0), (0, 1)))
    kp = jnp.concatenate([kfp, kmp3], axis=-1)  # (3,3,256,4), groups=2
    bp = jnp.concatenate([bfp, bmp, jnp.zeros_like(bmp)], axis=-1)
    p = _conv_same(h, kp, bp, groups=2)  # (B, H, W, 4)
    return p[..., :2], p[..., 2:3]


class FlowDecoder(nn.Module):
    num_levels: int = 3
    radius: int = 4  # config radius; per-level lookup uses radius // 2
    # int8-MXU conv serving mode (ops/qconv.py); proj convs stay float
    # (they feed BatchNorm), as do the 2/1-channel predict convs (tiny)
    quantize: bool = False
    # run the flow+mask XHead pairs as one fused conv stack (identical
    # param tree and per-channel math — see _fused_xheads); the int8 path
    # keeps the unfused stacks (per-conv dynamic scales)
    fuse_xheads: bool = True

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
            if self.fuse_xheads and not self.quantize:
                dflow, dcert = _fused_xheads(
                    x,
                    _XHeadParams(2, "flow", name=f"flow_pred_{level}")(),
                    _XHeadParams(1, "mask", name=f"mask_pred_{level}")(),
                )
                flow = flow + dflow
                certainty = certainty + dcert
            else:
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
