"""DPT feature pyramid head (stage 3).

Equivalent of model/stage3/dpt.py:7-272 (DPTHead with use_bn=True,
features=256, out_channels [256, 512, 1024, 1024], nclass=1, no cls token),
NHWC and flax-native:

  projects[i] 1x1 -> resize (x4 convT / x2 convT / id / 3x3 s2) ->
  scratch.layerN_rn 3x3 (no bias) -> RefineNet-style fusion producing
  [path_4 (16^2), path_3 (32^2), path_2 (64^2)]; refinenet1 and the output
  convs exist in the reference but are never called (dpt.py:270-272), so we
  don't build them.

BatchNorm follows torch defaults (eps 1e-5, momentum 0.1 -> flax 0.9);
`train` toggles batch-stats updates.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from picopose_tpu.ops.resize import resize_bilinear


class ResidualConvUnit(nn.Module):
    """relu->conv3x3->bn->relu->conv3x3->bn + skip (dpt.py:40-95)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        dt = x.dtype  # follow the caller's compute dtype (see flow.py note)
        out = nn.relu(x)
        out = nn.Conv(
            self.features, (3, 3), padding=1, name="conv1", dtype=dt
        )(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn1", dtype=dt,
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=1, name="conv2", dtype=dt
        )(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn2", dtype=dt,
        )(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """Fusion + upsample-to-size + 1x1 out conv (dpt.py:98-156)."""

    features: int

    @nn.compact
    def __call__(self, x, res=None, *, size: tuple[int, int], train: bool):
        if res is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(res, train)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x, train)
        x = resize_bilinear(x, size, align_corners=True)
        return nn.Conv(
            self.features, (1, 1), name="out_conv", dtype=x.dtype
        )(x)


class DPTHead(nn.Module):
    in_channels: int = 1024
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)

    @nn.compact
    def __call__(self, levels: list[jnp.ndarray], train: bool = False):
        """levels: 4 x (B, 16, 16, in_channels) backbone taps ->
        [path_4 (16^2), path_3 (32^2), path_2 (64^2)] each (B, ., ., 256)."""
        assert len(levels) == 4
        outs = []
        for i, x in enumerate(levels):
            dt = x.dtype  # follow the caller's compute dtype (flow.py note)
            x = nn.Conv(
                self.out_channels[i], (1, 1), name=f"projects_{i}", dtype=dt
            )(x)
            if i == 0:
                x = nn.ConvTranspose(
                    self.out_channels[i], (4, 4), strides=(4, 4), padding="VALID",
                    name="resize_0", dtype=dt,
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    self.out_channels[i], (2, 2), strides=(2, 2), padding="VALID",
                    name="resize_1", dtype=dt,
                )(x)
            elif i == 3:
                x = nn.Conv(
                    self.out_channels[i], (3, 3), strides=(2, 2), padding=1,
                    name="resize_3", dtype=dt,
                )(x)
            x = nn.Conv(
                self.features, (3, 3), padding=1, use_bias=False,
                name=f"layer{i + 1}_rn", dtype=dt,
            )(x)
            outs.append(x)

        l1, l2, l3, l4 = outs  # 64^2, 32^2, 16^2, 8^2
        path4 = FeatureFusionBlock(self.features, name="refinenet4")(
            l4, size=l3.shape[1:3], train=train
        )
        path3 = FeatureFusionBlock(self.features, name="refinenet3")(
            path4, l3, size=l2.shape[1:3], train=train
        )
        path2 = FeatureFusionBlock(self.features, name="refinenet2")(
            path3, l2, size=l1.shape[1:3], train=train
        )
        return [path4, path3, path2]
