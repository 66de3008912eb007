"""Checkpoint-port parity for the stage-3 modules (DPT head + flow decoder).

Independent torch oracles of the reference architecture (model/stage3/dpt.py,
flow_decoder.py, raft_decoder.py) with random weights, ported through
utils/torch_port.py into the flax modules; forwards must match in eval mode
(BatchNorm running stats).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from picopose_tpu.models import DPTHead, FlowDecoder
from picopose_tpu.utils.torch_port import (
    _port_dpt,
    _port_flow_decoder,
    to_numpy_state_dict,
)

pytestmark = pytest.mark.compileheavy

torch.manual_seed(0)
jax.config.update("jax_default_matmul_precision", "highest")


def randomize_bn(m):
    """Give BatchNorms non-trivial running stats so the port is exercised."""
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.5, 0.5)
            mod.running_var.uniform_(0.5, 1.5)
            mod.weight.data.uniform_(0.5, 1.5)
            mod.bias.data.uniform_(-0.5, 0.5)


def to_nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def from_nchw(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


# ------------------------------------------------------------------ DPT oracle
class TResidualConvUnit(nn.Module):
    def __init__(self, feats):
        super().__init__()
        self.conv1 = nn.Conv2d(feats, feats, 3, padding=1)
        self.conv2 = nn.Conv2d(feats, feats, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(feats)
        self.bn2 = nn.BatchNorm2d(feats)

    def forward(self, x):
        out = self.bn1(self.conv1(F.relu(x)))
        out = self.bn2(self.conv2(F.relu(out)))
        return out + x


class TFusionBlock(nn.Module):
    def __init__(self, feats):
        super().__init__()
        self.resConfUnit1 = TResidualConvUnit(feats)
        self.resConfUnit2 = TResidualConvUnit(feats)
        self.out_conv = nn.Conv2d(feats, feats, 1)

    def forward(self, x, res=None, size=None):
        if res is not None:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, size=size, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class TDPT(nn.Module):
    def __init__(self, in_ch=32, feats=16, out_ch=(8, 16, 32, 32)):
        super().__init__()
        self.projects = nn.ModuleList(
            [nn.Conv2d(in_ch, oc, 1) for oc in out_ch]
        )
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(out_ch[0], out_ch[0], 4, stride=4),
            nn.ConvTranspose2d(out_ch[1], out_ch[1], 2, stride=2),
            nn.Identity(),
            nn.Conv2d(out_ch[3], out_ch[3], 3, stride=2, padding=1),
        ])
        self.scratch = nn.Module()
        for i, oc in enumerate(out_ch):
            setattr(
                self.scratch, f"layer{i+1}_rn",
                nn.Conv2d(oc, feats, 3, padding=1, bias=False),
            )
        self.scratch.refinenet2 = TFusionBlock(feats)
        self.scratch.refinenet3 = TFusionBlock(feats)
        self.scratch.refinenet4 = TFusionBlock(feats)

    def forward(self, levels):
        out = []
        for i, x in enumerate(levels):
            x = self.projects[i](x)
            x = self.resize_layers[i](x)
            out.append(x)
        l1, l2, l3, l4 = out
        l1r = self.scratch.layer1_rn(l1)
        l2r = self.scratch.layer2_rn(l2)
        l3r = self.scratch.layer3_rn(l3)
        l4r = self.scratch.layer4_rn(l4)
        p4 = self.scratch.refinenet4(l4r, size=l3r.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3r, size=l2r.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2r, size=l1r.shape[2:])
        return [p4, p3, p2]


class TestDPTPort:
    def test_forward_parity(self, rng):
        tm = TDPT().eval()
        randomize_bn(tm)
        sd = to_numpy_state_dict(tm.state_dict())
        sd = {f"x.{k}": v for k, v in sd.items()}
        params, stats = _port_dpt(sd, "x")

        m = DPTHead(in_channels=32, features=16, out_channels=(8, 16, 32, 32))
        levels = [rng.normal(size=(2, 16, 16, 32)).astype(np.float32) for _ in range(4)]
        with torch.no_grad():
            t_out = tm([to_nchw(x) for x in levels])
        j_out = m.apply(
            {"params": params, "batch_stats": stats},
            [jnp.asarray(x) for x in levels], train=False,
        )
        for t, j in zip(t_out, j_out):
            np.testing.assert_allclose(np.asarray(j), from_nchw(t), atol=2e-4)


# ---------------------------------------------------------- FlowDecoder oracle
def t_coords_grid(B, H, W):
    yy, xx = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
    return torch.stack([xx, yy], dim=0).float()[None].repeat(B, 1, 1, 1)


def t_bilinear_sample(feat, grid):
    H, W = feat.shape[-2:]
    gn = torch.empty_like(grid)
    gn[..., 0] = grid[..., 0] * 2.0 / max(W - 1, 1) - 1.0
    gn[..., 1] = grid[..., 1] * 2.0 / max(H - 1, 1) - 1.0
    return F.grid_sample(feat, gn, "bilinear", "zeros", align_corners=True)


def t_corr_pyramid(f1, f2, levels):
    N, C, H, W = f1.shape
    corr = torch.matmul(
        f1.view(N, C, -1).permute(0, 2, 1), f2.view(N, C, -1)
    ).view(N * H * W, 1, H, W) / (C ** 0.5)
    pyr = [corr]
    for _ in range(levels - 1):
        pyr.append(F.avg_pool2d(pyr[-1], 2, 2))
    return pyr


def t_corr_lookup(pyr, flow, r):
    B, _, H, W = flow.shape
    grid = (t_coords_grid(B, H, W) + flow).permute(0, 2, 3, 1)
    d = torch.linspace(-r, r, 2 * r + 1)
    delta = torch.stack(torch.meshgrid(d, d, indexing="ij"), dim=-1)
    outs = []
    for i, corr in enumerate(pyr):
        centroid = grid.reshape(B * H * W, 1, 1, 2) / 2**i
        coords = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        s = t_bilinear_sample(corr, coords)
        outs.append(s.view(B, H, W, -1))
    return torch.cat(outs, dim=-1).permute(0, 3, 1, 2)


class TMotionEncoder(nn.Module):
    def __init__(self, num_levels, r):
        super().__init__()
        cin = num_levels * (2 * r + 1) ** 2
        mk = lambda i, o, k, p: nn.Sequential()
        self.corr_net = nn.Sequential(
            self._cm(cin, 256, 1, 0), self._cm(256, 192, 3, 1)
        )
        self.flow_net = nn.Sequential(
            self._cm(2, 128, 7, 3), self._cm(128, 64, 3, 1)
        )
        self.out_net = nn.Sequential(self._cm(192 + 64, 126, 3, 1))

    @staticmethod
    def _cm(i, o, k, p):
        m = nn.Sequential()
        m.conv = nn.Conv2d(i, o, k, padding=p)
        m.act = nn.ReLU(True)
        return m

    def forward(self, corr, flow):
        c = self.corr_net(corr)
        f = self.flow_net(flow)
        out = self.out_net(torch.cat([c, f], dim=1))
        return torch.cat([out, flow], dim=1)


class TXHead(nn.Module):
    def __init__(self, cin, out_ch, kind):
        super().__init__()
        self.layers = nn.Sequential(
            TMotionEncoder._cm(cin, 512, 3, 1), TMotionEncoder._cm(512, 256, 3, 1)
        )
        k = 3 if kind == "flow" else 1
        self.predict_layer = nn.Conv2d(256, out_ch, k, padding=k // 2)

    def forward(self, x):
        return self.predict_layer(self.layers(x))


class TFlowDecoder(nn.Module):
    def __init__(self, num_levels=2, radius=4):
        super().__init__()
        self.num_levels = num_levels
        self.r = radius // 2
        self.proj = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(256, 256, 1), nn.BatchNorm2d(256))
             for _ in range(num_levels)]
        )
        self.encoder = nn.ModuleList(
            [TMotionEncoder(l + 1, self.r) for l in range(num_levels)]
        )
        self.flow_pred = nn.ModuleList(
            [TXHead(2 * 256 + 128, 2, "flow") for _ in range(num_levels)]
        )
        self.mask_pred = nn.ModuleList(
            [TXHead(2 * 256 + 128, 1, "mask") for _ in range(num_levels)]
        )

    def forward(self, tem_list, real_list, flow, cert):
        flows, certs = [], []
        for l in range(self.num_levels):
            ft = self.proj[l](tem_list[l])
            fr = self.proj[l](real_list[l])
            pyr = t_corr_pyramid(ft, fr, l + 1)
            corr = t_corr_lookup(pyr, flow, self.r)
            motion = self.encoder[l](corr, flow)
            B, _, H, W = flow.shape
            grid = t_coords_grid(B, H, W) + flow
            fr_hat = t_bilinear_sample(fr, grid.permute(0, 2, 3, 1))
            x = torch.cat([ft, fr_hat, motion], dim=1)
            flow = flow + self.flow_pred[l](x)
            cert = cert + self.mask_pred[l](x)
            flows.append(flow)
            certs.append(cert)
            if l != self.num_levels - 1:
                flow = 2 * F.interpolate(flow, scale_factor=2, mode="bilinear",
                                         align_corners=True)
                cert = F.interpolate(cert, scale_factor=2, mode="bilinear",
                                     align_corners=True)
        return flows, certs


class TestFlowDecoderPort:
    def test_forward_parity(self, rng):
        tm = TFlowDecoder(num_levels=2, radius=4).eval()
        randomize_bn(tm)
        sd = to_numpy_state_dict(tm.state_dict())
        sd = {f"x.{k}": v for k, v in sd.items()}
        params, stats = _port_flow_decoder(sd, "x", num_levels=2)

        m = FlowDecoder(num_levels=2, radius=4)
        tem = [rng.normal(size=(1, s, s, 256)).astype(np.float32) for s in (8, 16)]
        real = [rng.normal(size=(1, s, s, 256)).astype(np.float32) for s in (8, 16)]
        flow0 = (rng.normal(size=(1, 8, 8, 2)) * 2).astype(np.float32)
        cert0 = rng.normal(size=(1, 8, 8, 1)).astype(np.float32)

        with torch.no_grad():
            t_flows, t_certs = tm(
                [to_nchw(x) for x in tem], [to_nchw(x) for x in real],
                to_nchw(flow0), to_nchw(cert0),
            )
        j_flows, j_certs = m.apply(
            {"params": params, "batch_stats": stats},
            [jnp.asarray(x) for x in tem], [jnp.asarray(x) for x in real],
            jnp.asarray(flow0), jnp.asarray(cert0), False,
        )
        for t, j in zip(t_flows, j_flows):
            np.testing.assert_allclose(np.asarray(j), from_nchw(t), atol=5e-4)
        for t, j in zip(t_certs, j_certs):
            np.testing.assert_allclose(np.asarray(j), from_nchw(t), atol=5e-4)
