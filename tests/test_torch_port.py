"""End-to-end checkpoint-port parity: torch oracle models vs ported flax.

The torch modules here are small independent oracles written to the
reference's documented architecture (NOT imports/copies of it); random
weights flow through `utils/torch_port.py` into the flax modules, and both
forwards must agree to fp32 tolerance.  This validates simultaneously (a)
our architecture rebuild and (b) the checkpoint converter.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from picopose_tpu.models import AffineRegressor, FeatureExtractor
from picopose_tpu.models.dinov2 import ViTConfig, VIT_CONFIGS
from picopose_tpu.utils.torch_port import (
    _port_affine_regressor,
    port_dinov2,
    to_numpy_state_dict,
)

pytestmark = pytest.mark.compileheavy

torch.manual_seed(0)

# Port-parity must compare true fp32 numerics; the backend's default matmul
# precision is bf16-like (TPU MXU emulation) which adds ~1e-2 noise.
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------- torch oracles
class TLayerScale(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.randn(dim) * 0.1 + 1.0)

    def forward(self, x):
        return x * self.gamma


class TAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        x = F.scaled_dot_product_attention(q, k, v)
        return self.proj(x.transpose(1, 2).reshape(B, N, C))


class TBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttention(dim, heads)
        self.ls1 = TLayerScale(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.ls2 = TLayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.ls2(h)


class TDino(nn.Module):
    """Minimal DINOv2 trunk with the reference's pos-embed interpolation
    (vision_transformer.py:179-228)."""

    def __init__(self, dim=64, depth=4, heads=4, patch=14, pos_grid=37):
        super().__init__()
        self.patch = patch
        self.pos_grid = pos_grid
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, pos_grid**2 + 1, dim) * 0.02)
        self.blocks = nn.ModuleList([TBlock(dim, heads) for _ in range(depth)])

    def interpolate_pos(self, w0, h0):
        cls_pe, patch_pe = self.pos_embed[:, :1], self.pos_embed[:, 1:]
        dim = patch_pe.shape[-1]
        G = self.pos_grid
        sx = (w0 + 0.1) / G
        pe = patch_pe.reshape(1, G, G, dim).permute(0, 3, 1, 2)
        pe = F.interpolate(pe, scale_factor=(sx, sx), mode="bicubic", antialias=False)
        pe = pe.permute(0, 2, 3, 1).reshape(1, -1, dim)
        return torch.cat([cls_pe, pe], dim=1)

    def forward(self, x):
        B, _, H, W = x.shape
        gh, gw = H // self.patch, W // self.patch
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.interpolate_pos(gw, gh)
        outs = []
        for blk in self.blocks:
            x = blk(x)
            outs.append(x)
        return outs


class TAffineRegressor(nn.Module):
    """model/stage2/affine_regressor.py:6-84 oracle."""

    def __init__(self, in_ch=256, hidden=256):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(in_ch, hidden, 1),
            nn.GroupNorm(32, hidden),
            nn.ReLU(True),
            nn.Conv2d(hidden, hidden, 3, stride=2, padding=1, bias=False),
            nn.GroupNorm(32, hidden),
            nn.ReLU(True),
        )
        self.fc1 = nn.Linear(hidden * 64, 1024)
        self.fc2 = nn.Linear(1024, 256)

        def head(out):
            return nn.Sequential(
                nn.Linear(hidden, hidden), nn.ReLU(True),
                nn.Linear(hidden, hidden), nn.ReLU(True),
                nn.Linear(hidden, out),
            )

        self.translation_predictor = head(2)
        self.scale_predictor = head(1)
        self.inplane_predictor = head(2)

    def forward(self, x):
        x = self.features(x)
        x = x.flatten(1)
        x = F.leaky_relu(self.fc1(x), 0.1)
        x = F.leaky_relu(self.fc2(x), 0.1)
        tr = self.translation_predictor(x)
        sc = self.scale_predictor(x)
        inp = torch.tanh(self.inplane_predictor(x))
        inp = F.normalize(inp, dim=1)
        return tr, sc.squeeze(1), inp


# ---------------------------------------------------------------------- tests
class TestDinov2Port:
    def test_forward_parity(self, rng):
        tm = TDino(dim=64, depth=4, heads=4).eval()
        sd = to_numpy_state_dict(tm.state_dict())
        # rename to hub-checkpoint style expected by the porter
        sd = {k.replace("blocks.", "blocks."): v for k, v in sd.items()}

        cfg = ViTConfig(embed_dim=64, depth=4, num_heads=4)
        VIT_CONFIGS["_test_tiny"] = cfg
        fe = FeatureExtractor("_test_tiny", (0, 1, 2, 3), compute_dtype=jnp.float32)

        x = rng.normal(size=(2, 3, 112, 112)).astype(np.float32)
        with torch.no_grad():
            touts = tm(torch.from_numpy(x))
        tfeats = [
            o[:, 1:].transpose(1, 2).reshape(2, 64, 8, 8).permute(0, 2, 3, 1).numpy()
            for o in touts
        ]

        params = {"feature_extractor": port_dinov2(sd, depth=4)}
        jfeats = fe.apply(
            {"params": params["feature_extractor"]},
            jnp.asarray(np.moveaxis(x, 1, -1)),
        )
        for tf, jf in zip(tfeats, jfeats):
            np.testing.assert_allclose(np.asarray(jf), tf, atol=2e-4)

    def test_strict_depth_mismatch_is_contextual(self):
        """vit-S-depth weights into a deeper model must raise a ValueError
        naming both depths, not a raw KeyError (ADVICE r3)."""
        sd = to_numpy_state_dict(TDino(dim=64, depth=4, heads=4).state_dict())
        with pytest.raises(ValueError, match="4 transformer blocks.*expects 6"):
            port_dinov2(sd, depth=6, strict=True)

    def test_strict_rejects_unconsumed_keys(self):
        """Keys the flax model cannot represent (e.g. register_tokens from a
        *_reg4 checkpoint) must fail loudly, mirroring the reference's
        load_state_dict(strict=True) (feature_extractor.py:73-77)."""
        sd = to_numpy_state_dict(TDino(dim=64, depth=4, heads=4).state_dict())
        sd["register_tokens"] = np.zeros((1, 4, 64), np.float32)
        with pytest.raises(ValueError, match="register_tokens"):
            port_dinov2(sd, depth=4, strict=True)

    def test_strict_allows_benign_extras(self):
        """mask_token and the unused final norm are known-benign leftovers."""
        sd = to_numpy_state_dict(TDino(dim=64, depth=4, heads=4).state_dict())
        sd["mask_token"] = np.zeros((1, 64), np.float32)
        sd["norm.weight"] = np.ones((64,), np.float32)
        sd["norm.bias"] = np.zeros((64,), np.float32)
        port_dinov2(sd, depth=4, strict=True)  # must not raise


class TestAffinePort:
    def test_forward_parity(self, rng):
        tm = TAffineRegressor().eval()
        sd = to_numpy_state_dict(tm.state_dict())
        sd2 = {f"x.{k}": v for k, v in sd.items()}
        params = _port_affine_regressor(sd2, "x")

        m = AffineRegressor()
        x = rng.normal(size=(3, 256, 16, 16)).astype(np.float32)
        with torch.no_grad():
            t_tr, t_sc, t_inp = tm(torch.from_numpy(x))
        j_tr, j_sc, j_inp = m.apply(
            {"params": params}, jnp.asarray(np.moveaxis(x, 1, -1))
        )
        np.testing.assert_allclose(np.asarray(j_tr), t_tr.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_sc), t_sc.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_inp), t_inp.numpy(), atol=1e-4)
