"""Parity tests for sampling/resize/correlation ops against torch CPU oracles.

torch is used ONLY as a test oracle (the reference implementation's op
semantics); the library itself is torch-free.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from picopose_tpu.ops import (
    avg_pool2d,
    bilinear_sample,
    corr_lookup,
    correlation_pyramid,
    feature_similarity_volume,
    match_templates,
    resize_bilinear,
    resize_nearest,
    warp_by_flow,
)
from picopose_tpu.ops.corr import corr_lookup_pyramid


def to_nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def from_nchw(t):
    return np.moveaxis(t.numpy(), 1, -1)


class TestResize:
    @pytest.mark.parametrize("out_hw", [(16, 16), (7, 9), (64, 64)])
    def test_nearest_matches_torch(self, rng, out_hw):
        x = rng.normal(size=(2, 24, 36, 3)).astype(np.float32)
        ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
        ref = from_nchw(F.interpolate(to_nchw(x), size=out_hw, mode="nearest"))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_nearest_3d_mask(self, rng):
        m = (rng.random((2, 224, 224)) > 0.5).astype(np.float32)
        ours = np.asarray(resize_nearest(jnp.asarray(m), (16, 16)))
        ref = F.interpolate(torch.from_numpy(m)[:, None], size=(16, 16), mode="nearest")
        np.testing.assert_allclose(ours, ref[:, 0].numpy(), atol=1e-6)

    @pytest.mark.parametrize("align", [True, False])
    @pytest.mark.parametrize("out_hw", [(32, 32), (13, 5), (10, 20)])
    def test_bilinear_matches_torch(self, rng, align, out_hw):
        x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
        ref = from_nchw(
            F.interpolate(to_nchw(x), size=out_hw, mode="bilinear", align_corners=align)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_avg_pool(self, rng):
        x = rng.normal(size=(3, 16, 16, 2)).astype(np.float32)
        ours = np.asarray(avg_pool2d(jnp.asarray(x), 2))
        ref = from_nchw(F.avg_pool2d(to_nchw(x), 2, 2))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestBilinearSample:
    def test_matches_grid_sample_align_true(self, rng):
        feat = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
        # sample coords including OOB to exercise zero padding
        grid = rng.uniform(-3, 18, size=(2, 5, 7, 2)).astype(np.float32)

        ours = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(grid)))

        g = torch.from_numpy(grid.copy())
        H = W = 16
        gn = torch.empty_like(g)
        gn[..., 0] = g[..., 0] * 2.0 / (W - 1) - 1.0
        gn[..., 1] = g[..., 1] * 2.0 / (H - 1) - 1.0
        ref = F.grid_sample(
            to_nchw(feat), gn, mode="bilinear", padding_mode="zeros", align_corners=True
        )
        np.testing.assert_allclose(ours, from_nchw(ref), atol=1e-5)

    def test_warp_by_flow_identity(self, rng):
        feat = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        flow = np.zeros((1, 8, 8, 2), np.float32)
        out = np.asarray(warp_by_flow(jnp.asarray(feat), jnp.asarray(flow)))
        np.testing.assert_allclose(out, feat, atol=1e-6)

    def test_warp_by_flow_shift(self, rng):
        feat = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        flow = np.ones((1, 8, 8, 2), np.float32) * np.array([1.0, 0.0])  # x+1
        out = np.asarray(warp_by_flow(jnp.asarray(feat), jnp.asarray(flow)))
        np.testing.assert_allclose(out[0, :, :-1], feat[0, :, 1:], atol=1e-6)
        np.testing.assert_allclose(out[0, :, -1], 0.0, atol=1e-6)  # zero pad


class TestCorrelation:
    def test_pyramid_matches_torch_reference_math(self, rng):
        B, H, W, C = 2, 8, 8, 16
        f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
        f2 = rng.normal(size=(B, H, W, C)).astype(np.float32)
        pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 2)

        t1, t2 = to_nchw(f1), to_nchw(f2)
        corr = torch.matmul(
            t1.view(B, C, -1).permute(0, 2, 1), t2.view(B, C, -1)
        ).view(B * H * W, 1, H, W) / np.sqrt(C)
        np.testing.assert_allclose(np.asarray(pyr[0])[..., 0], corr[:, 0].numpy(), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(pyr[1])[..., 0], F.avg_pool2d(corr, 2, 2)[:, 0].numpy(), atol=1e-4
        )

    @pytest.mark.parametrize("levels,radius", [(1, 2), (2, 2), (3, 2)])
    def test_direct_lookup_equals_pyramid_lookup(self, rng, levels, radius):
        B, H, W, C = 2, 16, 16, 32
        f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
        f2 = rng.normal(size=(B, H, W, C)).astype(np.float32)
        flow = rng.normal(size=(B, H, W, 2)).astype(np.float32) * 3
        pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), levels)
        via_pyr = np.asarray(corr_lookup_pyramid(pyr, jnp.asarray(flow), radius))
        direct = np.asarray(
            corr_lookup(jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(flow), radius, levels)
        )
        np.testing.assert_allclose(direct, via_pyr, atol=2e-4)


class TestMatching:
    def _torch_similarity(self, src_feat, tar_feat, src_mask):
        """Inline torch oracle of matching_features_similarity semantics."""
        B = src_feat.shape[0]
        h = src_feat.shape[2]
        tar = F.normalize(tar_feat, dim=1).reshape(B, -1, h * h)
        src = F.normalize(src_feat, dim=1).reshape(B, -1, h * h)
        m = F.interpolate(src_mask[:, None], size=(h, h)).reshape(B, h * h)
        sim = torch.einsum("bct,bcs->bts", tar, src)
        sim = sim * m[:, None, :]
        sim = torch.clamp(sim, min=0)
        sim = sim.reshape(B, h, h, h * h).permute(0, 3, 2, 1)  # b (w h) s -> b s h w
        return sim

    def test_similarity_volume_matches_oracle(self, rng):
        B, h, C = 2, 16, 64
        tem = rng.normal(size=(B, h, h, C)).astype(np.float32)
        qry = rng.normal(size=(B, h, h, C)).astype(np.float32)
        mask = (rng.random((B, 224, 224)) > 0.4).astype(np.float32)

        ours = np.asarray(
            feature_similarity_volume(jnp.asarray(tem), jnp.asarray(qry), jnp.asarray(mask))
        )
        ref = self._torch_similarity(
            to_nchw(tem), to_nchw(qry), torch.from_numpy(mask)
        )
        # ours: (B, h, w, S); ref: (B, S, h, w)
        np.testing.assert_allclose(ours, np.moveaxis(ref.numpy(), 1, -1), atol=1e-5)

    def test_match_templates_picks_identical_view(self, rng):
        """The view equal to the query must win with a full mask."""
        B, N, h, C = 1, 7, 16, 32
        tems = rng.normal(size=(B, N, h, h, C)).astype(np.float32)
        qry = tems[:, 3] + 0.01 * rng.normal(size=(B, h, h, C)).astype(np.float32)
        mask = np.ones((B, 224, 224), np.float32)
        scores, ids = match_templates(
            jnp.asarray(tems), jnp.asarray(qry), jnp.asarray(mask), topk=3
        )
        assert int(ids[0, 0]) == 3
        assert float(scores[0, 0]) >= float(scores[0, 1])

    def test_match_templates_masked_query_scores_zero(self, rng):
        B, N, h, C = 1, 2, 16, 8
        tems = rng.normal(size=(B, N, h, h, C)).astype(np.float32)
        qry = rng.normal(size=(B, h, h, C)).astype(np.float32)
        mask = np.zeros((B, 224, 224), np.float32)
        scores, _ = match_templates(
            jnp.asarray(tems), jnp.asarray(qry), jnp.asarray(mask), topk=2
        )
        np.testing.assert_allclose(np.asarray(scores), 0.0, atol=1e-7)
