"""End-to-end pipeline tests on hermetic synthetic scenes (tiny backbone).

Two layers of validation:
  * geometry chain with ORACLE flow: GT keypoints -> correspondences ->
    on-device PnP must recover the true pose (no trained weights needed);
  * full neural pipeline: bank build + run_batch execute with correct
    shapes/ranking on an untrained tiny model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from picopose_tpu.data.synthetic import (
    K_TEMPLATE,
    make_pose,
    make_view,
    query_pts2d,
)
from picopose_tpu.eval.pipeline import TemplateBank, build_bank, run_batch_jit
from picopose_tpu.models import PicoPose
from picopose_tpu.models.correspondence import final_correspondences, init_correspondences
from picopose_tpu.ops.pnp import ransac_pnp
from picopose_tpu.train.keypoints import sample_keypoints
from picopose_tpu.geom.affine import mmul

pytestmark = pytest.mark.compileheavy

SMALL = dict(vit_type="dinov2_vits14", blocks_to_take=(1, 3, 5, 7))
RADIUS = 0.05


@pytest.fixture(scope="module")
def views():
    tem = make_view(make_pose(0.3, 0.4, z=0.45), RADIUS)
    qry = make_view(make_pose(0.45, 0.52, z=0.6), RADIUS)
    return tem, qry


class TestKeypointSampler:
    def test_reprojection_consistency(self, views):
        """GT keypoints: template grid points reprojected into the query crop
        must land on the query mask and correspond to the same 3D point."""
        tem, qry = views
        T = np.asarray(qry.pose) @ np.linalg.inv(np.asarray(tem.pose))
        kp = sample_keypoints(
            src_mask=jnp.asarray(tem.mask)[None],
            src_M=jnp.asarray(tem.M)[None],
            src_K=jnp.asarray(tem.K)[None],
            src_depth=jnp.asarray(tem.full_depth)[None],
            tar_mask=jnp.asarray(qry.mask)[None],
            tar_M=jnp.asarray(qry.M)[None],
            tar_K=jnp.asarray(qry.K)[None],
            T_src2tar=jnp.asarray(T.astype(np.float32))[None],
        )
        valid = np.asarray(kp.valid[0])
        assert valid.sum() > 200  # plenty of overlap on a sphere pair
        # all valid reprojections inside the crop
        tar = np.asarray(kp.tar_pts[0])[valid]
        assert (tar >= 0).all() and (tar <= 64).all()


class TestGeometryChainWithOracleFlow:
    def test_pnp_recovers_pose_from_gt_flow(self, views):
        tem, qry = views
        T = np.asarray(qry.pose) @ np.linalg.inv(np.asarray(tem.pose))
        kp = sample_keypoints(
            src_mask=jnp.asarray(tem.mask)[None],
            src_M=jnp.asarray(tem.M)[None],
            src_K=jnp.asarray(tem.K)[None],
            src_depth=jnp.asarray(tem.full_depth)[None],
            tar_mask=jnp.asarray(qry.mask)[None],
            tar_M=jnp.asarray(qry.M)[None],
            tar_K=jnp.asarray(qry.K)[None],
            T_src2tar=jnp.asarray(T.astype(np.float32))[None],
        )
        # oracle "flow output": tar points on the 64-grid, certainty = valid
        tar_pts = kp.tar_pts  # (1, 64, 64, 2) patch units == grid coords
        valid = np.asarray(kp.valid[0])

        pts2d_grid = query_pts2d(qry.M)  # (64, 64, 2) original-image coords
        G = 64
        tar = np.asarray(tar_pts[0])
        xi = np.clip(tar[..., 0].astype(int), 0, G - 1)
        yi = np.clip(tar[..., 1].astype(int), 0, G - 1)
        pts2d = pts2d_grid[yi, xi]  # (64, 64, 2)

        cam_pts = np.asarray(tem.depth_crop_pts)  # (64, 64, 3) template cam
        valid = valid & (cam_pts[..., 2] > 1e-6)
        Rt, tt = np.asarray(tem.pose)[:3, :3], np.asarray(tem.pose)[:3, 3]
        model_pts = (cam_pts - tt) @ Rt

        res = ransac_pnp(
            jnp.asarray(model_pts.reshape(1, -1, 3)),
            jnp.asarray(pts2d.reshape(1, -1, 2)),
            jnp.asarray(qry.K)[None],
            jnp.asarray(valid.reshape(1, -1)),
            jax.random.PRNGKey(0),
        )
        assert bool(res.success[0])
        R_err = np.degrees(
            np.arccos(
                np.clip(
                    (np.trace(np.asarray(res.R[0]).T @ np.asarray(qry.pose)[:3, :3]) - 1) / 2,
                    -1, 1,
                )
            )
        )
        t_err = np.linalg.norm(np.asarray(res.t[0]) - np.asarray(qry.pose)[:3, 3])
        # grid quantization (patch centers, integer gather) bounds accuracy
        assert R_err < 3.0, R_err
        assert t_err < 0.01, t_err


class TestFullPipeline:
    @pytest.fixture(scope="class")
    def model_and_bank(self, views):
        model = PicoPose(**SMALL, compute_dtype=jnp.float32)
        imgs = jnp.zeros((1, 224, 224, 3))
        masks = jnp.ones((1, 224, 224))
        variables = model.init(jax.random.PRNGKey(0), imgs, masks, True)

        # 6-view synthetic template bank
        poses = [make_pose(a, e, z=0.45) for a, e in
                 [(0.3, 0.4), (1.2, 0.3), (2.4, 0.9), (4.0, 1.2), (5.2, 0.7), (0.9, 1.4)]]
        tviews = [make_view(p, RADIUS) for p in poses]
        bank = build_bank(
            model, variables,
            jnp.asarray(np.stack([v.rgb for v in tviews])),
            jnp.asarray(np.stack([v.mask for v in tviews])),
            jnp.asarray(np.stack([v.depth_crop_pts for v in tviews])),
            jnp.asarray(np.stack([v.pose for v in tviews])),
            jnp.asarray(np.stack([v.K for v in tviews])),
            jnp.asarray(np.stack([v.M for v in tviews])),
            chunk=3,
        )
        return model, variables, bank

    @pytest.mark.skipif(
        jax.default_backend() == "cpu",
        reason="XLA CPU takes >18 min just to COMPILE int8 convs at "
        "pipeline shapes (measured); device path is covered by "
        "`bench.py --quant`, decoder numerics by test_models.py",
    )
    def test_run_batch_quantized(self, views, model_and_bank):
        """quantize_stage3 integrates through the folded-hypothesis
        pipeline: same weights, int8 stage-3 convs, valid ranked output."""
        model, variables, bank = model_and_bank
        _, qry = views
        qmodel = PicoPose(
            **SMALL, compute_dtype=jnp.float32, quantize_stage3=True
        )
        batch = {
            "real_rgb": jnp.asarray(qry.rgb)[None],
            "real_mask": jnp.asarray(qry.mask)[None],
            "real_M": jnp.asarray(qry.M)[None],
            "real_K": jnp.asarray(qry.K)[None],
            "real_pts2d": jnp.asarray(query_pts2d(qry.M))[None],
        }
        out = run_batch_jit(
            qmodel, variables, batch, bank, jax.random.PRNGKey(1),
            hyp=2, pnp_iters=16,
        )
        assert out.R.shape == (1, 2, 3, 3)
        assert np.isfinite(np.asarray(out.R)).all()
        assert np.isfinite(np.asarray(out.t)).all()
        ratios = np.asarray(out.inlier_ratio[0])
        assert (np.diff(ratios) <= 1e-6).all()

    def test_run_batch(self, views, model_and_bank):
        model, variables, bank = model_and_bank
        _, qry = views
        batch = {
            "real_rgb": jnp.asarray(qry.rgb)[None],
            "real_mask": jnp.asarray(qry.mask)[None],
            "real_M": jnp.asarray(qry.M)[None],
            "real_K": jnp.asarray(qry.K)[None],
            "real_pts2d": jnp.asarray(query_pts2d(qry.M))[None],
        }
        out = run_batch_jit(
            model, variables, batch, bank, jax.random.PRNGKey(1),
            hyp=3, pnp_iters=32,
        )
        assert out.R.shape == (1, 3, 3, 3)
        assert out.t.shape == (1, 3, 3)
        ratios = np.asarray(out.inlier_ratio[0])
        assert (np.diff(ratios) <= 1e-6).all()  # ranked best-first
        assert np.isfinite(np.asarray(out.R)).all()
        assert np.isfinite(np.asarray(out.t)).all()
        # rotations are orthonormal even on the fallback path
        RtR = np.einsum("hij,hik->hjk", np.asarray(out.R[0]), np.asarray(out.R[0]))
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-3)


class TestStage3TopK:
    def test_topk_speed_mode(self, views, model_and_bank=None):
        """stage3_topk=1: only the best-matching hypothesis gets PnP; the
        rest carry stage-2 poses with ratio -1."""
        import jax
        import jax.numpy as jnp
        from picopose_tpu.eval.pipeline import build_bank, run_batch_jit
        from picopose_tpu.models import PicoPose

        model = PicoPose(**SMALL, compute_dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
            jnp.ones((1, 224, 224)), True,
        )
        tviews = [make_view(make_pose(a, 0.5, z=0.45), RADIUS) for a in (0.3, 1.5, 3.0)]
        bank = build_bank(
            model, variables,
            jnp.asarray(np.stack([v.rgb for v in tviews])),
            jnp.asarray(np.stack([v.mask for v in tviews])),
            jnp.asarray(np.stack([v.depth_crop_pts for v in tviews])),
            jnp.asarray(np.stack([v.pose for v in tviews])),
            jnp.asarray(np.stack([v.K for v in tviews])),
            jnp.asarray(np.stack([v.M for v in tviews])),
        )
        _, qry = views
        batch = {
            "real_rgb": jnp.asarray(qry.rgb)[None],
            "real_mask": jnp.asarray(qry.mask)[None],
            "real_M": jnp.asarray(qry.M)[None],
            "real_K": jnp.asarray(qry.K)[None],
            "real_pts2d": jnp.asarray(query_pts2d(qry.M))[None],
        }
        out = run_batch_jit(
            model, variables, batch, bank, jax.random.PRNGKey(1),
            hyp=3, pnp_iters=16, stage3_topk=1,
        )
        ratios = np.asarray(out.inlier_ratio[0])
        # ranked best-first: the single PnP hypothesis first, -1 tail after
        assert (ratios[1:] == -1.0).all()
        assert np.isfinite(np.asarray(out.R)).all()
