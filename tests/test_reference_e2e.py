"""END-TO-END parity against the ACTUAL reference network.

test_reference_parity.py pins every module against its reference
counterpart in isolation; this file chains the WHOLE thing: the real
reference `model.picopose.Net.forward_test` (vit-small trunk, random
shared weights, mmcv stubbed exactly as in test_reference_parity) runs a
coherent synthetic scene (data/synthetic.py sphere world) against our
one-program pipeline with weights ported through utils/torch_port — the
same data flowing through template selection -> per-hypothesis gathers ->
stage 2 -> stage-3 flow -> final correspondences on both sides.

The deterministic chain (ids, stage-2 poses, flows, certainties, final
correspondence sets) must agree to float tolerance.  The stochastic tail
(RANSAC-PnP) is pinned separately on clean synthetic correspondences:
the reference's cv2.solvePnPRansac (utils/pose_recovery.py:68-105) and
our on-device ransac_pnp must both recover the ground-truth pose.

Reference code is imported from /root/reference at test time as data
under test; nothing is copied into the repo.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

REF = "/root/reference"

from tests.test_reference_parity import _install_mmcv_stub  # noqa: E402

pytestmark = pytest.mark.compileheavy


@pytest.fixture(scope="module")
def ref_net():
    """The full reference Net (vit-small, no pretrained download)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _install_mmcv_stub()
    from model.picopose import Net  # reference module

    ns = types.SimpleNamespace
    cfg = ns(
        hypothesis=2,
        stage1=ns(
            vit_type="dinov2_vits14",
            pretrained=False,
            interaction_indexes=[[0, 1], [2, 3], [4, 5], [6, 7]],
        ),
        stage2=ns(in_channel=256, hidden_dim=256),
        stage3=ns(nclass=1, in_channels=384, num_levels=3, radius=4),
    )
    torch.manual_seed(0)
    net = Net(cfg).eval()
    # non-trivial eval-mode BatchNorm statistics everywhere
    g = torch.Generator().manual_seed(1)
    for mod in net.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.copy_(
                torch.randn(mod.running_mean.shape, generator=g) * 0.1
            )
            mod.running_var.copy_(
                torch.rand(mod.running_var.shape, generator=g) * 0.5 + 0.75
            )
    return net


@pytest.fixture(scope="module")
def scene():
    """Coherent sphere world: N template views + B query crops with poses."""
    from picopose_tpu.data.synthetic import make_pose, make_view, query_pts2d

    N, B = 8, 2
    rng = np.random.default_rng(7)
    views = [
        make_view(make_pose(az, 0.35 + 0.1 * (i % 3), z=0.55))
        for i, az in enumerate(np.linspace(0.0, 2 * np.pi, N, endpoint=False))
    ]
    queries = [
        make_view(make_pose(0.45 + 0.9 * b, 0.42, z=0.58)) for b in range(B)
    ]
    tem = {
        "rgb": np.stack([v.rgb for v in views]),          # (N, 224, 224, 3)
        "mask": np.stack([v.mask for v in views]),
        "M": np.stack([v.M for v in views]),
        "K": np.stack([v.K for v in views]),
        "pose": np.stack([v.pose for v in views]),
        "pts3d": np.stack([v.depth_crop_pts for v in views]),  # (N, 64, 64, 3)
    }
    real = {
        "rgb": np.stack([q.rgb for q in queries]),
        "mask": np.stack([q.mask for q in queries]),
        "M": np.stack([q.M for q in queries]),
        "K": np.stack([q.K for q in queries]),
        "pose": np.stack([q.pose for q in queries]),
        "pts2d": np.stack([query_pts2d(q.M) for q in queries]),
    }
    del rng
    return tem, real, N, B


def _nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))


def _ref_end_points(tem, real, N, B):
    """Assemble the reference forward_test input dict (SURVEY.md §3.4)."""
    rep = lambda a: torch.from_numpy(np.broadcast_to(a, (B,) + a.shape).copy())
    ep = {
        "tem_rgb": _nchw(tem["rgb"])[None].repeat(B, 1, 1, 1, 1),  # (B,N,3,H,W)
        "tem_mask": rep(tem["mask"]),
        "tem_M": rep(tem["M"]),
        "tem_K": rep(tem["K"]),
        "tem_pose": rep(tem["pose"]),
        "tem_pts3d": rep(tem["pts3d"]),
        "real_rgb": _nchw(real["rgb"]),
        "real_mask": torch.from_numpy(real["mask"]),
        "real_M": torch.from_numpy(real["M"]),
        "real_K": torch.from_numpy(real["K"]),
        "real_pose": torch.from_numpy(real["pose"]),
        "real_pts2d": torch.from_numpy(real["pts2d"]),
    }
    return ep


@pytest.fixture(scope="module")
def both_runs(ref_net, scene):
    """Run the reference Net.forward_test and our pipeline chain once."""
    tem, real, N, B = scene
    HYP = 2

    # ---- reference side: cached last-level template features, full forward
    ep = _ref_end_points(tem, real, N, B)
    with torch.no_grad():
        tem_feats_t = ref_net.feature_extractor(_nchw(tem["rgb"]))
        ep["template_feature"] = (
            tem_feats_t[-1][None].repeat(B, 1, 1, 1, 1)
        )  # (B, N, C, 16, 16) un-normalized; forward_test normalizes
        ref_outputs = ref_net.forward_test(ep, hyp=HYP)

    # ---- our side: ported weights, banked features, folded hypotheses
    from picopose_tpu.eval.pipeline import TemplateBank, run_batch
    from picopose_tpu.models import PicoPose
    from picopose_tpu.utils.torch_port import port_picopose

    model = PicoPose(
        vit_type="dinov2_vits14",
        blocks_to_take=(1, 3, 5, 7),
        compute_dtype=jnp.float32,
    )
    variables = {
        k: v
        for k, v in port_picopose(ref_net.state_dict(), depth=12).items()
    }

    feats = jax.jit(
        lambda v, x: model.apply(v, x, method=model.features)
    )(variables, jnp.asarray(tem["rgb"]))
    bank = TemplateBank(
        feats=tuple(feats),
        mask=jnp.asarray(tem["mask"]),
        pts3d=jnp.asarray(tem["pts3d"]),
        pose=jnp.asarray(tem["pose"]),
        K=jnp.asarray(tem["K"]),
        M=jnp.asarray(tem["M"]),
        dpt=None,
    )
    batch = {
        "real_rgb": jnp.asarray(real["rgb"]),
        "real_mask": jnp.asarray(real["mask"]),
        "real_M": jnp.asarray(real["M"]),
        "real_K": jnp.asarray(real["K"]),
        "real_pts2d": jnp.asarray(real["pts2d"]),
    }
    ours = run_batch(
        model, variables, batch, bank, jax.random.PRNGKey(3),
        hyp=HYP, pnp_iters=60,
    )
    return ref_net, ep, ref_outputs, model, variables, batch, bank, ours, HYP


class TestEndToEndChain:
    def test_template_selection_matches(self, both_runs, scene):
        """Top-k template ids through the REAL matching path must agree."""
        ref_net, ep, _, model, variables, batch, bank, _, HYP = both_runs
        import torch.nn.functional as F

        from model.picopose import matching_templates  # reference import

        from picopose_tpu.ops.matching import match_templates

        with torch.no_grad():
            fr = ref_net.feature_extractor(ep["real_rgb"])
            ft = F.normalize(ep["template_feature"], dim=2)
            scores_t, ids_t = matching_templates(
                ft, fr[-1], ep["tem_mask"], ep["real_mask"], topk=HYP
            )
        feats_real = model.apply(
            variables, batch["real_rgb"], method=model.features
        )
        scores_j, ids_j = match_templates(
            bank.feats[-1], feats_real[-1], batch["real_mask"],
            topk=HYP, impl="xla",
        )
        np.testing.assert_array_equal(np.asarray(ids_j), ids_t.numpy())
        np.testing.assert_allclose(
            np.asarray(scores_j), scores_t.numpy(), atol=1e-4
        )

    def test_stage2_fallback_poses_match(self, both_runs):
        """pose_recovery_2d_prediction through the real per-hypothesis
        gathers: reference outputs[k]['pred_poses'] vs our poses_2d."""
        _, _, ref_outputs, model, variables, batch, bank, ours, HYP = both_runs
        # our poses_2d: re-walk the pipeline's stage-2 head deterministically
        from picopose_tpu.eval.pipeline import _take
        from picopose_tpu.geom.affine import affine_from_prediction
        from picopose_tpu.geom.pose2d import pose_from_affine_2d
        from picopose_tpu.ops.matching import match_templates

        B = batch["real_rgb"].shape[0]
        feats_real = model.apply(
            variables, batch["real_rgb"], method=model.features
        )
        _, ids = match_templates(
            bank.feats[-1], feats_real[-1], batch["real_mask"],
            topk=HYP, impl="xla",
        )
        tem_last = _take(bank.feats[-1], ids)
        # instance-major hypothesis streams ([b0,b0,b1,b1,...]), matching
        # _take's gather layout (equivalent to jnp.repeat(x, HYP, axis=0))
        tile = lambda x: jnp.tile(
            x[:, None], (1, HYP) + (1,) * (x.ndim - 1)
        ).reshape(B * HYP, *x.shape[1:])
        translation, scale, inplane = model.apply(
            variables, tem_last, tile(feats_real[-1]), _take(bank.mask, ids),
            method=model.stage2,
        )
        pred_Ms = affine_from_prediction(
            scale, inplane, translation, _take(bank.pose, ids),
            _take(bank.K, ids), _take(bank.M, ids),
        )
        poses_2d = pose_from_affine_2d(
            tile(batch["real_M"]), tile(batch["real_K"]), pred_Ms,
            _take(bank.K, ids), _take(bank.M, ids), _take(bank.pose, ids),
        )
        poses_2d = np.asarray(poses_2d).reshape(B, HYP, 4, 4)
        for k in range(HYP):
            ref_p = ref_outputs[k]["pred_poses"].numpy()  # (B, 4, 4)
            np.testing.assert_allclose(
                poses_2d[:, k], ref_p, atol=2e-3,
                err_msg=f"stage-2 recovered pose mismatch at hypothesis {k}",
            )

    def test_final_correspondence_sets_match(self, both_runs):
        """Reference nonzero-scatter correspondences == our top-k static
        sets, per (batch, hypothesis)."""
        _, _, ref_outputs, model, variables, batch, bank, ours, HYP = both_runs
        from picopose_tpu.eval.pipeline import _take
        from picopose_tpu.geom.affine import affine_from_prediction
        from picopose_tpu.models.correspondence import (
            final_correspondences, init_correspondences,
        )
        from picopose_tpu.ops.matching import match_templates

        B = batch["real_rgb"].shape[0]
        feats_real = model.apply(
            variables, batch["real_rgb"], method=model.features
        )
        _, ids = match_templates(
            bank.feats[-1], feats_real[-1], batch["real_mask"],
            topk=HYP, impl="xla",
        )
        tile = lambda x: jnp.tile(
            x[:, None], (1, HYP) + (1,) * (x.ndim - 1)
        ).reshape(B * HYP, *x.shape[1:])
        tem_last = _take(bank.feats[-1], ids)
        tem_mask = _take(bank.mask, ids)
        translation, scale, inplane = model.apply(
            variables, tem_last, tile(feats_real[-1]), tem_mask,
            method=model.stage2,
        )
        pred_Ms = affine_from_prediction(
            scale, inplane, translation, _take(bank.pose, ids),
            _take(bank.K, ids), _take(bank.M, ids),
        )
        init_flow, init_cert = init_correspondences(
            pred_Ms, tem_mask, grid=16
        )
        tem_pyr = model.apply(
            variables, [_take(f, ids) for f in bank.feats], method=model.dpt
        )
        real_pyr = model.apply(variables, list(feats_real), method=model.dpt)
        flows, certs = model.apply(
            variables, tem_pyr, real_pyr, init_flow, init_cert,
            method=model.flow,
        )
        tar_pts, valid = final_correspondences(flows[-1], certs[-1])
        tar_pts, valid = np.asarray(tar_pts), np.asarray(valid)

        for k in range(HYP):
            # reference: (B, 4096, 2) int lists, -1 rows invalid
            src_t = ref_outputs[k]["pred_src_pts"].numpy()
            tar_t = ref_outputs[k]["pred_tar_pts"].numpy()
            for b in range(B):
                bh = b * HYP + k
                ref_set = {
                    (int(sx), int(sy), int(tx), int(ty))
                    for (sx, sy), (tx, ty) in zip(src_t[b], tar_t[b])
                    if sx >= 0
                }
                G = 64
                ours_set = set()
                for i in range(tar_pts.shape[1]):
                    if valid[bh, i]:
                        sy, sx = divmod(i, G)
                        tx, ty = tar_pts[bh, i]
                        ours_set.add((sx, sy, int(tx), int(ty)))
                missing = ref_set - ours_set
                extra = ours_set - ref_set
                # boundary certainty ~0.5 can flip under fp reordering;
                # demand near-identical sets, not bit-identical
                denom = max(1, len(ref_set))
                assert len(missing) + len(extra) <= max(2, denom // 200), (
                    f"correspondence sets diverge at (b={b}, k={k}): "
                    f"{len(missing)} missing, {len(extra)} extra of {denom}"
                )

    def test_pnp_tail_on_clean_correspondences(self, both_runs, scene):
        """The stochastic tail: reference cv2 RANSAC-PnP vs our on-device
        ransac_pnp on the SAME clean correspondences from the synthetic
        world — both must recover the ground-truth query pose."""
        tem, real, N, B = scene
        from utils.pose_recovery import pose_recovery_ransac_pnp  # reference

        from picopose_tpu.ops.pnp import ransac_pnp

        v = 0  # use template view 0's geometry as the 3D source
        pose_v = tem["pose"][v]
        pts3d_cam = tem["pts3d"][v].reshape(-1, 3)  # (4096, 3) camera frame
        valid = pts3d_cam[:, 2] > 1e-6
        # model frame (pose_recovery.py:84)
        Rv, tv = pose_v[:3, :3], pose_v[:3, 3]
        pts_model = (pts3d_cam - tv) @ Rv

        for b in range(B):
            pose_q = real["pose"][b]
            Kq = real["K"][b]
            cam_q = pts_model @ pose_q[:3, :3].T + pose_q[:3, 3]
            uv = cam_q @ Kq.T
            uv = uv[:, :2] / uv[:, 2:]

            # ---- reference path: build its (2, H, W)/(3, H, W) gather maps
            G = 64
            tar2d = np.zeros((2, G, G), np.float32)
            src3d = np.moveaxis(
                tem["pts3d"][v], -1, 0
            ).astype(np.float32)  # (3, G, G)
            pts_ids = []
            uv_grid = uv.reshape(G, G, 2)
            for i in range(0, G * G, 3):  # subsample: plenty for PnP
                if not valid[i]:
                    continue
                y, x = divmod(i, G)
                tar2d[:, y, x] = uv_grid[y, x]
                pts_ids.append((x, y))
            pts_arr = torch.from_numpy(np.array(pts_ids, np.float32))
            rot, tvec, ratio, success = pose_recovery_ransac_pnp(
                torch.from_numpy(tar2d),
                torch.from_numpy(src3d),
                torch.from_numpy(Kq),
                torch.from_numpy(pose_v),
                pts_arr.flip(-1),  # reference gathers [y, x] index order
                pts_arr.flip(-1),
            )
            assert success and ratio > 0.8
            np.testing.assert_allclose(rot, pose_q[:3, :3], atol=5e-3)
            np.testing.assert_allclose(
                tvec.reshape(3), pose_q[:3, 3], atol=5e-3
            )

            # ---- our path: same correspondences, batched static shapes
            sel = np.array([y * G + x for (x, y) in pts_ids])
            p3 = jnp.asarray(pts_model[sel])[None]
            p2 = jnp.asarray(uv[sel])[None]
            out = ransac_pnp(
                p3, p2, jnp.asarray(Kq)[None],
                jnp.ones((1, len(sel)), bool), jax.random.PRNGKey(5),
                iters=60,
            )
            assert bool(out.success[0])
            assert float(out.inlier_ratio[0]) > 0.8
            np.testing.assert_allclose(
                np.asarray(out.R[0]), pose_q[:3, :3], atol=5e-3
            )
            np.testing.assert_allclose(
                np.asarray(out.t[0]), pose_q[:3, 3], atol=5e-3
            )

    def test_pipeline_end_to_end_ranking_consistent(self, both_runs):
        """Our jitted pipeline's outputs are structurally consistent with
        the reference eval loop's contract: hypotheses ranked best-first by
        inlier ratio, fallback poses valid rotations."""
        *_, ours, HYP = both_runs
        ratio = np.asarray(ours.inlier_ratio)
        assert ratio.shape[1] == HYP
        assert (np.diff(ratio, axis=1) <= 1e-6).all()
        R = np.asarray(ours.R)
        eye = np.eye(3)
        for b in range(R.shape[0]):
            for k in range(HYP):
                np.testing.assert_allclose(
                    R[b, k] @ R[b, k].T, eye, atol=1e-3
                )
