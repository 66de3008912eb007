"""Parity against the ACTUAL reference code at /root/reference (VERDICT r1 #2).

Round-1 parity tests compared our modules to torch oracles re-written from
the reference's documented architecture — an oracle can share the port's
misreading.  These tests import the REAL reference modules (they are plain
torch/einops/cv2/scipy code, all installed here) and pin our outputs against
THEM, with shared random weights flowing through utils/torch_port.py where a
module has parameters.

The only reference dependency not installed is mmcv; `model/stage3/
raft_decoder.py` imports `ConvModule` from it, so a minimal faithful stub
(conv [bias=auto] -> act, norm_cfg must be None — exactly the configs
PicoPose instantiates, flow_decoder.py:29) is injected into sys.modules
before that import.  Everything else in these tests executes unmodified
reference source.

Reference code is treated as data under test-time import; nothing is copied
into the repo.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.compileheavy

jax.config.update("jax_default_matmul_precision", "highest")

REF = "/root/reference"


def _install_mmcv_stub():
    """Faithful-minimal mmcv.cnn.ConvModule for norm_cfg=None configs."""
    if "mmcv" in sys.modules:
        return
    import types

    class ConvModule(nn.Module):
        def __init__(
            self, in_channels, out_channels, kernel_size, stride=1, padding=0,
            conv_cfg=None, norm_cfg=None, act_cfg=dict(type="ReLU"), **kw,
        ):
            super().__init__()
            assert conv_cfg is None, "stub only supports default conv"
            assert norm_cfg is None, (
                "stub only supports norm_cfg=None (the only config PicoPose "
                "uses, flow_decoder.py:29); install mmcv for more"
            )
            # mmcv bias='auto': True when there is no norm layer
            self.conv = nn.Conv2d(
                in_channels, out_channels, kernel_size, stride, padding,
                bias=True,
            )
            acts = {"ReLU": nn.ReLU, "Sigmoid": nn.Sigmoid, "Tanh": nn.Tanh}
            self.activate = acts[act_cfg["type"]]() if act_cfg else None

        def forward(self, x):
            x = self.conv(x)
            return self.activate(x) if self.activate is not None else x

    mmcv = types.ModuleType("mmcv")
    mmcv_cnn = types.ModuleType("mmcv.cnn")
    mmcv_cnn.ConvModule = ConvModule
    mmcv.cnn = mmcv_cnn
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.cnn"] = mmcv_cnn


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules as namespace packages."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _install_mmcv_stub()
    import importlib

    mods = {}
    for name in (
        "utils.matching", "utils.torch_utils", "utils.corr_lookup",
        "utils.correspondence", "utils.loss_utils", "utils.keypoints",
        "utils.pose_recovery", "utils.augment",
        "model.stage2.affine_regressor", "model.stage3.dpt",
        "model.stage3.raft_decoder", "model.stage3.flow_decoder",
        "model.stage1.vision_transformer",
    ):
        mods[name] = importlib.import_module(name)
    return mods


def t2j_nchw(x: torch.Tensor) -> jnp.ndarray:
    """torch NCHW -> jax NHWC."""
    return jnp.asarray(np.moveaxis(x.detach().numpy(), 1, -1))


def j2n(x) -> np.ndarray:
    return np.asarray(x)


# --------------------------------------------------------------- stage 1 / 2
class TestMatching:
    def test_similarity_volume(self, ref, rng):
        m = ref["utils.matching"]
        B, C, S = 3, 32, 16
        src = torch.from_numpy(rng.normal(size=(B, C, S, S)).astype(np.float32))
        tar = torch.from_numpy(rng.normal(size=(B, C, S, S)).astype(np.float32))
        src_mask = torch.from_numpy(
            (rng.random((B, 224, 224)) > 0.4).astype(np.float32)
        )
        with torch.no_grad():
            vol_t = m.matching_features_similarity(
                src, tar, src_mask, src_mask.clone()
            )
        from picopose_tpu.ops.matching import feature_similarity_volume

        vol_j = feature_similarity_volume(
            t2j_nchw(src), t2j_nchw(tar), jnp.asarray(src_mask.numpy())
        )
        np.testing.assert_allclose(
            j2n(jnp.moveaxis(vol_j, -1, 1)), vol_t.numpy(), atol=1e-5
        )

    def test_matching_templates(self, ref, rng):
        m = ref["utils.matching"]
        B, N, C, S = 2, 9, 32, 16
        src = torch.from_numpy(rng.normal(size=(B, N, C, S, S)).astype(np.float32))
        tar = torch.from_numpy(rng.normal(size=(B, C, S, S)).astype(np.float32))
        tar_mask = torch.from_numpy(
            (rng.random((B, 224, 224)) > 0.4).astype(np.float32)
        )
        with torch.no_grad():
            score_t, id_t = m.matching_templates(src, tar, None, tar_mask, topk=4)

        from picopose_tpu.ops.matching import match_templates

        feats_j = jnp.asarray(np.moveaxis(src.numpy(), 2, -1))  # (B,N,S,S,C)
        score_j, id_j = match_templates(
            feats_j, t2j_nchw(tar), jnp.asarray(tar_mask.numpy()),
            topk=4, impl="xla",
        )
        np.testing.assert_allclose(j2n(score_j), score_t.numpy(), atol=1e-5)
        np.testing.assert_array_equal(j2n(id_j), id_t.numpy())


class TestAffineRegressor:
    def test_ported_forward(self, ref, rng):
        AR = ref["model.stage2.affine_regressor"].AffineRegressor

        class _Cfg:
            in_channel = 256  # config/base.yaml stage-2 settings
            hidden_dim = 256

        tm = AR(_Cfg()).eval()
        from picopose_tpu.models import AffineRegressor as JAR
        from picopose_tpu.utils.torch_port import (
            _port_affine_regressor, to_numpy_state_dict,
        )

        sd = {f"x.{k}": v for k, v in to_numpy_state_dict(tm.state_dict()).items()}
        params = _port_affine_regressor(sd, "x")
        x = rng.normal(size=(3, 256, 16, 16)).astype(np.float32)
        with torch.no_grad():
            t_tr, t_sc, t_inp = tm(torch.from_numpy(x))
        j_tr, j_sc, j_inp = JAR().apply(
            {"params": params}, jnp.asarray(np.moveaxis(x, 1, -1))
        )
        np.testing.assert_allclose(j2n(j_tr), t_tr.numpy(), atol=1e-4)
        np.testing.assert_allclose(
            j2n(j_sc), t_sc.numpy().reshape(j2n(j_sc).shape), atol=1e-4
        )
        np.testing.assert_allclose(j2n(j_inp), t_inp.numpy(), atol=1e-4)


# ------------------------------------------------------------------- stage 3
class TestCorrLookup:
    @pytest.mark.parametrize("num_levels,S", [(1, 16), (2, 32), (3, 64)])
    def test_pyramid_lookup(self, ref, rng, num_levels, S):
        CorrelationPyramid = ref["model.stage3.raft_decoder"].CorrelationPyramid
        CorrLookup = ref["utils.corr_lookup"].CorrLookup
        B, C = 2, 32
        f1 = torch.from_numpy(rng.normal(size=(B, C, S, S)).astype(np.float32))
        f2 = torch.from_numpy(rng.normal(size=(B, C, S, S)).astype(np.float32))
        flow = torch.from_numpy(
            (rng.normal(size=(B, 2, S, S)) * 3).astype(np.float32)
        )
        with torch.no_grad():
            pyr = CorrelationPyramid(num_levels=num_levels)(f1, f2)
            corr_t = CorrLookup(radius=2)(pyr, flow)

        from picopose_tpu.ops.corr import corr_lookup

        corr_j = corr_lookup(
            t2j_nchw(f1), t2j_nchw(f2), t2j_nchw(flow), radius=2,
            num_levels=num_levels,
        )
        np.testing.assert_allclose(
            j2n(jnp.moveaxis(corr_j, -1, 1)), corr_t.numpy(), atol=2e-4
        )


class TestFlowDecoder:
    def test_full_decoder_ported(self, ref, rng):
        """The REAL reference FlowDecoder (proj+BN, MotionEncoder, warp,
        XHeads, inter-level upsampling) vs ours with ported weights."""
        FlowDecoder = ref["model.stage3.flow_decoder"].FlowDecoder
        tm = FlowDecoder(num_levels=3, radius=4).eval()
        # randomize BN running stats so eval-mode normalization is non-trivial
        for mod in tm.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.copy_(
                    torch.rand_like(mod.running_var) * 0.5 + 0.75
                )

        from picopose_tpu.models import FlowDecoder as JFD
        from picopose_tpu.utils.torch_port import (
            _port_flow_decoder, to_numpy_state_dict,
        )

        sd = {f"x.{k}": v for k, v in to_numpy_state_dict(tm.state_dict()).items()}
        params, stats = _port_flow_decoder(sd, "x")

        B = 2
        tem = [
            torch.from_numpy(rng.normal(size=(B, 256, g, g)).astype(np.float32))
            for g in (16, 32, 64)
        ]
        real = [
            torch.from_numpy(rng.normal(size=(B, 256, g, g)).astype(np.float32))
            for g in (16, 32, 64)
        ]
        init_flow = torch.from_numpy(
            (rng.normal(size=(B, 2, 16, 16)) * 2).astype(np.float32)
        )
        init_cert = torch.from_numpy(rng.normal(size=(B, 1, 16, 16)).astype(np.float32))
        with torch.no_grad():
            flows_t, certs_t = tm(tem, real, init_flow, init_cert)

        jm = JFD(num_levels=3, radius=4)
        flows_j, certs_j = jm.apply(
            {"params": params, "batch_stats": stats},
            [t2j_nchw(x).astype(jnp.float32) for x in tem],
            [t2j_nchw(x).astype(jnp.float32) for x in real],
            t2j_nchw(init_flow), t2j_nchw(init_cert), False,
        )
        for ft, fj, ct, cj in zip(flows_t, flows_j, certs_t, certs_j):
            np.testing.assert_allclose(
                j2n(jnp.moveaxis(fj, -1, 1)), ft.numpy(), atol=5e-3
            )
            np.testing.assert_allclose(
                j2n(jnp.moveaxis(cj, -1, 1)), ct.numpy(), atol=5e-3
            )


class TestDPTHead:
    def test_ported_forward(self, ref, rng):
        DPTHead = ref["model.stage3.dpt"].DPTHead
        C = 64
        tm = DPTHead(
            1, C, features=256, use_bn=True,
            out_channels=[256, 512, 1024, 1024], use_clstoken=False,
        ).eval()
        for mod in tm.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.copy_(
                    torch.rand_like(mod.running_var) * 0.5 + 0.75
                )

        from picopose_tpu.models import DPTHead as JDPT
        from picopose_tpu.utils.torch_port import _port_dpt, to_numpy_state_dict

        sd = {f"x.{k}": v for k, v in to_numpy_state_dict(tm.state_dict()).items()}
        params, stats = _port_dpt(sd, "x")

        feats = [
            torch.from_numpy(rng.normal(size=(2, C, 16, 16)).astype(np.float32))
            for _ in range(4)
        ]
        with torch.no_grad():
            outs_t = tm(feats)
        outs_j = JDPT(in_channels=C).apply(
            {"params": params, "batch_stats": stats},
            [t2j_nchw(f).astype(jnp.float32) for f in feats], False,
        )
        assert len(outs_t) == len(outs_j) == 3
        for ot, oj in zip(outs_t, outs_j):
            np.testing.assert_allclose(
                j2n(jnp.moveaxis(oj, -1, 1)), ot.numpy(), atol=2e-3
            )


class TestVisionTransformer:
    def test_vit_small_ported(self, ref, rng):
        """The REAL vendored DinoVisionTransformer (naive-attention branch,
        xformers absent) with random weights vs our flax DinoViT, driving it
        exactly like the reference FeatureExtractor (feature_extractor.py:
        93-109): prepare_tokens_with_masks + per-block taps, cls stripped."""
        vt = ref["model.stage1.vision_transformer"]
        tm = vt.vit_small(
            patch_size=14, img_size=518, init_values=1.0, block_chunks=0,
        ).eval()
        # non-trivial weights (default init zeroes pos_embed etc.)
        with torch.no_grad():
            for p in tm.parameters():
                p.add_(torch.randn_like(p) * 0.02)

        from picopose_tpu.models import FeatureExtractor
        from picopose_tpu.utils.torch_port import port_dinov2, to_numpy_state_dict

        sd = to_numpy_state_dict(tm.state_dict())
        params = port_dinov2(sd, depth=12)

        taps = (1, 3, 5, 7)
        x = rng.normal(size=(2, 3, 224, 224)).astype(np.float32) * 0.5
        xt = torch.from_numpy(x)
        with torch.no_grad():
            h = tm.prepare_tokens_with_masks(xt)
            outs_t = []
            for i, blk in enumerate(tm.blocks):
                h = blk(h)
                if i in taps:
                    outs_t.append(
                        h[:, 1:].permute(0, 2, 1).reshape(2, 384, 16, 16)
                    )

        fe = FeatureExtractor("dinov2_vits14", taps, compute_dtype=jnp.float32)
        outs_j = fe.apply(
            {"params": params}, jnp.asarray(np.moveaxis(x, 1, -1))
        )
        for ot, oj in zip(outs_t, outs_j):
            np.testing.assert_allclose(
                j2n(jnp.moveaxis(oj, -1, 1)), ot.numpy(), atol=2e-4
            )


# ---------------------------------------------------------- geometry / utils
def _rand_pose(rng, z=0.6):
    from scipy.spatial.transform import Rotation

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_euler("xyz", rng.uniform(-1, 1, 3)).as_matrix()
    T[:3, 3] = [rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05), z]
    return T


def _rand_crop_M(rng):
    s = rng.uniform(0.5, 2.0)
    M = np.array(
        [[s, 0, rng.uniform(-50, 0)], [0, s, rng.uniform(-50, 0)], [0, 0, 1]],
        np.float32,
    )
    return M


def _K(f=572.4):
    return np.array([[f, 0, 320.0], [0, f + 1.2, 240.0], [0, 0, 1.0]], np.float32)


class TestTorchUtilsGeometry:
    def test_calc_pred_Ms(self, ref, rng):
        tu = ref["utils.torch_utils"]
        B = 4
        scale = rng.uniform(0.5, 2.0, B).astype(np.float32)
        ang = rng.uniform(0, 2 * np.pi, B).astype(np.float32)
        cs = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
        trans = rng.normal(size=(B, 2)).astype(np.float32)
        poses = np.stack([_rand_pose(rng) for _ in range(B)])
        Ks = np.stack([_K() for _ in range(B)])
        Ms = np.stack([_rand_crop_M(rng) for _ in range(B)])

        with torch.no_grad():
            Ms_t = tu.calc_pred_Ms(
                torch.from_numpy(scale),
                torch.from_numpy(cs),
                torch.from_numpy(trans),
                torch.from_numpy(poses),
                torch.from_numpy(Ks),
                torch.from_numpy(Ms),
            )

        from picopose_tpu.geom.affine import affine_from_prediction

        Ms_j = affine_from_prediction(
            jnp.asarray(scale), jnp.asarray(cs), jnp.asarray(trans),
            jnp.asarray(poses), jnp.asarray(Ks), jnp.asarray(Ms),
        )
        np.testing.assert_allclose(j2n(Ms_j), Ms_t.numpy(), atol=1e-3)

    def test_gt_trans_scale_inplane(self, ref, rng):
        """Pins the closed-form atan2 in-plane angle against the reference's
        scipy Rotation 'zxy' euler route (torch_utils.py:168-183)."""
        tu = ref["utils.torch_utils"]
        B = 6
        tem_pose = np.stack([_rand_pose(rng, z=rng.uniform(0.4, 0.8)) for _ in range(B)])
        real_pose = np.stack([_rand_pose(rng, z=rng.uniform(0.4, 0.8)) for _ in range(B)])
        Ks = np.stack([_K() for _ in range(B)])
        tem_M = np.stack([_rand_crop_M(rng) for _ in range(B)])
        real_M = np.stack([_rand_crop_M(rng) for _ in range(B)])
        end_points = {
            "tem_pose": torch.from_numpy(tem_pose),
            "real_pose": torch.from_numpy(real_pose),
            "tem_K": torch.from_numpy(Ks),
            "real_K": torch.from_numpy(Ks.copy()),
            "tem_M": torch.from_numpy(tem_M),
            "real_M": torch.from_numpy(real_M),
        }
        with torch.no_grad():
            tr_t, sc_t, inp_t = tu.calc_gt_trans_scale_inplane(end_points)

        from picopose_tpu.geom.affine import gt_translation_scale_inplane

        tr_j, sc_j, inp_j = gt_translation_scale_inplane(
            jnp.asarray(Ks), jnp.asarray(Ks), jnp.asarray(tem_pose),
            jnp.asarray(real_pose), jnp.asarray(tem_M), jnp.asarray(real_M),
        )
        np.testing.assert_allclose(j2n(tr_j), tr_t.numpy(), atol=1e-3)
        np.testing.assert_allclose(j2n(sc_j), sc_t.numpy(), rtol=1e-4)
        # angles compared on the circle
        dt = np.abs(np.mod(j2n(inp_j) - inp_t.numpy() + np.pi, 2 * np.pi) - np.pi)
        assert dt.max() < 1e-4, dt.max()

    def test_get_relative_M(self, ref, rng):
        tu = ref["utils.torch_utils"]
        B = 5
        tem_pose = np.stack([_rand_pose(rng, z=rng.uniform(0.4, 0.8)) for _ in range(B)])
        real_pose = np.stack([_rand_pose(rng, z=rng.uniform(0.4, 0.8)) for _ in range(B)])
        Ks = np.stack([_K() for _ in range(B)])
        tem_M = np.stack([_rand_crop_M(rng) for _ in range(B)])
        real_M = np.stack([_rand_crop_M(rng) for _ in range(B)])
        with torch.no_grad():
            M_t = tu.get_relative_M(
                torch.from_numpy(Ks), torch.from_numpy(Ks.copy()),
                torch.from_numpy(tem_pose), torch.from_numpy(real_pose),
                torch.from_numpy(tem_M), torch.from_numpy(real_M),
            )

        from picopose_tpu.geom.affine import relative_affine

        M_j = relative_affine(
            jnp.asarray(Ks), jnp.asarray(Ks), jnp.asarray(tem_pose),
            jnp.asarray(real_pose), jnp.asarray(tem_M), jnp.asarray(real_M),
        )
        np.testing.assert_allclose(j2n(M_j), M_t.numpy(), atol=1e-3)

    def test_pose_recovery_2d(self, ref, rng):
        pr = ref["utils.pose_recovery"]
        B = 4
        tem_pose = np.stack([_rand_pose(rng, z=rng.uniform(0.4, 0.8)) for _ in range(B)])
        Ks = np.stack([_K() for _ in range(B)])
        tem_M = np.stack([_rand_crop_M(rng) for _ in range(B)])
        real_M = np.stack([_rand_crop_M(rng) for _ in range(B)])
        # a plausible predicted affine: rot+scale+trans
        ang = rng.uniform(0, 2 * np.pi, B)
        s = rng.uniform(0.7, 1.4, B)
        pred = np.zeros((B, 3, 3), np.float32)
        pred[:, 0, 0] = s * np.cos(ang)
        pred[:, 0, 1] = -s * np.sin(ang)
        pred[:, 1, 0] = s * np.sin(ang)
        pred[:, 1, 1] = s * np.cos(ang)
        pred[:, 0, 2] = rng.uniform(-10, 10, B)
        pred[:, 1, 2] = rng.uniform(-10, 10, B)
        pred[:, 2, 2] = 1.0

        with torch.no_grad():
            pose_t = pr.pose_recovery_2d_prediction(
                torch.from_numpy(real_M), torch.from_numpy(Ks.copy()),
                torch.from_numpy(pred), torch.from_numpy(Ks),
                torch.from_numpy(tem_M), torch.from_numpy(tem_pose),
            )

        from picopose_tpu.geom.pose2d import pose_from_affine_2d

        pose_j = pose_from_affine_2d(
            jnp.asarray(real_M), jnp.asarray(Ks), jnp.asarray(pred),
            jnp.asarray(Ks), jnp.asarray(tem_M), jnp.asarray(tem_pose),
        )
        np.testing.assert_allclose(j2n(pose_j), pose_t.numpy(), atol=1e-3)


class TestCorrespondences:
    def test_init_correspondences(self, ref, rng):
        co = ref["utils.correspondence"]
        B = 3
        pred = np.stack([_rand_crop_M(rng) for _ in range(B)])
        mask = (rng.random((B, 224, 224)) > 0.3).astype(np.float32)
        with torch.no_grad():
            flow_t, cert_t = co.compute_init_correspondences(
                torch.from_numpy(pred), torch.from_numpy(mask)
            )

        from picopose_tpu.models.correspondence import init_correspondences

        flow_j, cert_j = init_correspondences(
            jnp.asarray(pred), jnp.asarray(mask), grid=16
        )
        np.testing.assert_allclose(
            j2n(jnp.moveaxis(flow_j, -1, 1)), flow_t.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            j2n(jnp.moveaxis(cert_j, -1, 1)), cert_t.numpy(), atol=1e-6
        )

    def test_final_correspondences(self, ref, rng):
        """compute_stage3_correspondences compacts valid (src, tar) integer
        pairs via torch.nonzero; ours returns a dense grid + validity.  Pin
        the SET of valid integer pairs equal."""
        co = ref["utils.correspondence"]
        B, H = 2, 16
        flow = (rng.normal(size=(B, 2, H, H)) * 4).astype(np.float32)
        cert = rng.normal(size=(B, 1, H, H)).astype(np.float32)
        with torch.no_grad():
            # NOTE return order is (tar_pts, src_pts) (correspondence.py:59)
            tar_t, src_t = co.compute_stage3_correspondences(
                torch.from_numpy(flow), torch.from_numpy(cert), threshold=0.5
            )

        from picopose_tpu.geom.grids import pixel_coords_grid
        from picopose_tpu.models.correspondence import final_correspondences

        tar_j, valid_j = final_correspondences(
            t2j_nchw(torch.from_numpy(flow)),
            t2j_nchw(torch.from_numpy(cert)),
        )
        grid = np.asarray(pixel_coords_grid(H, H)).reshape(-1, 2)
        for b in range(B):
            ref_pairs = {
                (int(s[0]), int(s[1]), int(t[0]), int(t[1]))
                for s, t in zip(src_t[b].numpy(), tar_t[b].numpy())
                if s[0] >= 0
            }
            v = j2n(valid_j[b])
            tj = np.floor(j2n(tar_j[b])).astype(int)
            our_pairs = {
                (int(grid[i][0]), int(grid[i][1]), int(tj[i][0]), int(tj[i][1]))
                for i in range(H * H)
                if v[i]
            }
            assert ref_pairs == our_pairs


class TestKeypointsAndLosses:
    def _keypoint_inputs(self, rng, B=2):
        crop = 224
        masks = (rng.random((B, crop, crop)) > 0.2).astype(np.float32)
        tar_masks = (rng.random((B, crop, crop)) > 0.2).astype(np.float32)
        depth = rng.uniform(0.4, 0.8, (B, 480, 640)).astype(np.float32)
        tar_depth = rng.uniform(0.4, 0.8, (B, 480, 640)).astype(np.float32)
        Ks = np.stack([_K() for _ in range(B)])
        Ms = np.stack([_rand_crop_M(rng) for _ in range(B)])
        tar_Ms = np.stack([_rand_crop_M(rng) for _ in range(B)])
        poses = np.stack([_rand_pose(rng, 0.6) for _ in range(B)])
        tar_poses = np.stack([_rand_pose(rng, 0.55) for _ in range(B)])
        return crop, masks, tar_masks, depth, tar_depth, Ks, Ms, tar_Ms, poses, tar_poses

    def test_keypoint_sampler(self, ref, rng):
        kp = ref["utils.keypoints"]
        (crop, masks, tar_masks, depth, tar_depth,
         Ks, Ms, tar_Ms, poses, tar_poses) = self._keypoint_inputs(rng)
        B = masks.shape[0]

        src_data = kp.KeypointInput(
            K=torch.from_numpy(Ks), full_depth=torch.from_numpy(depth),
            mask=torch.from_numpy(masks), M=torch.from_numpy(Ms),
        )
        tar_data = kp.KeypointInput(
            K=torch.from_numpy(Ks.copy()), full_depth=torch.from_numpy(tar_depth),
            mask=torch.from_numpy(tar_masks), M=torch.from_numpy(tar_Ms),
        )
        T = tar_poses @ np.linalg.inv(poses)
        Tinv = np.linalg.inv(T)
        sampler = kp.KeyPointSampler()
        with torch.no_grad():
            out = sampler.sample_pts(
                torch.from_numpy(T.astype(np.float32)),
                torch.from_numpy(Tinv.astype(np.float32)),
                src_data, tar_data,
            )

        from picopose_tpu.train.keypoints import sample_keypoints

        kd = sample_keypoints(
            jnp.asarray(masks), jnp.asarray(Ms), jnp.asarray(Ks),
            jnp.asarray(depth), jnp.asarray(tar_masks), jnp.asarray(tar_Ms),
            jnp.asarray(Ks), jnp.asarray(T.astype(np.float32)),
            tar_depth=jnp.asarray(tar_depth),
        )
        src_t = out["src_pts"].numpy()  # (B, 4096, 2), -1 invalid
        tar_t = out["tar_pts"].numpy()

        # the reference's grid list is TRANSPOSED relative to ours
        # (keypoints.py:110-111 stacks (yy, xx) then treats col 0 as x);
        # compare in its order
        def tolist(a, tail):
            return np.transpose(
                j2n(a).reshape(B, 64, 64, *tail), (0, 2, 1, 3)
            ).reshape(B, 64 * 64, *([tail[-1]] if tail else []))

        src_j = tolist(kd.src_pts, (2,))
        tar_j = tolist(kd.tar_pts, (2,))
        val_j = np.transpose(
            j2n(kd.valid).reshape(B, 64, 64), (0, 2, 1)
        ).reshape(B, -1)

        ref_valid = src_t[..., 0] != -1
        np.testing.assert_array_equal(val_j, ref_valid)
        np.testing.assert_allclose(src_j[val_j], src_t[ref_valid], atol=1e-4)
        np.testing.assert_allclose(tar_j[val_j], tar_t[ref_valid], atol=1e-3)

    def test_stage_one_loss(self, ref, rng):
        lu = ref["utils.loss_utils"]
        B, C, h = 2, 32, 16
        src_feat = rng.normal(size=(B, C, h, h)).astype(np.float32)
        tar_feat = rng.normal(size=(B, C, h, h)).astype(np.float32)
        # integer patch coords on the 64-grid scale (reference divides by 4)
        G = 64
        pts = rng.uniform(0, G - 1, (B, G * G, 2)).astype(np.float32)
        tar = rng.uniform(0, G - 1, (B, G * G, 2)).astype(np.float32)
        invalid = rng.random((B, G * G)) < 0.5
        pts[invalid] = -1
        tar[invalid] = -1
        with torch.no_grad():
            loss_t = lu.compute_stage_one_loss(
                torch.from_numpy(src_feat), torch.from_numpy(tar_feat),
                torch.from_numpy(pts), torch.from_numpy(tar),
            )

        from picopose_tpu.train.losses import info_nce_loss

        loss_j = info_nce_loss(
            jnp.asarray(np.moveaxis(src_feat, 1, -1)),
            jnp.asarray(np.moveaxis(tar_feat, 1, -1)),
            jnp.asarray(pts.reshape(B, G, G, 2)),
            jnp.asarray(tar.reshape(B, G, G, 2)),
            jnp.asarray(~invalid.reshape(B, G, G)),
        )
        np.testing.assert_allclose(float(loss_j), float(loss_t), atol=1e-4)

    def test_stage_three_loss(self, ref, rng):
        lu = ref["utils.loss_utils"]
        B, G = 2, 64
        tar = rng.uniform(0, G - 1, (B, G * G, 2)).astype(np.float32)
        invalid = rng.random((B, G * G)) < 0.4
        tar[invalid] = -1
        flows_t, certs_t = [], []
        flows_np, certs_np = [], []
        for Hl in (16, 32, 64):
            f = (rng.normal(size=(B, 2, Hl, Hl)) * 3).astype(np.float32)
            c = rng.normal(size=(B, 1, Hl, Hl)).astype(np.float32)
            flows_t.append(torch.from_numpy(f))
            certs_t.append(torch.from_numpy(c))
            flows_np.append(f)
            certs_np.append(c)
        end_points = {}
        with torch.no_grad():
            end_points = lu.compute_stage_three_loss(
                end_points, flows_t, certs_t, torch.from_numpy(tar)
            )

        from picopose_tpu.train.losses import flow_level_loss

        # the reference's 'b (h w) c -> b w h c' rearrange is its grid
        # convention round-trip; feed ours the matching (B, 64, 64, 2) layout
        tar_j = jnp.asarray(
            np.transpose(tar.reshape(B, G, G, 2), (0, 2, 1, 3))
        )
        val_j = jnp.asarray(
            ~np.transpose(invalid.reshape(B, G, G), (0, 2, 1))
        )
        for i in range(3):
            l_flow, l_cert = flow_level_loss(
                jnp.asarray(np.moveaxis(flows_np[i], 1, -1)),
                jnp.asarray(np.moveaxis(certs_np[i], 1, -1)),
                tar_j, val_j,
            )
            np.testing.assert_allclose(
                float(l_flow), float(end_points[f"loss_flow{i}"]), atol=1e-4
            )
            np.testing.assert_allclose(
                float(l_cert), float(end_points[f"loss_certainty{i}"]), atol=1e-4
            )
