"""Training-side tests: losses, augmentation, one sharded optimizer step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from picopose_tpu.geom.affine import make_affine, relative_affine
from picopose_tpu.geom.rotation import cos_sin, rotation_2d
from picopose_tpu.train.augment import perturb_affine
from picopose_tpu.train.losses import (
    flow_level_loss,
    info_nce_loss,
    stage2_loss,
    total_loss,
)


class TestLosses:
    def test_info_nce_prefers_matched_features(self, rng):
        B, h, C, G = 2, 16, 32, 64
        feat = jnp.asarray(rng.normal(size=(B, h, h, C)).astype(np.float32))
        # identity correspondences on the 64-grid (scaled to patch units)
        cs = np.arange(G) + 0.5
        xx, yy = np.meshgrid(cs, cs)
        pts = jnp.asarray(
            np.broadcast_to(np.stack([xx, yy], -1), (B, G, G, 2)).astype(np.float32)
        )
        valid = jnp.ones((B, G, G), bool)
        matched = float(info_nce_loss(feat, feat, pts, pts, valid))
        shuffled = float(
            info_nce_loss(
                feat,
                jnp.asarray(rng.normal(size=(B, h, h, C)).astype(np.float32)),
                pts, pts, valid,
            )
        )
        assert matched < shuffled

    def test_info_nce_all_invalid_is_finite(self, rng):
        B, h, C, G = 1, 16, 8, 64
        feat = jnp.asarray(rng.normal(size=(B, h, h, C)).astype(np.float32))
        pts = jnp.zeros((B, G, G, 2))
        valid = jnp.zeros((B, G, G), bool)
        assert np.isfinite(float(info_nce_loss(feat, feat, pts, pts, valid)))

    def test_stage2_loss_zero_at_gt(self):
        gt_t = jnp.array([[3.0, -2.0]])
        gt_s = jnp.array([1.3])
        gt_a = jnp.array([0.7])
        l_t, l_s, l_i = stage2_loss(
            gt_t / 14.0, gt_s, cos_sin(gt_a), gt_t, gt_s, gt_a
        )
        assert float(l_t) < 1e-6 and float(l_s) < 1e-6 and float(l_i) < 2e-3

    def test_flow_level_loss_zero_flow_at_gt(self, rng):
        B, H, G = 1, 16, 64
        # gt targets = identity grid -> gt flow 0
        cs = np.arange(G) + 0.5
        xx, yy = np.meshgrid(cs, cs)
        tar = jnp.asarray(
            np.broadcast_to(np.stack([xx, yy], -1), (B, G, G, 2)).astype(np.float32)
        ) - 0.5
        valid = jnp.ones((B, G, G), bool)
        flow = jnp.zeros((B, H, H, 2))
        cert = jnp.full((B, H, H, 1), 20.0)  # confident logits
        l_flow, l_cert = flow_level_loss(flow, cert, tar, valid)
        assert float(l_flow) < 1e-5
        assert float(l_cert) < 1e-4

    def test_total_loss_clamp(self):
        assert float(total_loss({"a": jnp.asarray(1e6)})) == 100.0


class TestAugment:
    def test_perturbation_statistics(self, rng):
        B = 512
        theta = rng.uniform(-np.pi, np.pi, B).astype(np.float32)
        R = rotation_2d(cos_sin(jnp.asarray(theta)))
        M = make_affine(
            rotation=R,
            scale=jnp.asarray(rng.uniform(0.5, 2, B).astype(np.float32)),
            translation=jnp.asarray(rng.normal(0, 20, (B, 2)).astype(np.float32)),
        )
        noisy = perturb_affine(jax.random.PRNGKey(0), M)
        # rotation angle preserved within the 45-deg clamp
        ang0 = np.arctan2(np.asarray(M)[:, 1, 0], np.asarray(M)[:, 0, 0])
        ang1 = np.arctan2(np.asarray(noisy)[:, 1, 0], np.asarray(noisy)[:, 0, 0])
        d = np.abs(np.angle(np.exp(1j * (ang1 - ang0))))
        assert d.max() <= np.deg2rad(45.0) + 1e-3
        # translation delta clamped at 56 px
        dt = np.abs(np.asarray(noisy)[:, :2, 2] - np.asarray(M)[:, :2, 2])
        assert dt.max() <= 56.0 + 1e-3


@pytest.mark.compileheavy
class TestTrainStep:
    def test_one_step_reduces_nothing_but_runs(self, rng):
        """One full sharded train step on the virtual 8-device mesh: loss is
        finite, params change, state.step increments.  This doubles as the
        multi-chip dry-run exercised in CI (same path as
        __graft_entry__.dryrun_multichip)."""
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


@pytest.mark.compileheavy
class TestTrainStepDeterminism:
    def test_same_seed_same_step_bitwise(self, rng):
        """Two train steps from independently-built identical states, same
        batch and PRNG key, must agree bitwise — the repeatability the
        reference gets from torch determinism flags, here from jax's
        functional PRNG (VERDICT round-1 item 10)."""
        from picopose_tpu.models import PicoPose
        from picopose_tpu.train.step import init_state, make_optimizer, train_step

        crop, gi = 112, 64
        model = PicoPose(
            vit_type="dinov2_vits14", blocks_to_take=(1, 3, 5, 7),
            compute_dtype=jnp.float32,
        )
        tx = make_optimizer(max_iters=100)
        B = 2
        eye4 = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
        pose_r = eye4.copy(); pose_r[:, 2, 3] = 0.6
        pose_t = eye4.copy(); pose_t[:, 2, 3] = 0.5
        K = np.broadcast_to(
            np.array([[280.0, 0, 56.0], [0, 280.0, 56.0], [0, 0, 1.0]],
                     np.float32), (B, 3, 3),
        ).copy()
        M = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
        batch = {
            "real_rgb": rng.normal(size=(B, crop, crop, 3)).astype(np.float32),
            "tem_rgb": rng.normal(size=(B, crop, crop, 3)).astype(np.float32),
            "real_mask": np.ones((B, crop, crop), np.float32),
            "tem_mask": np.ones((B, crop, crop), np.float32),
            "real_M": M, "tem_M": M.copy(),
            "real_K": K, "tem_K": K.copy(),
            "real_pose": pose_r, "tem_pose": pose_t,
            "real_full_depth": np.full((B, gi, gi), 0.6, np.float32),
            "tem_full_depth": np.full((B, gi, gi), 0.5, np.float32),
        }
        jb = {k: jnp.asarray(v) for k, v in batch.items()}

        results = []
        for _ in range(2):  # fresh state each time: train_step donates it
            state = init_state(
                model, tx, jax.random.PRNGKey(0), batch_size=1, crop=crop
            )
            new_state, losses = train_step(
                model, tx, state, jb, jax.random.PRNGKey(7)
            )
            leaves = jax.tree_util.tree_leaves(new_state.params)
            results.append((
                {k: np.asarray(v) for k, v in losses.items()},
                [np.asarray(l) for l in leaves[:8]],
            ))
        (l0, p0), (l1, p1) = results
        for k in l0:
            np.testing.assert_array_equal(l0[k], l1[k], err_msg=k)
        for a, b in zip(p0, p1):
            np.testing.assert_array_equal(a, b)


@pytest.mark.compileheavy
class TestGradAccum:
    def test_multisteps_accumulates_then_steps(self):
        """make_optimizer(grad_accum=k): params move only every k-th call,
        by one AdamW step on the MEAN of the k micro-gradients (the
        effective-batch equivalence grad accumulation exists for)."""
        import jax.numpy as jnp

        from picopose_tpu.train.step import make_optimizer

        params = {"w": jnp.ones((4,), jnp.float32)}
        g1 = {"w": jnp.asarray([1.0, -2.0, 0.5, 3.0], jnp.float32)}
        g2 = {"w": jnp.asarray([0.0, 4.0, -1.5, 1.0], jnp.float32)}

        acc = make_optimizer(max_iters=100, grad_accum=2)
        s = acc.init(params)
        up1, s = acc.update(g1, s, params)
        assert np.all(np.asarray(up1["w"]) == 0.0), "stepped mid-accumulation"
        up2, s = acc.update(g2, s, params)

        ref = make_optimizer(max_iters=100)
        rs = ref.init(params)
        mean_g = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
        ref_up, _ = ref.update(mean_g, rs, params)
        np.testing.assert_allclose(
            np.asarray(up2["w"]), np.asarray(ref_up["w"]), rtol=1e-6
        )


class TestSchedulesAndOptimizers:
    def test_warmup_cosine_values(self):
        from picopose_tpu.train.step import warmup_cosine_schedule

        s = warmup_cosine_schedule(1.0, max_iters=1000, warmup_iters=100,
                                   warmup_factor=0.001)
        # reference formula: wf(i) * 0.5 * (1 + cos(pi i / max))
        assert abs(float(s(0)) - 0.001) < 1e-6
        assert abs(float(s(100)) - 0.5 * (1 + np.cos(np.pi * 0.1))) < 1e-5
        assert float(s(1000)) < 1e-6

    def test_poly_and_step(self):
        from picopose_tpu.train.step import poly_schedule, step_schedule

        p = poly_schedule(1.0, 100)
        assert float(p(0)) == 1.0 and float(p(100)) == 0.0
        st = step_schedule(1.0, 10, gamma=0.1)
        assert abs(float(st(25)) - 0.01) < 1e-9

    @pytest.mark.parametrize("opt", ["AdamW", "Adam", "SGD"])
    def test_optimizer_types(self, opt):
        from picopose_tpu.train.step import make_optimizer

        tx = make_optimizer(opt_type=opt, max_iters=10)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        upd, _ = tx.update({"w": jnp.ones(3)}, state, params)
        assert jax.tree.leaves(upd)[0].shape == (3,)


@pytest.mark.compileheavy
class TestWarmStart:
    """trainer.init_checkpoint: pretrained-weight warm starts
    (the reference's stage1 pretrained=True / fine-tune-from-.ckpt)."""

    def _state(self, seed):
        from picopose_tpu.models import PicoPose
        from picopose_tpu.train.step import init_state, make_optimizer

        model = PicoPose(
            vit_type="dinov2_vits14", blocks_to_take=(1, 3, 5, 7),
            compute_dtype=jnp.float32,
        )
        tx = make_optimizer(max_iters=100)
        return init_state(
            model, tx, jax.random.PRNGKey(seed), batch_size=1, crop=112
        )

    @staticmethod
    def _leaves_equal(a, b):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        return all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(la, lb))

    def test_backbone_only_from_hub_pth(self, tmp_path):
        import torch

        from picopose_tpu.train.loop import warm_start
        from picopose_tpu.utils.torch_export import export_dinov2

        a, b = self._state(0), self._state(1)
        sd = export_dinov2(a.params["feature_extractor"])
        path = tmp_path / "dinov2.pth"
        torch.save(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path
        )
        out = warm_start(b, str(path))
        # ViT leaves come from a; every non-backbone leaf stays b's
        assert self._leaves_equal(
            out.params["feature_extractor"], a.params["feature_extractor"]
        )
        assert self._leaves_equal(
            out.params["affine_regressor"], b.params["affine_regressor"]
        )
        assert int(out.step) == 0

    def test_full_checkpoint_from_orbax_dir(self, tmp_path):
        from picopose_tpu.train.loop import warm_start
        from picopose_tpu.utils import checkpoint as ckpt

        a, b = self._state(0), self._state(1)
        mgr = ckpt.manager(str(tmp_path))
        ckpt.save(mgr, 3, a)
        mgr.wait_until_finished()
        out = warm_start(b, str(tmp_path / "checkpoints" / "3"))
        assert self._leaves_equal(out.params, a.params)
        assert not self._leaves_equal(b.params, a.params)  # sanity
        assert int(out.step) == 0  # fresh run, not a resume

    def test_shape_mismatch_raises(self, tmp_path):
        import torch

        from picopose_tpu.train.loop import warm_start
        from picopose_tpu.utils.torch_export import export_dinov2

        a, b = self._state(0), self._state(1)
        sd = export_dinov2(a.params["feature_extractor"])
        sd["cls_token"] = np.asarray(sd["cls_token"])[..., :8]  # wrong width
        path = tmp_path / "bad.pth"
        torch.save(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path
        )
        with pytest.raises(ValueError, match="shape mismatch"):
            warm_start(b, str(path))
