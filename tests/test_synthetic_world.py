"""Regression tests for tools/synthetic_world.py unit/layout conventions.

The generated world must satisfy the REAL loaders' disk contracts
end-to-end (data/megapose.py, data/bop.py).  Two bugs these tests pin
down (both shipped once and silently broke the train-to-AR closed loop):

* real-branch gt/depth written x10 (GSO template convention wrongly
  applied to the real branch, which the loader only divides by 1000) —
  gt_scale came out 10x off and the keypoint reprojection chain was
  inconsistent;
* GSO training template bank rendered at icosphere level 0 (42 views)
  while the training loader's nearest-view table is the fixed level-1
  icosphere (162 views) — 77% of template picks hit missing files.
"""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tools.synthetic_world import build

    root = str(tmp_path_factory.mktemp("world"))
    build(root, n_train=8, n_test=2, size=60.0, level=0, seed=0)
    return root


@pytest.mark.slow
class TestSyntheticWorldContracts:
    def test_training_loader_units_and_bank(self, world):
        import jax.numpy as jnp

        from picopose_tpu.data.megapose import (
            MegaPoseTrainingDataset, collate,
        )
        from picopose_tpu.train.step import gt_translation_scale_inplane

        ds = MegaPoseTrainingDataset(
            os.path.join(world, "mp"), augment_real=False, seed=0
        )
        ds.reset()

        # every nearest-view pick must resolve against the bank: the
        # loader's view table is the 162-view level-1 icosphere, so the
        # generated GSO bank must be level 1 regardless of --level
        misses = [0, 0]
        orig = ds._process_template

        def counting(si, obj_id, view_id):
            out = orig(si, obj_id, view_id)
            misses[0 if out is None else 1] += 1
            return out

        ds._process_template = counting
        samples = [ds.get(i) for i in range(8)]
        assert all(s is not None for s in samples)
        assert misses[0] == 0, f"template view misses: {misses}"

        batch = {
            k: jnp.asarray(v) for k, v in collate(samples).items()
        }
        # real pose restored to meters must match the rendered geometry:
        # z sits a few object diameters out, far below 1 m for a 60 mm CAD
        real_z = np.asarray(batch["real_pose"][:, 2, 3])
        assert (real_z > 0.05).all() and (real_z < 1.5).all(), real_z

        # real depth (m) must agree with gt z where the object is visible
        depth = np.asarray(batch["real_full_depth"])
        for b in range(depth.shape[0]):
            nz = depth[b][depth[b] > 0]
            assert abs(np.median(nz) - real_z[b]) < 0.2 * real_z[b]

        # relative scale near 1 (similar apparent sizes after cropping) —
        # the x10 real-branch bug put it at ~0.09
        _, gt_s, _ = gt_translation_scale_inplane(
            batch["tem_K"], batch["real_K"],
            batch["tem_pose"], batch["real_pose"],
            batch["tem_M"], batch["real_M"],
        )
        log_s = np.log(np.asarray(gt_s))
        assert (np.abs(log_s) < 1.2).all(), np.asarray(gt_s)

    def test_keypoint_supervision_dense(self, world):
        import jax.numpy as jnp

        from picopose_tpu.data.megapose import (
            MegaPoseTrainingDataset, collate,
        )
        from picopose_tpu.train.keypoints import sample_keypoints

        ds = MegaPoseTrainingDataset(
            os.path.join(world, "mp"), augment_real=False, seed=0
        )
        ds.reset()
        batch = {
            k: jnp.asarray(v)
            for k, v in collate([ds.get(i) for i in range(4)]).items()
        }
        T = jnp.einsum(
            "bij,bjk->bik",
            batch["real_pose"], jnp.linalg.inv(batch["tem_pose"]),
        )
        kp = sample_keypoints(
            src_mask=batch["tem_mask"], src_M=batch["tem_M"],
            src_K=batch["tem_K"], src_depth=batch["tem_full_depth"],
            tar_mask=batch["real_mask"], tar_M=batch["real_M"],
            tar_K=batch["real_K"], T_src2tar=T,
            tar_depth=batch["real_full_depth"],
            crop=batch["tem_mask"].shape[1],
        )
        valid_per_sample = np.asarray(kp.valid).reshape(4, -1).sum(-1)
        # a consistent world gives hundreds of mutual correspondences;
        # the x10 bug left near zero
        assert (valid_per_sample > 100).all(), valid_per_sample

    def test_bop_tree_scoreable(self, world):
        """The BOP side must parse through the real test loader and carry
        consistent gt for the in-repo scorer."""
        from picopose_tpu.data.bop import BOPTestDataset

        ds = BOPTestDataset(
            os.path.join(world, "bop"), "fakeds",
            os.path.join(world, "dets", "fakeds.json"),
            n_template_view=42,
        )
        assert len(ds) == 2
        img = ds.load_image(0)
        assert len(img.instances) == 1
        inst = img.instances[0]
        assert inst.rgb.shape[:2] == (224, 224)
        assert inst.mask.sum() > 0


@pytest.fixture(scope="module")
def rich_world(tmp_path_factory):
    """Round-4 world: 3 objects (vertex-colored / UV-textured / symmetric
    cube), occlusion pairs, two test scenes."""
    from tools.synthetic_world import build

    root = str(tmp_path_factory.mktemp("world_r4"))
    build(root, n_train=4, n_test=4, size=60.0, level=0, seed=0,
          objects=["lshape", "tex", "cube"], pair_frac=1.0, n_scenes=2)
    return root


@pytest.mark.slow
class TestRichWorld:
    def test_textured_bank_carries_texture(self, rich_world):
        """Object 2's appearance exists ONLY via UV sampling — a uniform
        render would mean the texture path silently fell back."""
        import imageio.v2 as imageio

        v = imageio.imread(
            os.path.join(rich_world, "templates", "fakeds", "000002",
                         "000000.png")
        )
        fg = v[..., 3] > 0
        assert fg.sum() > 1000
        assert v[..., :3][fg].std(axis=0).mean() > 20.0

    def test_occlusion_pairs_visib_bookkeeping(self, rich_world):
        import json

        occluded = total = 0
        for scene in ("000001", "000002"):
            sdir = os.path.join(rich_world, "bop", "fakeds", "test", scene)
            with open(os.path.join(sdir, "scene_gt_info.json")) as f:
                info = json.load(f)
            for entries in info.values():
                assert len(entries) == 2  # pair_frac=1.0
                for gi in entries:
                    total += 1
                    assert 0.0 <= gi["visib_fract"] <= 1.0
                    assert gi["px_count_visib"] <= gi["px_count_all"]
                    if gi["visib_fract"] < 0.999:
                        occluded += 1
        assert occluded >= total // 4, (occluded, total)

    def test_models_info_declares_cube_symmetries(self, rich_world):
        import json

        with open(os.path.join(rich_world, "bop", "fakeds", "models",
                               "models_info.json")) as f:
            info = json.load(f)
        assert set(info) == {"1", "2", "3"}
        syms = info["3"].get("symmetries_discrete", [])
        assert len(syms) == 23
        for s in syms:
            M = np.asarray(s).reshape(4, 4)
            assert abs(np.linalg.det(M[:3, :3]) - 1.0) < 1e-9
        assert "symmetries_discrete" not in info["1"]

    def test_loaders_parse_pairs(self, rich_world):
        from picopose_tpu.data.bop import BOPTestDataset
        from picopose_tpu.data.megapose import MegaPoseTrainingDataset

        ds = BOPTestDataset(
            os.path.join(rich_world, "bop"), "fakeds",
            os.path.join(rich_world, "dets", "fakeds.json"),
            n_template_view=42,
        )
        n_inst = sum(len(ds.load_image(i).instances) for i in range(len(ds)))
        assert n_inst > len(ds)  # pairs survived detection filtering
        tds = MegaPoseTrainingDataset(
            os.path.join(rich_world, "mp"), augment_real=False, seed=0
        )
        tds.reset()
        assert all(tds.get(i) is not None for i in range(4))


class TestSymmetryScoring:
    def test_cube_symmetry_scores_perfect(self):
        from picopose_tpu.eval.bop_scoring import (
            Estimate, GTInstance, ObjectModel, score_bop19,
        )
        from tools.synthetic_world import cube_rotations

        rng = np.random.default_rng(0)
        pts = rng.uniform(-30, 30, (200, 3))
        syms = np.stack([np.eye(4)] + cube_rotations())
        R_gt = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(R_gt) < 0:
            R_gt[:, 0] *= -1
        t = np.array([0, 0, 240.0])
        R_est = R_gt @ cube_rotations()[7][:3, :3]
        Kk = {(1, 0): np.array(
            [[572.0, 0, 320], [0, 573.0, 240], [0, 0, 1.0]]
        )}
        gt = [GTInstance(1, 0, 3, R_gt, t)]
        est = [Estimate(1, 0, 3, 0.9, R_est, t)]
        with_syms = score_bop19(
            est, gt, {3: ObjectModel(pts=pts, diameter=60.0, syms=syms)}, Kk
        )
        without = score_bop19(
            est, gt, {3: ObjectModel(pts=pts, diameter=60.0)}, Kk
        )
        assert with_syms["AR_mssd_mspd"] == 1.0
        assert without["AR_mssd_mspd"] == 0.0

    def test_bootstrap_ci_brackets_point_estimate(self):
        from picopose_tpu.eval.bop_scoring import (
            MSPD_THRESHOLDS, MSSD_THRESHOLDS, bootstrap_ar,
        )

        rng = np.random.default_rng(1)
        recs = [
            {
                "mssd": rng.random(len(MSSD_THRESHOLDS)) < 0.7,
                "mspd": rng.random(len(MSPD_THRESHOLDS)) < 0.8,
                "vsd": None,
            }
            for _ in range(200)
        ]
        point = float(np.mean([r["mssd"].mean() for r in recs]))
        ci = bootstrap_ar(recs, n_boot=500, seed=0)
        lo, hi = ci["AR_MSSD"]
        assert lo <= point <= hi
        assert 0.0 < hi - lo < 0.2  # a 200-instance CI is tight-ish
