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
