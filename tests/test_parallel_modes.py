"""FSDP / tensor-parallel training modes (parallel/shardings.py).

The reference trains DDP-only (config/base.yaml:5-7) and stubs FSDP
(vision_transformer.py:89 block_chunks=0).  Here the same jitted train step
runs under ddp / fsdp / fsdp_tp purely by re-annotating the state shardings;
these tests pin (a) the rule table itself and (b) numeric agreement of every
mode with the replicated step on the 8-device virtual mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from picopose_tpu.models import PicoPose
from picopose_tpu.parallel.mesh import make_mesh, shard_batch
from picopose_tpu.parallel.shardings import (
    leaf_spec,
    shard_state,
    state_shardings,
)
from picopose_tpu.train.step import init_state, make_optimizer, make_train_step

pytestmark = pytest.mark.compileheavy

SMALL = dict(vit_type="dinov2_vits14", blocks_to_take=(1, 3, 5, 7))


class TestLeafSpecRules:
    def test_tp_column_and_row(self):
        qkv = leaf_spec("dinov2/blocks_0/attn/qkv/kernel", (384, 1152), "tp", 1, 2)
        assert qkv == P(None, "model")
        qkv_b = leaf_spec("dinov2/blocks_0/attn/qkv/bias", (1152,), "tp", 1, 2)
        assert qkv_b == P("model")
        proj = leaf_spec("dinov2/blocks_0/attn/proj/kernel", (384, 384), "tp", 1, 2)
        assert proj == P("model")
        # row-parallel bias must stay replicated (added once, post-psum)
        proj_b = leaf_spec("dinov2/blocks_0/attn/proj/bias", (384,), "tp", 1, 2)
        assert proj_b == P()
        fc1 = leaf_spec("dinov2/blocks_0/mlp/fc1/kernel", (384, 1536), "tp", 1, 2)
        assert fc1 == P(None, "model")
        fc2 = leaf_spec("dinov2/blocks_0/mlp/fc2/kernel", (1536, 384), "tp", 1, 2)
        assert fc2 == P("model")
        # giant trunk: SwiGLU fused in-proj is column, out-proj is row
        w12 = leaf_spec("dinov2/blocks_0/mlp/w12/kernel", (1536, 8192), "tp", 1, 2)
        assert w12 == P(None, "model")
        w3 = leaf_spec("dinov2/blocks_0/mlp/w3/kernel", (4096, 1536), "tp", 1, 2)
        assert w3 == P("model")

    def test_fsdp_shards_largest_free_axis(self):
        # conv patch embed (14,14,3,384): only 384 divides 8
        pe = leaf_spec("dinov2/patch_embed/kernel", (14, 14, 3, 384), "fsdp", 8, 1)
        assert pe == P(None, None, None, "data")
        # dense kernel: largest divisible axis wins
        k = leaf_spec("x/kernel", (384, 1536), "fsdp", 8, 1)
        assert k == P(None, "data")

    def test_fsdp_keeps_small_and_indivisible_replicated(self):
        assert leaf_spec("x/bias", (384,), "fsdp", 8, 1) == P()  # < min size
        assert leaf_spec("x/kernel", (257, 257), "fsdp", 8, 1) == P()

    def test_fsdp_tp_composes(self):
        # qkv kernel (in, out): 'model' on out from TP, 'data' on in from FSDP
        s = leaf_spec("a/attn/qkv/kernel", (384, 1152), "fsdp_tp", 4, 2)
        assert s == P("data", "model")

    def test_ddp_replicates_and_bad_mode_raises(self):
        assert leaf_spec("a/attn/qkv/kernel", (384, 1152), "ddp", 8, 1) == P()
        with pytest.raises(ValueError):
            leaf_spec("x", (8,), "zero_infinity", 8, 1)

    def test_state_tree_covers_optimizer_moments(self):
        model = PicoPose(**SMALL, compute_dtype=jnp.float32)
        tx = make_optimizer(max_iters=10)
        state = jax.eval_shape(
            lambda: init_state(model, tx, jax.random.PRNGKey(0), 1, 112)
        )
        mesh = make_mesh(n_data=4, n_model=2)
        sh = state_shardings(mesh, state, "fsdp_tp")
        # a big ViT kernel and its AdamW moments get the same sharded spec
        def find(tree, pred):
            out = []
            jax.tree_util.tree_map_with_path(
                lambda p, x: out.append((jax.tree_util.keystr(p), x))
                if pred(jax.tree_util.keystr(p)) else None, tree)
            return out
        pk = find(sh.params, lambda s: "qkv" in s and "kernel" in s)
        mk = find(sh.opt_state, lambda s: "qkv" in s and "kernel" in s)
        assert pk and mk
        assert all(s.spec == P("data", "model") for _, s in pk)
        assert all(s.spec == P("data", "model") for _, s in mk)
        # the schedule count scalar stays replicated
        scalars = find(sh.opt_state, lambda s: "count" in s)
        assert all(s.spec == P() for _, s in scalars)


def tiny_batch(rng, B=8, crop=112, gi=64):
    eye4 = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    pose_r = eye4.copy(); pose_r[:, 2, 3] = 0.6
    pose_t = eye4.copy(); pose_t[:, 2, 3] = 0.5
    K = np.broadcast_to(
        np.array([[280.0, 0, 56.0], [0, 280.0, 56.0], [0, 0, 1.0]], np.float32),
        (B, 3, 3),
    ).copy()
    M = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
    return {
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


@pytest.mark.slow
class TestModesAgree:
    def test_fsdp_and_fsdp_tp_match_ddp(self, rng):
        """One train step under each mode from identical inits: losses and
        updated parameters must agree to fp32 reduction-order tolerance, and
        fsdp modes must actually shard the big leaves + AdamW moments."""
        assert len(jax.devices()) >= 8
        model = PicoPose(**SMALL, compute_dtype=jnp.float32)
        tx = make_optimizer(max_iters=100)
        jb = {k: jnp.asarray(v) for k, v in tiny_batch(rng).items()}

        results = {}
        for mode, n_data, n_model in (
            ("ddp", 8, 1), ("fsdp", 8, 1), ("fsdp_tp", 4, 2)
        ):
            mesh = make_mesh(n_data=n_data, n_model=n_model)
            state = init_state(
                model, tx, jax.random.PRNGKey(0), batch_size=1, crop=112
            )
            state = shard_state(state, mesh, mode)
            step_fn = make_train_step(
                model, tx, state_shardings(mesh, state, mode), mesh
            )
            with mesh:
                new_state, losses = step_fn(
                    state, shard_batch(jb, mesh), jax.random.PRNGKey(7)
                )
            if mode != "ddp":
                # the big leaves are genuinely distributed: local shard of a
                # sharded kernel is smaller than the global array
                leaf = max(
                    jax.tree_util.tree_leaves(new_state.params),
                    key=lambda l: l.size,
                )
                shard = leaf.addressable_shards[0].data
                assert shard.size < leaf.size, "fsdp leaf not sharded"
                mu_leaf = max(
                    jax.tree_util.tree_leaves(new_state.opt_state),
                    key=lambda l: getattr(l, "size", 0),
                )
                assert (
                    mu_leaf.addressable_shards[0].data.size < mu_leaf.size
                ), "optimizer moment not sharded"
            results[mode] = (
                {k: float(v) for k, v in losses.items()},
                [np.asarray(l) for l in
                 jax.tree_util.tree_leaves(new_state.params)[:8]],
            )

        l_ref, p_ref = results["ddp"]
        for mode in ("fsdp", "fsdp_tp"):
            l, p = results[mode]
            for k in l_ref:
                np.testing.assert_allclose(
                    l[k], l_ref[k], rtol=1e-4, atol=1e-5, err_msg=f"{mode}:{k}"
                )
            for a, b in zip(p, p_ref):
                np.testing.assert_allclose(
                    a, b, rtol=1e-4, atol=1e-6, err_msg=mode
                )
