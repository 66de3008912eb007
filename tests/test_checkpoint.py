"""Checkpoint persistence: orbax round-trip + torch .ckpt auto-port path."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from picopose_tpu.utils import checkpoint as ckpt

pytestmark = pytest.mark.compileheavy


class TestOrbaxRoundTrip:
    def test_save_restore_train_state(self, tmp_path, rng):
        from picopose_tpu.models import AffineRegressor
        from picopose_tpu.train.step import TrainState, make_optimizer

        m = AffineRegressor()
        sim = jnp.asarray(rng.normal(size=(1, 16, 16, 256)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), sim)["params"]
        tx = make_optimizer(max_iters=10)
        state = TrainState(
            jnp.asarray(3, jnp.int32), params, {}, tx.init(params)
        )

        mgr = ckpt.manager(str(tmp_path))
        ckpt.save(mgr, 3, state)
        mgr.wait_until_finished()
        assert mgr.latest_step() == 3

        zeros = jax.tree.map(jnp.zeros_like, state)
        restored = ckpt.restore(mgr, None, zeros)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_restore_into_fsdp_sharded_template(self, tmp_path, rng):
        """A checkpoint written replicated (ddp) restores into an
        fsdp-sharded template: values identical, restored leaves carry the
        template's distributed layout — so `resume` works across
        trainer.parallel mode changes (docs/SCALING.md)."""
        from picopose_tpu.models import AffineRegressor
        from picopose_tpu.parallel.mesh import make_mesh
        from picopose_tpu.parallel.shardings import shard_state
        from picopose_tpu.train.step import TrainState, make_optimizer

        m = AffineRegressor()
        sim = jnp.asarray(rng.normal(size=(1, 16, 16, 256)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), sim)["params"]
        tx = make_optimizer(max_iters=10)
        state = TrainState(jnp.asarray(3, jnp.int32), params, {}, tx.init(params))

        mgr = ckpt.manager(str(tmp_path))
        ckpt.save(mgr, 3, state)
        mgr.wait_until_finished()

        mesh = make_mesh(n_data=8)
        template = shard_state(
            jax.tree.map(jnp.zeros_like, state), mesh, "fsdp"
        )
        restored = ckpt.restore(mgr, None, template)
        big = max(jax.tree.leaves(restored.params), key=lambda l: l.size)
        assert big.addressable_shards[0].data.size < big.size
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_keep_all_like_reference(self, tmp_path, rng):
        """save_top_k=-1 equivalent: every step retained (run_train.py:101)."""
        from picopose_tpu.train.step import TrainState

        state = TrainState(jnp.asarray(0), {"w": jnp.ones(3)}, {}, {})
        mgr = ckpt.manager(str(tmp_path))
        for s in (1, 2, 3):
            ckpt.save(mgr, s, state._replace(step=jnp.asarray(s)))
        mgr.wait_until_finished()
        assert sorted(mgr.all_steps()) == [1, 2, 3]


class TestTorchAutoPort:
    def test_load_any_with_torch_ckpt(self, tmp_path):
        """A Lightning-style .ckpt with network.* keys ports through
        load_any (smoke: tiny depth-1 trunk + heads would need full state;
        here we check the dispatch + dinov2 subtree)."""
        from tests.test_torch_port import TDino
        from picopose_tpu.utils.torch_port import port_dinov2, to_numpy_state_dict

        tm = TDino(dim=32, depth=2, heads=2)
        sd = to_numpy_state_dict(tm.state_dict())
        tree = port_dinov2(sd, depth=2)
        assert "blocks_0" in tree["dinov2"] and "blocks_1" in tree["dinov2"]
        assert tree["dinov2"]["patch_embed"]["kernel"].shape == (14, 14, 3, 32)
