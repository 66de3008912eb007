"""Reverse checkpoint export: flax variables -> reference torch state dict.

utils/torch_export.py must be the exact inverse of utils/torch_port.py so
a model trained here can be loaded back into the reference code
(run_test.py:240-245 load path).  Pinned three ways:

1. port->export identity on the REAL reference `Net`'s state dict — every
   exported key equals the original tensor bit-for-bit, no extra keys, and
   the missing set is exactly the reference's dead-at-runtime modules
   (DPT refinenet1/output convs, dpt.py:270; ViT mask_token/final norm).
2. the exported dict load_state_dict's into the reference Net.
3. file round-trip through save_torch_checkpoint (Lightning layout) ->
   load_torch_checkpoint -> port_picopose == the original variables.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from picopose_tpu.utils.torch_export import (  # noqa: E402
    export_picopose,
    save_torch_checkpoint,
)
from picopose_tpu.utils.torch_port import (  # noqa: E402
    load_torch_checkpoint,
    port_picopose,
)
from tests.test_reference_e2e import ref_net  # noqa: E402,F401 (fixture)

# every key the exporter legitimately does not emit: dead at reference
# runtime (never touched by forward_train/forward_test)
DEAD_KEY_PREFIXES = (
    "feature_extractor.dinov2.mask_token",
    "feature_extractor.dinov2.norm.",
    "offset_regressor.dpt_head.scratch.refinenet1.",
    "offset_regressor.dpt_head.scratch.output_conv",
    # refinenet4 is the single-input fusion block: torch constructs its
    # resConfUnit1 but never calls it (dpt.py forward passes one arg);
    # our model doesn't build it, so MODEL-INIT trees can't export it
    # (ported trees still carry and re-export it).
    "offset_regressor.dpt_head.scratch.refinenet4.resConfUnit1.",
)


class TestExportIsPortInverse:
    def test_reference_net_round_trip(self, ref_net):  # noqa: F811
        sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
        variables = port_picopose(sd, depth=12)
        back = export_picopose(variables)

        assert set(back) - set(sd) == set()
        mismatched = [
            k for k in back if not np.array_equal(back[k], sd[k])
        ]
        assert mismatched == []
        missing = set(sd) - set(back)
        not_dead = [
            k for k in missing if not k.startswith(DEAD_KEY_PREFIXES)
        ]
        assert not_dead == [], f"live reference keys missing from export: {not_dead}"

    def test_loads_into_reference_net(self, ref_net):  # noqa: F811
        sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
        variables = port_picopose(sd, depth=12)
        back = export_picopose(variables)
        result = ref_net.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in back.items()},
            strict=False,
        )
        assert result.unexpected_keys == []
        assert all(k.startswith(DEAD_KEY_PREFIXES) for k in result.missing_keys)


class TestModelInitExport:
    def test_flax_init_tree_exports_and_loads(self, ref_net):  # noqa: F811
        """A freshly initialized flax model (no porter involved) exports
        and loads into the reference Net — the train-on-TPU-then-export
        path (tools/export_torch.py)."""
        import jax
        import jax.numpy as jnp

        from picopose_tpu.models import PicoPose
        from picopose_tpu.utils.torch_export import export_picopose

        model = PicoPose(
            vit_type="dinov2_vits14",
            blocks_to_take=(1, 3, 5, 7),
            compute_dtype="float32",
        )
        imgs = jnp.zeros((1, 224, 224, 3), jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), imgs, jnp.ones((1, 224, 224)), True
        )
        sd = export_picopose(variables)
        result = ref_net.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            strict=False,
        )
        assert result.unexpected_keys == []
        assert all(k.startswith(DEAD_KEY_PREFIXES) for k in result.missing_keys)


class TestCheckpointFileRoundTrip:
    def test_lightning_ckpt_round_trip(self, ref_net, tmp_path):  # noqa: F811
        sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
        variables = port_picopose(sd, depth=12)

        path = str(tmp_path / "exported.ckpt")
        save_torch_checkpoint(variables, path, lightning=True)
        loaded = load_torch_checkpoint(path)
        assert "state_dict" in loaded
        assert all(k.startswith("network.") for k in loaded["state_dict"])

        variables2 = port_picopose(loaded, depth=12)

        import jax

        leaves1 = jax.tree_util.tree_leaves_with_path(variables)
        leaves2 = jax.tree_util.tree_leaves_with_path(variables2)
        assert len(leaves1) == len(leaves2)
        for (p1, v1), (p2, v2) in zip(leaves1, leaves2):
            assert p1 == p2
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
