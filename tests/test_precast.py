"""precast_inference_params: bf16 weight storage must be BITWISE identical.

flax casts bf16-consumed params to bf16 inside the consuming op
(promote_dtype), so storing them pre-cast changes HBM bytes, not math.
These tests pin that claim on every inference stage that runs in bf16
(features / dpt / flow via stage3) and that f32-consumed params
(pos_embed, norm scale/bias, the whole affine regressor) are untouched.
"""

import numpy as np
import jax
import jax.numpy as jnp

from picopose_tpu.models import PicoPose
from picopose_tpu.models.dinov2 import VIT_CONFIGS, ViTConfig
from picopose_tpu.utils.precast import precast_inference_params


def _setup():
    VIT_CONFIGS["_test_precast"] = ViTConfig(embed_dim=64, depth=2, num_heads=4)
    model = PicoPose(
        vit_type="_test_precast",
        blocks_to_take=(0, 1, 0, 1),
        compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 112, 112, 3)).astype(np.float32))
    masks = jnp.ones((2, 112, 112), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, masks, True)
    return model, imgs, masks, variables


def _eq(a, b):
    assert a.dtype == b.dtype
    assert np.array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)
    ), "precast changed inference numerics"


class TestPrecast:
    def test_tree_selection(self):
        _, _, _, variables = _setup()
        cast = precast_inference_params(variables)
        p = cast["params"]
        vit = p["feature_extractor"]["dinov2"]
        blk = vit["blocks_0"]
        # bf16-consumed weights are stored bf16
        assert blk["attn"]["qkv"]["kernel"].dtype == jnp.bfloat16
        assert blk["mlp"]["fc1"]["bias"].dtype == jnp.bfloat16
        assert blk["ls1"]["gamma"].dtype == jnp.bfloat16
        assert vit["cls_token"].dtype == jnp.bfloat16
        assert vit["patch_embed"]["kernel"].dtype == jnp.bfloat16
        # f32-consumed params stay f32
        assert vit["pos_embed"].dtype == jnp.float32
        assert blk["norm1"]["scale"].dtype == jnp.float32
        assert blk["norm1"]["bias"].dtype == jnp.float32
        flat = jax.tree_util.tree_leaves(p["affine_regressor"])
        assert all(x.dtype != jnp.bfloat16 for x in flat)
        # batch_stats untouched (f32 math in flax _normalize)
        bs = jax.tree_util.tree_leaves(cast["batch_stats"])
        assert all(x.dtype == jnp.float32 for x in bs)
        # originals not mutated
        assert (
            variables["params"]["feature_extractor"]["dinov2"]["blocks_0"][
                "attn"
            ]["qkv"]["kernel"].dtype
            == jnp.float32
        )

    def test_bitwise_identical_inference(self):
        model, imgs, masks, variables = _setup()
        cast = precast_inference_params(variables)

        f_a = model.apply(variables, imgs, method=model.features)
        f_b = model.apply(cast, imgs, method=model.features)
        for a, b in zip(f_a, f_b):
            _eq(a, b)

        B, g = imgs.shape[0], f_a[-1].shape[1]
        init_flow = jnp.zeros((B, g, g, 2), jnp.float32)
        init_cert = jnp.zeros((B, g, g, 1), jnp.float32)
        fl_a, ce_a = model.apply(
            variables, list(f_a), list(f_a), init_flow, init_cert,
            method=model.stage3,
        )
        fl_b, ce_b = model.apply(
            cast, list(f_b), list(f_b), init_flow, init_cert,
            method=model.stage3,
        )
        for a, b in zip(fl_a + ce_a, fl_b + ce_b):
            _eq(a, b)

        # stage 2 runs f32 on f32 params — untouched by design
        tr_a, sc_a, in_a = model.apply(
            variables, f_a[-1], f_a[-1], masks[:, ::7, ::7],
            method=model.stage2,
        )
        tr_b, sc_b, in_b = model.apply(
            cast, f_b[-1], f_b[-1], masks[:, ::7, ::7], method=model.stage2
        )
        for a, b in zip((tr_a, sc_a, in_a), (tr_b, sc_b, in_b)):
            _eq(a, b)
