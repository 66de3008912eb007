"""Shape/jit tests for the neural modules and backbone parity checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from picopose_tpu.models import (
    AffineRegressor,
    DPTHead,
    FeatureExtractor,
    FlowDecoder,
    PicoPose,
)
from picopose_tpu.models.dinov2 import VIT_CONFIGS, bicubic_resize_matrix

pytestmark = pytest.mark.compileheavy

# tiny ViT config for fast tests
SMALL = dict(vit_type="dinov2_vits14", blocks_to_take=(1, 3, 5, 7))


class TestBicubic:
    def test_matches_torch_bicubic_with_offset(self, rng):
        """Pin the pos-embed interpolation against torch's bicubic with the
        DINOv2 scale-offset trick (vision_transformer.py:179-207)."""
        G, out = 37, 16
        x = rng.normal(size=(1, G, G, 8)).astype(np.float32)
        s = (out + 0.1) / G
        Wy = bicubic_resize_matrix(G, out, s)
        ours = np.einsum("yg,bghc->byhc", Wy, x)
        ours = np.einsum("xh,byhc->byxc", bicubic_resize_matrix(G, out, s), ours)

        t = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        ref = torch.nn.functional.interpolate(
            t, scale_factor=(s, s), mode="bicubic", antialias=False
        )
        ref = np.moveaxis(ref.numpy(), 1, -1)
        np.testing.assert_allclose(ours, ref, atol=2e-5)


class TestFeatureExtractor:
    def test_shapes_and_determinism(self, rng):
        fe = FeatureExtractor(**SMALL, compute_dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(2, 112, 112, 3)).astype(np.float32))
        params = fe.init(jax.random.PRNGKey(0), x)
        feats = fe.apply(params, x)
        assert len(feats) == 4
        c = VIT_CONFIGS["dinov2_vits14"].embed_dim
        for f in feats:
            assert f.shape == (2, 8, 8, c)
        feats2 = fe.apply(params, x)
        np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(feats2[0]))

    def test_remat_matches_forward_and_grad(self, rng):
        """remat=True (ViT block activation checkpointing, the batch-32
        training memory saver) must match the plain trunk in both the
        forward values and the parameter gradients — remat changes XLA
        fusion boundaries, so exact-bit equality is not expected; the
        measured full-train-step loss delta is ~1e-5 relative."""
        x = jnp.asarray(rng.normal(size=(2, 112, 112, 3)).astype(np.float32))
        fe0 = FeatureExtractor(**SMALL, compute_dtype=jnp.float32)
        fe1 = FeatureExtractor(
            **SMALL, compute_dtype=jnp.float32, remat=True
        )
        params = fe0.init(jax.random.PRNGKey(0), x)

        def loss(fe):
            def f(p):
                return sum(jnp.sum(o * o) for o in fe.apply(p, x))
            return f

        v0, g0 = jax.value_and_grad(loss(fe0))(params)
        v1, g1 = jax.value_and_grad(loss(fe1))(params)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            # gradient magnitudes are O(100) here; atol covers near-zero
            # entries whose absolute rounding noise is ~1e-2
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=0.05
            )


class TestHeads:
    def test_affine_regressor_shapes(self, rng):
        m = AffineRegressor()
        sim = jnp.asarray(rng.normal(size=(3, 16, 16, 256)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), sim)
        tr, sc, inp = m.apply(params, sim)
        assert tr.shape == (3, 2) and sc.shape == (3,) and inp.shape == (3, 2)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(inp), axis=1), 1.0, rtol=1e-5
        )

    def test_dpt_head_pyramid(self, rng):
        m = DPTHead(in_channels=64)
        levels = [
            jnp.asarray(rng.normal(size=(2, 16, 16, 64)).astype(np.float32))
            for _ in range(4)
        ]
        variables = m.init(jax.random.PRNGKey(0), levels)
        out = m.apply(variables, levels)
        assert [o.shape for o in out] == [
            (2, 16, 16, 256), (2, 32, 32, 256), (2, 64, 64, 256),
        ]

    def test_flow_decoder_levels(self, rng):
        m = FlowDecoder(num_levels=3, radius=4)
        feats = [
            jnp.asarray(rng.normal(size=(2, s, s, 256)).astype(np.float32))
            for s in (16, 32, 64)
        ]
        flow0 = jnp.zeros((2, 16, 16, 2))
        cert0 = jnp.zeros((2, 16, 16, 1))
        variables = m.init(jax.random.PRNGKey(0), feats, feats, flow0, cert0)
        flows, certs = m.apply(variables, feats, feats, flow0, cert0)
        assert [f.shape for f in flows] == [
            (2, 16, 16, 2), (2, 32, 32, 2), (2, 64, 64, 2),
        ]
        assert [c.shape for c in certs] == [
            (2, 16, 16, 1), (2, 32, 32, 1), (2, 64, 64, 1),
        ]

    def test_fused_xheads_match_unfused(self, rng):
        """fuse_xheads=True (default): same param tree, same init values,
        outputs and grads matching the reference-shaped unfused stacks
        (models/flow.py::_fused_xheads is pure reassociation)."""
        feats = [
            jnp.asarray(rng.normal(size=(2, s, s, 256)).astype(np.float32))
            for s in (16, 32, 64)
        ]
        reals = [f[:1] * 0.7 + 0.1 for f in feats]  # group=2 (folded hyps)
        flow0 = jnp.asarray(rng.normal(size=(2, 16, 16, 2)).astype(np.float32))
        cert0 = jnp.zeros((2, 16, 16, 1))
        mf = FlowDecoder(num_levels=3, radius=4, fuse_xheads=True)
        mu = FlowDecoder(num_levels=3, radius=4, fuse_xheads=False)
        vf = mf.init(jax.random.PRNGKey(3), feats, reals, flow0, cert0)
        vu = mu.init(jax.random.PRNGKey(3), feats, reals, flow0, cert0)
        leaves_f = jax.tree_util.tree_leaves_with_path(vf)
        leaves_u = jax.tree_util.tree_leaves_with_path(vu)
        assert {jax.tree_util.keystr(k): v.shape for k, v in leaves_f} == {
            jax.tree_util.keystr(k): v.shape for k, v in leaves_u
        }
        for (_, a), (_, b) in zip(leaves_f, leaves_u):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        def loss(m, v):
            flows, certs = m.apply(v, feats, reals, flow0, cert0)
            return sum(jnp.sum(f**2) for f in flows) + sum(
                jnp.sum(c**2) for c in certs
            )

        lf, gf = jax.value_and_grad(lambda v: loss(mf, v))(vu)
        lu, gu = jax.value_and_grad(lambda v: loss(mu, v))(vu)
        np.testing.assert_allclose(float(lf), float(lu), rtol=1e-5)
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gf), key=lambda t: jax.tree_util.keystr(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(gu), key=lambda t: jax.tree_util.keystr(t[0])),
        ):
            assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
            # grads pass through 3 decoder levels of corr/warp backward;
            # reassociation noise reaches ~3e-3 relative on a few elements
            # (a wrong grouping/padding would be O(1) everywhere)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4,
                err_msg=jax.tree_util.keystr(pa),
            )

    def test_quantized_conv_close_to_float(self, rng):
        """ops/qconv.py QConv: same param tree as nn.Conv, ~1% error."""
        import flax.linen as nn
        from picopose_tpu.ops.qconv import QConv

        x = jnp.asarray(rng.normal(size=(2, 16, 16, 64)).astype(np.float32))
        q = QConv(32, (3, 3), padding=1)
        f = nn.Conv(32, (3, 3), padding=1)
        variables = f.init(jax.random.PRNGKey(0), x)
        # identical parameter structure (porter/exporter compatibility)
        assert jax.tree_util.tree_structure(
            q.init(jax.random.PRNGKey(0), x)
        ) == jax.tree_util.tree_structure(variables)
        yf = f.apply(variables, x)
        yq = q.apply(variables, x)
        rel = float(
            jnp.linalg.norm(yq - yf) / (jnp.linalg.norm(yf) + 1e-9)
        )
        assert rel < 0.02, rel

    def test_flow_decoder_quantized_close_to_float(self, rng):
        """The int8 serving mode shares weights with the float path and
        tracks it to a few percent through the whole 3-level decoder."""
        feats = [
            jnp.asarray(rng.normal(size=(2, s, s, 256)).astype(np.float32))
            for s in (16, 32, 64)
        ]
        flow0 = jnp.zeros((2, 16, 16, 2))
        cert0 = jnp.zeros((2, 16, 16, 1))
        m_f = FlowDecoder(num_levels=3, radius=4, quantize=False)
        m_q = FlowDecoder(num_levels=3, radius=4, quantize=True)
        variables = m_f.init(jax.random.PRNGKey(0), feats, feats, flow0, cert0)
        flows_f, certs_f = m_f.apply(variables, feats, feats, flow0, cert0)
        flows_q, certs_q = m_q.apply(variables, feats, feats, flow0, cert0)
        for ff, fq in zip(flows_f, flows_q):
            rel = float(
                jnp.linalg.norm(fq - ff) / (jnp.linalg.norm(ff) + 1e-9)
            )
            assert rel < 0.08, rel
        for cf, cq in zip(certs_f, certs_q):
            rel = float(
                jnp.linalg.norm(cq - cf) / (jnp.linalg.norm(cf) + 1e-9)
            )
            assert rel < 0.08, rel

    def test_flow_decoder_batchnorm_updates(self, rng):
        m = FlowDecoder(num_levels=1, radius=4)
        feats = [jnp.asarray(rng.normal(size=(2, 16, 16, 256)).astype(np.float32))]
        flow0 = jnp.zeros((2, 16, 16, 2))
        cert0 = jnp.zeros((2, 16, 16, 1))
        variables = m.init(jax.random.PRNGKey(0), feats, feats, flow0, cert0, train=True)
        _, mut = m.apply(
            variables, feats, feats, flow0, cert0, train=True,
            mutable=["batch_stats"],
        )
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mut["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )


class TestPicoPoseInit:
    def test_init_and_call(self, rng):
        model = PicoPose(**SMALL, compute_dtype=jnp.float32)
        imgs = jnp.asarray(rng.normal(size=(1, 112, 112, 3)).astype(np.float32))
        masks = jnp.ones((1, 112, 112))
        variables = model.init(jax.random.PRNGKey(0), imgs, masks, True)
        assert "params" in variables and "batch_stats" in variables
        tr, sc, inp, flows, certs = model.apply(variables, imgs, masks)
        assert tr.shape == (1, 2)
        assert len(flows) == 3


class TestSwiGLUVariant:
    def test_giant_style_ffn_forward(self, rng):
        """The vit_giant2-style SwiGLU FFN path initializes and runs."""
        from picopose_tpu.models.dinov2 import ViTConfig, VIT_CONFIGS

        VIT_CONFIGS["_test_swiglu"] = ViTConfig(
            embed_dim=64, depth=2, num_heads=4, ffn_layer="swiglufused"
        )
        fe = FeatureExtractor("_test_swiglu", (0, 1, 0, 1), compute_dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))
        params = fe.init(jax.random.PRNGKey(0), x)
        feats = fe.apply(params, x)
        assert feats[0].shape == (1, 4, 4, 64)
        # w12/w3 parameter names (torch-port compatible)
        blk = params["params"]["dinov2"]["blocks_0"]["mlp"]
        assert set(blk) == {"w12", "w3"}
