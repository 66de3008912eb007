"""Pin the fused LayerNorm (ops/layernorm.py) against flax nn.LayerNorm.

The ViT trunk's 48 LNs run through the Pallas kernel on TPU
(ops/pallas/layernorm.py); these tests pin the kernel (interpret mode on
CPU) and the XLA fallback against the flax module the model originally
used, including gradients through the custom-VJP wrapper.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from picopose_tpu.ops.layernorm import _layernorm_pallas_bwd, layernorm_xla
from picopose_tpu.ops.pallas.layernorm import layernorm_pallas


def _flax_ln(x, scale, bias, eps=1e-6):
    mod = nn.LayerNorm(epsilon=eps, dtype=x.dtype)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_flax(dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.5, 3.0, (4, 257, 256)), dtype)
    scale = jnp.asarray(rng.normal(1.0, 0.2, (256,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.5, (256,)), jnp.float32)

    ref = np.asarray(_flax_ln(x, scale, bias), np.float32)
    got_k = np.asarray(
        layernorm_pallas(x, scale, bias, interpret=True), np.float32
    )
    got_x = np.asarray(layernorm_xla(x, scale, bias), np.float32)

    # normalized outputs are O(1); bf16 tolerates ~2 ulps of stat drift
    atol = 1e-5 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(got_k, ref, atol=atol)
    np.testing.assert_allclose(got_x, ref, atol=atol)


def test_xla_grads_match_flax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0.5, 2.0, (2, 65, 128)), jnp.float32)
    scale = jnp.asarray(rng.normal(1.0, 0.2, (128,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.5, (128,)), jnp.float32)

    loss = lambda f: lambda a, s, b: jnp.sum(jnp.sin(f(a, s, b)))
    g_ref = jax.grad(loss(_flax_ln), argnums=(0, 1, 2))(x, scale, bias)
    g_got = jax.grad(loss(layernorm_xla), argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_custom_vjp_bwd_is_xla_grad():
    """The Pallas wrapper's backward must reproduce the XLA-form gradient
    (it differentiates layernorm_xla by construction; pin the plumbing)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0.0, 1.0, (2, 33, 128)), jnp.float32)
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    g = jnp.asarray(rng.normal(0.0, 1.0, x.shape), jnp.float32)

    dx, ds, db = _layernorm_pallas_bwd(1e-6, (x, scale, bias), g)
    _, vjp = jax.vjp(lambda a, s, b: layernorm_xla(a, s, b, 1e-6), x, scale, bias)
    ref = vjp(g)
    for a, b in zip((dx, ds, db), ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
