"""Gradient parity: the Pallas attention path's custom VJP vs pure XLA."""

import numpy as np
import jax
import jax.numpy as jnp

from picopose_tpu.ops.attention import (
    _attention_pallas_bwd,
    attention_xla,
)


def test_custom_vjp_matches_xla_grads(rng):
    B, H, N, D = 1, 2, 33, 16
    q = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))

    # the custom bwd recomputes through attention_xla — must equal direct vjp
    ref = jax.vjp(attention_xla, q, k, v)[1](g)
    ours = _attention_pallas_bwd((q, k, v), g)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
