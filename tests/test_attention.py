"""Attention kernel parity: Pallas (interpret mode) vs XLA vs torch SDPA."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from picopose_tpu.ops.attention import attention_xla
from picopose_tpu.ops.pallas.flash_attention import flash_attention


class TestAttention:
    @pytest.mark.parametrize("N", [17, 257])
    def test_xla_matches_torch_sdpa(self, rng, N):
        B, H, D = 2, 4, 64
        q = rng.normal(size=(B, H, N, D)).astype(np.float32)
        k = rng.normal(size=(B, H, N, D)).astype(np.float32)
        v = rng.normal(size=(B, H, N, D)).astype(np.float32)
        ours = np.asarray(attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        ref = F.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    @pytest.mark.parametrize("N", [257])
    @pytest.mark.parametrize("B,H", [(1, 2), (1, 3), (4, 4)])
    def test_pallas_slice_blocking(self, rng, N, B, H):
        # B*H in {2, 3, 16}: exercises slice-blocks S=2 (gcd fallback),
        # S=1 (odd batch*head), and the full S=4 path
        D = 64
        q = rng.normal(size=(B, H, N, D)).astype(np.float32)
        k = rng.normal(size=(B, H, N, D)).astype(np.float32)
        v = rng.normal(size=(B, H, N, D)).astype(np.float32)
        ref = np.asarray(attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        ours = np.asarray(
            flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            interpret=True)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    @pytest.mark.parametrize("N", [257])
    def test_pallas_matches_xla_interpret(self, rng, N):
        B, H, D = 1, 2, 64
        q = rng.normal(size=(B, H, N, D)).astype(np.float32)
        k = rng.normal(size=(B, H, N, D)).astype(np.float32)
        v = rng.normal(size=(B, H, N, D)).astype(np.float32)
        ref = np.asarray(attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        ours = np.asarray(
            flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            interpret=True)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_pallas_bf16(self, rng):
        B, H, N, D = 1, 2, 257, 64
        q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
        ref = np.asarray(attention_xla(q, k, v), dtype=np.float32)
        ours = np.asarray(
            flash_attention(q, k, v, interpret=True), dtype=np.float32
        )
        np.testing.assert_allclose(ours, ref, atol=3e-2)
