"""Multi-head attention core, with a Pallas TPU kernel and an XLA fallback.

The reference uses xformers CUDA memory-efficient attention when available
and a naive softmax path otherwise (model/stage1/layers/attention.py:20-81).
Sequence length here is tiny (257 = 16x16 patches + cls at 224^2/14), so the
win on TPU is not long-sequence tiling but (a) keeping the whole
QK^T-softmax-V in VMEM fused per (batch*head) slice and (b) batching
thousands of sequences (162-view template banks) through the MXU in bf16.

`attention()` dispatches: Pallas flash kernel on TPU, einsum fallback
elsewhere (tests pin the two against each other and against torch SDPA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, H, N, D) scaled dot-product attention, softmax in fp32.

    Matches torch F.scaled_dot_product_attention / the reference's naive
    branch (model/stage1/layers/attention.py:33-47): scale = D^-0.5.
    """
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", probs, v)


@functools.partial(jax.jit, static_argnames=("impl",))
def attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, impl: str = "auto"
) -> jnp.ndarray:
    """Dispatching attention over (B, H, N, D).

    impl: 'auto' (Pallas on TPU, XLA otherwise), 'xla', or 'pallas'.
    """
    if impl == "xla":
        return attention_xla(q, k, v)
    if impl == "pallas" or (
        impl == "auto" and jax.devices()[0].platform == "tpu"
    ):
        from picopose_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v)
    return attention_xla(q, k, v)
