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


@jax.custom_vjp
def _attention_pallas(q, k, v):
    from picopose_tpu.ops.pallas.flash_attention import flash_attention

    return flash_attention(q, k, v)


def _attention_pallas_fwd(q, k, v):
    return _attention_pallas(q, k, v), (q, k, v)


def _attention_pallas_bwd(res, g):
    # Flash-style rematerialized backward: recompute attention through the
    # XLA path and differentiate that (the kernel itself has no VJP).  At
    # 257 tokens the recompute is cheap; the forward stays on the fused
    # Pallas kernel.
    q, k, v = res
    _, vjp = jax.vjp(attention_xla, q, k, v)
    return vjp(g)


_attention_pallas.defvjp(_attention_pallas_fwd, _attention_pallas_bwd)


@functools.partial(jax.jit, static_argnames=("impl",))
def attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, impl: str = "auto"
) -> jnp.ndarray:
    """Dispatching attention over (B, H, N, D).

    impl: 'auto' (Pallas on TPU, XLA otherwise), 'xla', or 'pallas'.
    Differentiable on every path (the Pallas forward carries a custom VJP).
    """
    if impl == "xla":
        return attention_xla(q, k, v)
    if impl == "pallas" or (
        impl == "auto" and jax.devices()[0].platform == "tpu"
    ):
        return _attention_pallas(q, k, v)
    return attention_xla(q, k, v)
