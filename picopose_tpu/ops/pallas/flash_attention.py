"""Fused attention kernel for short sequences (ViT-L at 257 tokens).

Replaces the reference's xformers CUDA memory-efficient attention
(model/stage1/layers/attention.py:65-81).  At N=257 the whole (N, N) score
matrix fits comfortably in VMEM, so instead of streaming softmax we fuse
QK^T -> masked softmax -> PV into ONE kernel per (batch*head) slice: a
single HBM round-trip for Q/K/V/O, fp32 softmax, bf16-friendly MXU matmuls.
The batch*head grid axis is where the parallelism is — template banks put
thousands of sequences through this at once (162 views x objects,
run_test.py:120-134).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (Np, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q * scale,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Np, Np)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(B, H, N, D) fused attention; numerically matches attention_xla."""
    B, H, N, D = q.shape
    Np = _round_up(N, _LANE)
    pad = [(0, 0), (0, 0), (0, Np - N), (0, 0)]
    qp = jnp.pad(q, pad).reshape(B * H, Np, D)
    kp = jnp.pad(k, pad).reshape(B * H, Np, D)
    vp = jnp.pad(v, pad).reshape(B * H, Np, D)

    kernel = functools.partial(_attn_kernel, n_valid=N, scale=D**-0.5)
    spec = pl.BlockSpec((1, Np, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (B * H) * Np * Np * D,
            bytes_accessed=4 * (B * H) * Np * D * q.dtype.itemsize,
            transcendentals=(B * H) * Np * Np,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(B, H, Np, D)[:, :, :N, :]
