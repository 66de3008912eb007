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
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    # operands stay in their storage dtype: for bf16 Q/K the MXU multiplies
    # the same values the f32-upcast form would (bf16 products are exact,
    # accumulation is f32 either way) but runs at the bf16 rate — the
    # upcast QK^T was the largest piece of the 3.5 ms/eval-batch this
    # kernel measured across the ViT-L's 24 calls.  The scale is applied
    # to the f32 scores instead of the bf16 operand so it costs no
    # operand-rounding.
    q = q_ref[...]  # (S, Np, D)
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (S, Np, Np) f32
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.astype(o_ref.dtype)


# (batch*head) slices per grid step.  One slice per step leaves the step
# latency (~1.1 us on v5e) dominating the tiny N=257, D=64 matmuls: the
# query-side ViT-L pass measured 0.31 ms per attention call at S=1 vs a
# ~0.04 ms compute bound.  Batching 4 slices amortizes the overhead 4x
# while keeping the fp32 score block (4, Np, Np) ~2.4 MB — comfortably
# inside VMEM with the pipeline's double buffers.
_SLICES = 4


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(B, H, N, D) fused attention; numerically matches attention_xla."""
    B, H, N, D = q.shape
    Np = _round_up(N, _LANE)
    BH = B * H
    S = math.gcd(_SLICES, BH)
    BHp = _round_up(BH, S)  # == BH; kept for clarity if _SLICES changes
    pad = [(0, 0), (0, 0), (0, Np - N), (0, 0)]
    qp = jnp.pad(q, pad).reshape(BH, Np, D)
    kp = jnp.pad(k, pad).reshape(BH, Np, D)
    vp = jnp.pad(v, pad).reshape(BH, Np, D)

    kernel = functools.partial(_attn_kernel, n_valid=N, scale=D**-0.5)
    spec = pl.BlockSpec((S, Np, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(BHp // S,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BHp, Np, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * Np * Np * D,
            bytes_accessed=4 * BH * Np * D * q.dtype.itemsize,
            transcendentals=BH * Np * Np,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(B, H, Np, D)[:, :, :N, :]
