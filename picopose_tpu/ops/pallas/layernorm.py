"""Fused LayerNorm kernel: stats on the MXU, one HBM read + one write.

Why a kernel at all: the ViT trunk (models/dinov2.py) runs 48 LayerNorms
per forward, and XLA lowers each one's mean/variance to a cross-lane VPU
reduce fused into the residual stream — measured 0.43 ms EACH over
bf16[16,257,1024] in the eval-pipeline device trace (~10 ms/batch total,
30x off the HBM bound for the bytes they touch).  Expressing the sums as
``x @ ones`` dots does not help: XLA's algebraic simplifier canonicalizes
a dot against a splat-constant operand straight back into the same reduce.
Inside Pallas the dot is literal — Mosaic has no such rewrite — so the
(rows, C) x (C, 128) all-ones matmul streams the activations through the
MXU at line rate, and the whole LN (stats + normalize + affine) costs one
VMEM round trip per token tile.

Semantics match ``nn.LayerNorm(use_fast_variance=True)`` (the flax default
the model used before): f32-accumulated sums, variance = E[x^2] - E[x]^2,
f32 normalize math, output cast back to the input dtype.  The per-element
square is taken in the input dtype before the f32 accumulation; for bf16
inputs that perturbs the variance by <=0.4% relative, which is below the
output's own bf16 resolution.  LN use in the reference:
model/stage1/vision_transformer.py pre-norm blocks, eps 1e-6.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float, C: int):
    x = x_ref[0]  # (N, C)
    ones = jnp.ones((C, 128), x.dtype)
    dot = lambda a: jax.lax.dot_general(
        a, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1]  # every column holds the row sum; keep one
    inv_c = jnp.float32(1.0 / C)
    mean = dot(x) * inv_c                       # (N, 1) f32
    mean_sq = dot(x * x) * inv_c
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + jnp.float32(eps))
    y = (x.astype(jnp.float32) - mean) * (inv * s_ref[0]) + b_ref[0]
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def layernorm_pallas(
    x: jnp.ndarray,      # (B, N, C)
    scale: jnp.ndarray,  # (C,) f32
    bias: jnp.ndarray,   # (C,) f32
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm over the last axis of a (B, N, C) token stream."""
    B, N, C = x.shape
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps, C=C),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * N * C * 128 + 6 * B * N * C,
            bytes_accessed=2 * B * N * C * x.dtype.itemsize,
            transcendentals=B * N,
        ),
        interpret=interpret,
    )(x, scale.astype(f32).reshape(1, C), bias.astype(f32).reshape(1, C))
