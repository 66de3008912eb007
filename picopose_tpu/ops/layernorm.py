"""LayerNorm dispatch: Pallas TPU kernel forward, XLA math elsewhere.

Same dispatch pattern as ops/attention.py: the Pallas kernel carries a
``jax.custom_vjp`` whose backward differentiates the XLA reference form
(LN backward is cheap relative to the surrounding matmul backwards, and
the recompute keeps the kernel VJP-free).  tests/test_layernorm.py pins
kernel-vs-XLA numerics and gradient flow.

Reference semantics: pre-norm ViT blocks, eps 1e-6
(model/stage1/vision_transformer.py); see ops/pallas/layernorm.py for why
the XLA lowering needed replacing on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layernorm_xla(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """f32-stat LayerNorm over the last axis (flax fast-variance form)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(axis=-1, keepdims=True) - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + jnp.float32(eps))
    y = (xf - mean) * (inv * scale.astype(jnp.float32)) + bias.astype(
        jnp.float32
    )
    return y.astype(x.dtype)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _layernorm_pallas(eps, x, scale, bias):
    from picopose_tpu.ops.pallas.layernorm import layernorm_pallas

    # eps rides nondiff_argnums so it reaches the kernel's static args as a
    # plain float, never a tracer
    return layernorm_pallas(x, scale, bias, eps=eps)


def _layernorm_pallas_fwd(eps, x, scale, bias):
    return _layernorm_pallas(eps, x, scale, bias), (x, scale, bias)


def _layernorm_pallas_bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda a, s, b: layernorm_xla(a, s, b, eps), x, scale, bias)
    return vjp(g)


_layernorm_pallas.defvjp(_layernorm_pallas_fwd, _layernorm_pallas_bwd)


def layernorm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """(..., N, C) LayerNorm over the last axis."""
    if jax.devices()[0].platform == "tpu" and x.ndim == 3:
        return _layernorm_pallas(eps, x, scale, bias)
    return layernorm_xla(x, scale, bias, eps)
