"""Dynamic int8 quantized convolution (opt-in serving mode).

The stage-3 conv core is the faithful pipeline's FLOP floor (docs/PERF.md:
the XHead 640->512 3x3 convs run at ~100% of v5e bf16 peak, ~10 ms each at
BH=80).  The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate
(slope-measured ~3.8x at the XHead shape on this chip, docs/PERF.md), so a
quantized conv trades ~1% numeric error for most of that time.

Scheme (standard dynamic post-training quantization):
  * weights: symmetric per-output-channel, scale = max|w| / 127;
  * activations: symmetric per-tensor DYNAMIC scale = max|x| / 127
    (recomputed per call — no calibration pass needed);
  * conv accumulates in int32 on the MXU; dequant = y * (a_scale*w_scale)
    + bias in the caller's compute dtype.

This CHANGES numerics vs the reference's fp32/bf16 convs — it ships
OFF by default (config `model.quantize_stage3`), same policy as the int8
matching bank (docs/PARITY.md).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def quantized_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    padding: int | str = 0,
) -> jnp.ndarray:
    """int8-MXU conv with fp kernel/bias params; returns x.dtype."""
    w = kernel.astype(jnp.float32)
    w_scale = jnp.maximum(
        jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12
    ) / 127.0                                              # (Cout,)
    w_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0   # scalar
    x_q = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)

    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    pad = padding if isinstance(padding, str) else [(padding, padding)] * 2
    y = lax.conv_general_dilated(
        x_q, w_q, (1, 1), pad, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


class QConv(nn.Module):
    """Drop-in for `nn.Conv(features, kernel_size, padding=p)` with the SAME
    parameter tree ({kernel, bias}), so checkpoints port/export unchanged
    and the float/quantized paths share weights."""

    features: int
    kernel_size: Sequence[int]
    padding: int | str = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        return quantized_conv(x, kernel, bias, self.padding)
