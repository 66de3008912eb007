"""Fused template-matching score kernel.

One program per (batch, view): the (S, S) masked cosine-similarity matrix
lives only in VMEM — MXU matmul, both-direction argmax validity, masked
mean — and a single scalar score leaves the chip per view.  This is the
Pallas form of utils/matching.py:29-69 (see ops/matching.py for semantics
and the XLA fallback used as its oracle); it removes the (B, N, S, S) HBM
traffic entirely (the XLA path chunks it, ~34 MB per chunk at B=16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _score_kernel(q_ref, qm_ref, t_ref, out_ref, *, S: int):
    """Mosaic-friendly formulation: no 1-D vectors, no argmax, no transpose.

    argmax-validity terms become strict-max comparisons (argmax over an axis
    is 0 iff the 0th entry EQUALS the max, since jnp/torch argmax tie-breaks
    to the first index), and the aligned-index product of a column-space
    vector with row-space vectors collapses through a (1, S) x (S, 1) dot —
    everything stays 2-D and MXU/VPU-shaped.

    int8 inputs take the quantized path: the cosine matmul runs on the
    int8 MXU (2x the bf16 rate, 4x the fp32 HBM footprint saving) and the
    int32 products are rescaled by 127^-2; normalized features live in
    [-1, 1] so the symmetric 127 scale is exact at the range ends.
    """
    qm_col = qm_ref[0].astype(jnp.float32)   # (S, 1) query-patch mask

    if q_ref.dtype == jnp.int8:
        sim = jax.lax.dot_general(
            q_ref[0], t_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * jnp.float32(1.0 / (127.0 * 127.0))
    else:
        # operands stay in their storage dtype: for the production bf16
        # bank, a bf16 x bf16 -> f32 MXU dot multiplies the SAME values the
        # f32-upcast form would (the convert adds no information) but runs
        # at the bf16 MXU rate — the upcast form measured 3.9 ms/batch in
        # the device trace (~45% MFU), this form ~2x that rate
        q = q_ref[0]                         # (S, C) normalized query
        t = t_ref[0]                         # (S, C) normalized template view
        sim = jax.lax.dot_general(
            q, t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S_query, S_template) f32
    sim = sim * qm_col

    rowmax = sim.max(axis=1, keepdims=True)           # (S, 1) score_t2s
    t_valid = (sim[:, 0:1] < rowmax).astype(jnp.float32)   # idx_t2s != 0
    colmax = sim.max(axis=0, keepdims=True)           # (1, S)
    s_valid = (sim[0:1, :] < colmax).astype(jnp.float32)   # idx_s2t != 0

    qv = (qm_col > 0).astype(jnp.float32)
    row_terms = qv * t_valid                          # (S, 1)

    def rowdot(col):  # (1, S) x (S, 1) -> scalar
        return jax.lax.dot_general(
            s_valid, col, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0, 0]

    count = rowdot(row_terms)
    total = rowdot(rowmax * row_terms)
    # divisor is num_patches**2 == h*w == S (utils/matching.py:37,65-67)
    score = jnp.where(count > 0, total / S, 0.0)
    # the whole (B, N) score table is one SMEM-resident block revisited by
    # every program (scalar stores must target SMEM on TPU)
    out_ref[pl.program_id(0), pl.program_id(1)] = score


@functools.partial(jax.jit, static_argnames=("interpret",))
def match_scores_pallas(
    q_norm: jnp.ndarray,   # (B, S, C) L2-normalized query patches
    q_mask: jnp.ndarray,   # (B, S) mask at feature-grid resolution
    t_norm: jnp.ndarray,   # (N, S, C) L2-normalized SHARED template bank
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-view matching scores (B, N)."""
    B = q_norm.shape[0]
    N, S, C = t_norm.shape
    kernel = functools.partial(_score_kernel, S=S)
    out = pl.pallas_call(
        kernel,
        grid=(B, N),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, S, C), lambda b, n: (n, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((B, N), lambda b, n: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * S * S * C,
            bytes_accessed=B * N * S * C * t_norm.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_norm, q_mask.reshape(B, S, 1), t_norm)
    return out
