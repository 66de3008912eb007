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
    q = q_ref[0].astype(jnp.float32)       # (S, C) normalized query
    t = t_ref[0].astype(jnp.float32)       # (S, C) normalized template view
    qm = qm_ref[0, 0].astype(jnp.float32)  # (S,) query-patch mask

    sim = jax.lax.dot_general(
        q, t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S_query, S_template)
    sim = sim * qm[:, None]

    score_t2s = sim.max(axis=1)      # (S,)
    idx_t2s = sim.argmax(axis=1)
    idx_s2t = sim.argmax(axis=0)     # (S,)

    valid = (qm > 0) & (idx_s2t != 0) & (idx_t2s != 0)
    vf = valid.astype(jnp.float32)
    any_valid = vf.sum() > 0
    score = jnp.where(any_valid, (score_t2s * vf).sum() / (S * S), 0.0)
    # the whole (B, N) score table is one VMEM-resident block revisited by
    # every program (it's tiny); each deposits its scalar
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
            pl.BlockSpec((1, 1, S), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, S, C), lambda b, n: (n, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((B, N), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * S * S * C,
            bytes_accessed=B * N * S * C * t_norm.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_norm, q_mask.reshape(B, 1, S), t_norm)
    return out
