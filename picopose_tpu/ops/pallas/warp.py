"""Bilinear feature warp as a dense one-hot matmul kernel.

warp_by_flow's XLA formulation gathers 4 feature rows per output pixel
(ops/sample.py): at stage-3 shapes that is 4 x ~4.5 ms of HBM gather per
decoder level in the device trace.  Gathers are the one thing the TPU
memory system does badly, and the same linearity trick as the correlation
kernel applies: the bilinear sample is a (P, Q) one-hot-pair matrix W
applied to the (Q, C) feature map, so per pixel tile we build W's block
with iota compares on the VPU and evaluate the sample as ONE MXU matmul —
no gathers, grid_sample zeros padding for free (out-of-range taps match
no lane index).

Forward-only; ops/sample.py wraps it in a custom VJP that rematerializes
through the XLA gather path (same pattern as ops/corr.py — opaque Pallas
forwards break TPU training, docs/PERF.md round-1 note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot_matmul(f2, cen, row0, Wp: int):
    """Evaluate the bilinear sample of (Qw, C) rows [row0, row0+Qw/Wp) at
    the (TP, 2) pixel coords `cen` as one (TP, Qw) x (Qw, C) matmul.
    Out-of-window / out-of-image taps match no index and contribute zero
    (= grid_sample zeros padding)."""
    TP = cen.shape[0]
    Qw = f2.shape[0]
    cx, cy = cen[:, 0:1], cen[:, 1:2]
    x0f, y0f = jnp.floor(cx), jnp.floor(cy)
    fx, fy = cx - x0f, cy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    iota_q = jax.lax.broadcasted_iota(jnp.int32, (TP, Qw), 1)
    rows = iota_q // Wp
    yq = row0 + rows
    xq = iota_q - rows * Wp
    wy = (yq == y0) * (1.0 - fy) + (yq == y0 + 1) * fy
    wx = (xq == x0) * (1.0 - fx) + (xq == x0 + 1) * fx
    w = (wy * wx).astype(f2.dtype)
    prec = (
        jax.lax.Precision.HIGHEST if f2.dtype == jnp.float32 else None
    )
    return jax.lax.dot_general(
        w, f2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _warp_kernel(f2_ref, cen_ref, out_ref, *, Hp: int, Wp: int, K: int):
    cen = cen_ref[0].astype(jnp.float32)  # (TP, 2): (x, y) sample points

    if K >= Hp:  # small maps: the full matmul is already cheap
        out_ref[0] = _onehot_matmul(f2_ref[0], cen, 0, Wp).astype(out_ref.dtype)
        return

    # Row window: a TP-pixel output tile is a few consecutive image rows,
    # and flow is locally smooth, so its sample taps almost always fit in a
    # K-row band of the source.  The dense one-hot matmul then contracts
    # over K*Wp instead of Hp*Wp (4x fewer MXU flops and VPU weight-build
    # ops at the 64^2 level).  Taps outside [0, Hp) match no row index in
    # ANY window (zeros padding), so the band only needs to cover the
    # clipped valid taps; the rare tile whose valid taps span >= K rows
    # falls back to the exact full-Q contraction.
    y0 = jnp.floor(cen[:, 1]).astype(jnp.int32)  # (TP,)
    lo = jnp.clip(jnp.min(y0), 0, Hp - 1)
    hi = jnp.clip(jnp.max(y0) + 1, 0, Hp - 1)
    ry0 = jnp.minimum(lo, Hp - K)
    in_band = hi - lo < K

    @pl.when(in_band)
    def _():
        f2w = f2_ref[0, pl.ds(ry0 * Wp, K * Wp), :]
        out_ref[0] = _onehot_matmul(f2w, cen, ry0, Wp).astype(out_ref.dtype)

    @pl.when(jnp.logical_not(in_band))
    def _():
        out_ref[0] = _onehot_matmul(f2_ref[0], cen, 0, Wp).astype(out_ref.dtype)


def _pick_tile(P: int, Q: int, max_tp: int = 2048) -> int:
    budget = max(256, (6 * 1024 * 1024) // (Q * 4))
    tp = 256
    while tp * 2 <= min(P, budget, max_tp):
        tp *= 2
    tp = min(tp, P)
    while P % tp:
        tp //= 2
    return tp


@functools.partial(
    jax.jit, static_argnames=("Hp", "Wp", "group", "interpret")
)
def warp_pallas(
    feat: jnp.ndarray,  # (B/group, Q, C) source features, Q = Hp*Wp
    cen: jnp.ndarray,   # (B, P, 2) sample coordinates (x, y) in pixels
    Hp: int,
    Wp: int,
    group: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear sample at `cen` with zeros padding: (B, P, C).

    group > 1: consecutive groups of `group` coordinate streams share one
    source map (hypotheses folded into the batch axis) — f2 indexed at
    b // group, no tiled copy in HBM."""
    Q, C = feat.shape[1], feat.shape[2]
    B, P = cen.shape[0], cen.shape[1]
    # Row-windowed contraction (see _warp_kernel): K source rows per tile.
    # Cap the tile so it spans at most K/2 image rows, leaving half the
    # band as slack for the flow's local y-spread before the exact full-Q
    # fallback kicks in.
    import os

    K = 16 if Hp > 16 and os.environ.get(
        "PICOPOSE_ROW_WINDOW", "1"
    ) != "0" else Hp
    TP = _pick_tile(P, Q, max_tp=(K // 2) * Wp if K < Hp else 2048)
    kernel = functools.partial(_warp_kernel, Hp=Hp, Wp=Wp, K=K)
    return pl.pallas_call(
        kernel,
        grid=(B, P // TP),
        in_specs=[
            pl.BlockSpec((1, Q, C), lambda b, t, group=group: (b // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TP, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TP, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, C), feat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * min(K * Wp, Q) * C,
            bytes_accessed=2 * B * Q * C * feat.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(feat, cen)
