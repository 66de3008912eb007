"""Fused correlation-window lookup kernel (RAFT lookup, one VMEM pass).

This is the Pallas form of picopose_tpu.ops.corr.corr_lookup's gather-free
formulation (itself the TPU rewrite of utils/corr_lookup.py:69-134 +
raft_decoder.py:14-53).  The XLA path materializes a per-chunk correlation
slab in HBM (lax.map serializes ~64 chunks) and evaluates the bilinear
window as thousands of tiny batched (n, Hp) x (Hp, Wp) matmuls — MXU
utilization a few percent.  This kernel keeps each pixel tile's whole
correlation block in VMEM and reduces the window in three dense steps:

  per program (stream b, pixel tile t), per-row form (default):
    corr = f1_tile @ f2_level^T * C^-0.5          -- one MXU matmul
    R_j  = where(yq == y0+j, corr, 0) @ S          -- j = 0..2r+1
           with yq = lane//Wp and S[q, x] = (q mod Wp == x): masking picks
           window row y0+j per pixel, the SHARED 0/1 stride matrix S sums
           lanes with equal x — a per-pixel row-select expressed as a
           dense MXU matmul with no per-pixel matrices anywhere

  packed form (packed=True, kept for A/B — measured SLOWER on v5e:
  30.5 ms vs per-row's 24.5 ms per 3-level lookup at BH=80
  (tools/micro_bench.py case_corr_ab); the M^2 unscramble selects cost
  more VPU time than the single fused mask saves):
    corr  = f1_tile @ f2_level^T * C^-0.5         -- one MXU matmul
    corrw = where(0 <= yq-y0 < M, corr, 0)        -- ONE select, M = 2r+2
    pack  = corrw @ S6                            -- ONE stride matmul,
            S6[q, m*Wp+x] = (yq%M == m)&(xq == x): the M window rows are
            consecutive hence distinct mod M, so one shared 0/1 matrix
            separates them all; per pixel, row j lands in block (y0+j)%M
    R_j   = pack[:, ((y0+j)%M)*Wp : +Wp]          -- M^2 selects on the
            small (TP, Wp) side (Q/Wp x cheaper than masking (TP, Q))
  both forms then finish identically:
    rows[ky] = (1-fy)*R_ky + fy*R_{ky+1}           -- bilinear in y
    win[kx*n+ky] = sum_x rows[ky] * ((1-fx)*[x==x0+kx] + fx*[x==x0+kx+1])

No reshapes/relayouts of the correlation block, no gathers: out-of-range
taps match no lane index and contribute zero — grid_sample
padding_mode='zeros' exactly.  Channel order matches the reference
(utils/corr_lookup.py:116-126): the outer window index walks x, i.e.
channel k = kx*(2r+1) + ky.

Gradients: the kernel is forward-only; ops/corr.py wraps it in a custom
VJP that rematerializes through the XLA one-hot path (same pattern as
ops/attention.py — TPU training fails outright through an opaque Pallas
forward, see docs/PERF.md round-1 note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_kernel_packed(
    f1_ref, f2_ref, cen_ref, s6_ref, out_ref, *, Hp: int, Wp: int,
    radius: int, scale: float,
):
    """Packed variant: ONE masked copy + ONE stride matmul instead of n+1.

    The window spans M = n+1 CONSECUTIVE rows y0..y0+n, which are pairwise
    distinct mod M — so a shared (Q, M*Wp) stride matrix routing lane
    (y, x) to output block (y mod M) separates all M window rows in a
    single MXU matmul.  Per pixel, window row j then lives in block
    (y0+j) mod M; the unscramble is M^2 selects on (TP, Wp) arrays —
    Q/Wp times smaller than the (TP, Q) masking the per-row form pays.
    Out-of-range rows are dropped by the in-window mask and no other
    window row shares their block (distinct mod M), so missing taps stay
    exactly zero (grid_sample padding_mode='zeros')."""
    n = 2 * radius + 1
    M = n + 1
    f1 = f1_ref[0]  # (TP, C)
    f2 = f2_ref[0]  # (Q, C)
    fp32_in = f1.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if fp32_in else None
    mat_dt = jnp.float32 if fp32_in else jnp.bfloat16

    corr = jax.lax.dot_general(
        f1, f2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale  # (TP, Q) fp32
    Q = f2.shape[0]
    TP = f1.shape[0]

    cen = cen_ref[0].astype(jnp.float32)  # (TP, 2): (x, y) window centers
    cx, cy = cen[:, 0:1], cen[:, 1:2]     # (TP, 1)
    x0f, y0f = jnp.floor(cx), jnp.floor(cy)
    fx, fy = cx - x0f, cy - y0f
    x0 = x0f.astype(jnp.int32) - radius   # (TP, 1) first tap per axis
    y0 = y0f.astype(jnp.int32) - radius

    # in-window mask: rel in [0, M) — one unsigned compare (negatives wrap
    # to huge uint32) + one select over the big (TP, Q) block
    yq = jax.lax.broadcasted_iota(jnp.int32, (TP, Q), 1) // Wp
    rel = yq - y0
    corr_w = jnp.where(
        rel.astype(jnp.uint32) < jnp.uint32(M),
        corr.astype(mat_dt),
        jnp.zeros((), mat_dt),
    )
    packed = jax.lax.dot_general(
        corr_w, s6_ref[...].astype(mat_dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (TP, M*Wp): block m holds sum of in-window rows with y % M == m

    # unscramble block (y0+j) % M -> window row j, on (TP, Wp) arrays
    blocks = [packed[:, m * Wp:(m + 1) * Wp] for m in range(M)]
    zero_r = jnp.zeros((), jnp.float32)
    R = []
    for j in range(M):
        sel = jnp.remainder(y0 + j, M)  # (TP, 1), floor mod >= 0
        acc = jnp.where(sel == 0, blocks[0], zero_r)
        for m in range(1, M):
            acc = acc + jnp.where(sel == m, blocks[m], zero_r)
        R.append(acc)
    rows = [(1.0 - fy) * R[ky] + fy * R[ky + 1] for ky in range(n)]

    # --- x phase: bilinear column weights + lane reductions
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (TP, Wp), 1)
    ex = [(iota_x == x0 + j).astype(jnp.float32) for j in range(n + 1)]
    cols = []
    for kx in range(n):
        xw = (1.0 - fx) * ex[kx] + fx * ex[kx + 1]
        for ky in range(n):  # channel k = kx*n + ky (outer index walks x)
            cols.append(jnp.sum(rows[ky] * xw, axis=1, keepdims=True))
    out_ref[0] = jnp.concatenate(cols, axis=1).astype(out_ref.dtype)


def _transposed_body(
    f2w, f1, cen, row0, rows_n: int, Wp: int, radius: int, scale: float,
    out_dtype,
):
    """Windowed transposed correlation: corr^T over source rows
    [row0, row0 + rows_n) only, then the bilinear window as masked VPU
    reductions.  Out-of-window / out-of-image taps match no row/col index
    and contribute zero (grid_sample padding_mode='zeros')."""
    n = 2 * radius + 1
    fp32_in = f1.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if fp32_in else None
    TP = f1.shape[0]

    corrT = jax.lax.dot_general(
        f2w, f1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale  # (rows_n * Wp, TP) fp32
    corr3 = corrT.reshape(rows_n, Wp, TP)

    cx, cy = cen[0:1, :], cen[1:2, :]      # (1, TP)
    x0f, y0f = jnp.floor(cx), jnp.floor(cy)
    fx, fy = cx - x0f, cy - y0f
    x0 = x0f.astype(jnp.int32) - radius    # (1, TP) first tap per axis
    y0 = y0f.astype(jnp.int32) - radius

    # y phase: bilinear weight folded into the row mask, reduced over the
    # major axis (out-of-range rows match neither ky nor ky+1 -> zero)
    rel = (
        jax.lax.broadcasted_iota(jnp.int32, (rows_n, TP), 0) + row0 - y0
    )  # (rows_n, TP)
    zero = jnp.float32(0.0)
    rows = []
    for ky in range(n):
        wy = jnp.where(rel == ky, 1.0 - fy, zero) + jnp.where(
            rel == ky + 1, fy, zero
        )  # (rows_n, TP)
        rows.append(jnp.sum(corr3 * wy[:, None, :], axis=0))  # (Wp, TP)

    # x phase: same fold over the sublane (Wp) axis
    relx = jax.lax.broadcasted_iota(jnp.int32, (Wp, TP), 0) - x0  # (Wp, TP)
    cols = []
    for kx in range(n):
        wx = jnp.where(relx == kx, 1.0 - fx, zero) + jnp.where(
            relx == kx + 1, fx, zero
        )
        for ky in range(n):  # channel k = kx*n + ky (outer index walks x)
            cols.append(jnp.sum(rows[ky] * wx, axis=0, keepdims=True))
    return jnp.concatenate(cols, axis=0).astype(out_dtype)


def _window_kernel_transposed(
    f1_ref, f2_ref, cent_ref, out_ref, *, Hp: int, Wp: int, radius: int,
    scale: float, K: int,
):
    """Transposed variant: corr^T = f2 @ f1^T keeps PIXELS on the lane axis,
    so the window's row selection becomes a masked reduction over the MAJOR
    (Hp) axis of corr^T reshaped (Hp, Wp, TP) — pure VPU adds — instead of
    the per-row form's n+1 MXU stride matmuls.  Motivation (trace_ops at
    the faithful shapes): the stride matmuls are (TP, Q) x (Q, Wp) with
    N = Wp = 64 output lanes — half the MXU's 128 lanes idle — and they
    cost ~1.75x the correlation matmul itself in FLOPs.  Here the MXU does
    ONLY the correlation (same FLOPs, full-width N = TP) and the bilinear
    window runs on the VPU with the y-weights folded into the masks
    (n weighted reductions, not n+1 masked + n combines).

    Row window (K < Hp): only a (2r+2)-row band of the source around each
    pixel's window center contributes, and flow is locally smooth, so the
    whole tile's taps almost always fit a K-row band — the correlation
    matmul then contracts (K*Wp, C) instead of (Q, C) (4x fewer MXU flops
    and masked-reduction rows at the 64^2 level; same trick as
    ops/pallas/warp.py).  Out-of-band taps match no row index in any
    window, so zeros padding holds under the shift; a tile whose valid
    taps span >= K rows falls back to the exact full-Q contraction.

    Output is written (nn, TP) — channel-major — and un-transposed by the
    caller in XLA.

    cent_ref carries the window centers TRANSPOSED, (1, 2, TP): the weight
    arithmetic needs centers with pixels on the lane axis, and reshaping
    (TP, 2) -> (2, TP) inside the kernel would be a Mosaic relayout.
    """
    f1 = f1_ref[0]  # (TP, C)
    cen = cent_ref[0].astype(jnp.float32)  # (2, TP): row 0 = x, row 1 = y

    if K >= Hp:
        out_ref[0] = _transposed_body(
            f2_ref[0], f1, cen, 0, Hp, Wp, radius, scale, out_ref.dtype
        )
        return

    n = 2 * radius + 1
    y0 = jnp.floor(cen[1, :]).astype(jnp.int32) - radius  # (TP,) first tap
    lo = jnp.clip(jnp.min(y0), 0, Hp - 1)
    hi = jnp.clip(jnp.max(y0) + n, 0, Hp - 1)
    ry0 = jnp.minimum(lo, Hp - K)
    in_band = hi - lo < K

    @pl.when(in_band)
    def _():
        f2w = f2_ref[0, pl.ds(ry0 * Wp, K * Wp), :]
        out_ref[0] = _transposed_body(
            f2w, f1, cen, ry0, K, Wp, radius, scale, out_ref.dtype
        )

    @pl.when(jnp.logical_not(in_band))
    def _():
        out_ref[0] = _transposed_body(
            f2_ref[0], f1, cen, 0, Hp, Wp, radius, scale, out_ref.dtype
        )


def _window_kernel(
    f1_ref, f2_ref, cen_ref, out_ref, *, Hp: int, Wp: int, radius: int,
    scale: float,
):
    n = 2 * radius + 1
    f1 = f1_ref[0]  # (TP, C)
    f2 = f2_ref[0]  # (Q, C)
    TP = f1.shape[0]
    Q = f2.shape[0]
    fp32_in = f1.dtype == jnp.float32
    # fp32 operands (training forward) must not ride the default 1-pass
    # bf16 MXU route; bf16 operands (eval) accumulate fp32 regardless, and
    # Mosaic rejects HIGHEST on a bf16 matmul outright.
    prec = jax.lax.Precision.HIGHEST if fp32_in else None
    mat_dt = jnp.float32 if fp32_in else jnp.bfloat16

    corr = jax.lax.dot_general(
        f1, f2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale  # (TP, Q) fp32

    cen = cen_ref[0].astype(jnp.float32)  # (TP, 2): (x, y) window centers
    cx, cy = cen[:, 0:1], cen[:, 1:2]     # (TP, 1)
    x0f, y0f = jnp.floor(cx), jnp.floor(cy)
    fx, fy = cx - x0f, cy - y0f
    x0 = x0f.astype(jnp.int32) - radius   # (TP, 1) first tap per axis
    y0 = y0f.astype(jnp.int32) - radius

    # --- y phase: select window row y0+j per pixel, sum equal-x lanes via
    # the shared stride matrix S (both dense, no per-pixel operands on MXU).
    # VPU economy matters here (this masking is the kernel's bulk): cast
    # corr to the matmul dtype ONCE and compute the per-pixel row distance
    # ONCE, so each of the n+1 masked copies is a compare + select.
    yq = jax.lax.broadcasted_iota(jnp.int32, (TP, Q), 1) // Wp
    rel = yq - y0  # (TP, Q): window-row index of each lane, per pixel
    corr_m = corr.astype(mat_dt)
    zero = jnp.zeros((), mat_dt)
    S = (
        jax.lax.broadcasted_iota(jnp.int32, (Q, Wp), 0) % Wp
        == jax.lax.broadcasted_iota(jnp.int32, (Q, Wp), 1)
    ).astype(mat_dt)
    R = []
    for j in range(n + 1):
        masked = jnp.where(rel == j, corr_m, zero)
        R.append(
            jax.lax.dot_general(
                masked, S, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        )  # (TP, Wp)
    rows = [(1.0 - fy) * R[ky] + fy * R[ky + 1] for ky in range(n)]

    # --- x phase: bilinear column weights + lane reductions
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (TP, Wp), 1)
    ex = [(iota_x == x0 + j).astype(jnp.float32) for j in range(n + 1)]
    cols = []
    for kx in range(n):
        xw = (1.0 - fx) * ex[kx] + fx * ex[kx + 1]
        for ky in range(n):  # channel k = kx*n + ky (outer index walks x)
            cols.append(jnp.sum(rows[ky] * xw, axis=1, keepdims=True))
    out_ref[0] = jnp.concatenate(cols, axis=1).astype(out_ref.dtype)


def _pick_tile(P: int, Q: int, max_tp: int = 2048) -> int:
    """Pixel-tile size: as large as the fp32 correlation block (TP x Q)
    allows within ~6 MB of VMEM, at least 256.  Small pyramid levels were
    program-count-bound (the Q=256 level cost almost as much as the Q=1024
    one at a fixed 256-pixel tile)."""
    budget = max(256, (6 * 1024 * 1024) // (Q * 4))
    tp = 256
    while tp * 2 <= min(P, budget, max_tp):
        tp *= 2
    tp = min(tp, P)
    while P % tp:
        tp //= 2
    return tp


@functools.partial(
    jax.jit,
    static_argnames=(
        "Hp", "Wp", "radius", "group", "interpret", "packed", "transposed"
    ),
)
def corr_window_pallas(
    f1: jnp.ndarray,   # (B, P, C) query-side features
    f2: jnp.ndarray,   # (B/group, Q, C) pooled sampled-side features
    cen: jnp.ndarray,  # (B, P, 2) window centers in this level's cells (x, y)
    Hp: int,
    Wp: int,
    radius: int,
    group: int = 1,
    interpret: bool = False,
    packed: bool = False,
    transposed: bool = False,
) -> jnp.ndarray:
    """Windowed correlation for ONE pyramid level: (B, P, (2r+1)^2).

    group > 1: consecutive groups of `group` f1 streams share one f2 map
    (the eval pipeline folds hypotheses into the batch axis while the
    query-image features are common to all hypotheses of an instance) —
    the kernel just indexes f2 at b // group, so the tiled copy never
    exists in HBM."""
    assert not (packed and transposed), "pick one variant"
    B, P, C = f1.shape
    Q = f2.shape[1]
    n = 2 * radius + 1
    if transposed:
        # row window (see _window_kernel_transposed): K source rows per
        # tile; cap the tile to K/2 image rows so half the band is slack
        # for the flow's local y-spread before the full-Q fallback
        import os

        K = 16 if Hp > 16 and os.environ.get(
            "PICOPOSE_ROW_WINDOW", "1"
        ) != "0" else Hp
        TP = _pick_tile(P, Q, max_tp=(K // 2) * Wp if K < Hp else 2048)
        # centers transposed so the kernel's lane axis carries pixels; the
        # channel-major output is un-transposed here in XLA (tiny relayout)
        cent = jnp.swapaxes(cen, 1, 2)  # (B, 2, P)
        kernel = functools.partial(
            _window_kernel_transposed, Hp=Hp, Wp=Wp, radius=radius,
            scale=float(C) ** -0.5, K=K,
        )
        out = pl.pallas_call(
            kernel,
            grid=(B, P // TP),
            in_specs=[
                pl.BlockSpec((1, TP, C), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Q, C),
                             lambda b, t, group=group: (b // group, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, TP), lambda b, t: (b, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n * n, TP), lambda b, t: (b, 0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n * n, P), f1.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * P * min(K * Wp, Q) * C,
                bytes_accessed=(B * P * C + B * Q * C) * f1.dtype.itemsize,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(f1, f2, cent)
        return jnp.swapaxes(out, 1, 2)  # (B, P, nn)
    TP = _pick_tile(P, Q)
    common = dict(
        grid=(B, P // TP),
        out_specs=pl.BlockSpec((1, TP, n * n), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, n * n), f1.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * Q * (C + (n + 1) * Wp),
            bytes_accessed=(B * P * C + B * Q * C) * f1.dtype.itemsize,
            transcendentals=0,
        ),
        # sub-128-lane temps inflate the scoped-VMEM accounting past the
        # 16 MB default; the real working set is a few MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )
    in_specs = [
        pl.BlockSpec((1, TP, C), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Q, C), lambda b, t, group=group: (b // group, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TP, 2), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    if packed:
        M = n + 1
        # shared (Q, M*Wp) stride matrix routing lane (y, x) to output
        # block y % M, column x.  Constant per level; its BlockSpec index
        # never changes so Pallas DMAs it into VMEM exactly once.
        yq = jnp.arange(Q, dtype=jnp.int32)[:, None] // Wp
        xq = jnp.arange(Q, dtype=jnp.int32)[:, None] % Wp
        col = jnp.arange(M * Wp, dtype=jnp.int32)[None, :]
        s6 = ((yq % M == col // Wp) & (xq == col % Wp)).astype(
            jnp.float32 if f1.dtype == jnp.float32 else jnp.bfloat16
        )
        kernel = functools.partial(
            _window_kernel_packed, Hp=Hp, Wp=Wp, radius=radius,
            scale=float(C) ** -0.5,
        )
        in_specs.append(
            pl.BlockSpec((Q, M * Wp), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        return pl.pallas_call(kernel, in_specs=in_specs, **common)(
            f1, f2, cen, s6
        )
    kernel = functools.partial(
        _window_kernel, Hp=Hp, Wp=Wp, radius=radius, scale=float(C) ** -0.5
    )
    return pl.pallas_call(kernel, in_specs=in_specs, **common)(f1, f2, cen)
