"""RAFT-style correlation: pyramid construction and windowed lookup.

Rebuilds model/stage3/raft_decoder.py:14-53 (CorrelationPyramid) and
utils/corr_lookup.py:69-134 (CorrLookup) — with a TPU-first twist:

The reference materializes the full 4D all-pairs volume (N*H*W, 1, H, W),
avg-pools it into a pyramid and grid-samples windows from it.  Avg pooling
and bilinear sampling are both LINEAR in feat2, so

    pool_i(corr)(p, q) == <feat1[p], pool_i(feat2)[q]> / sqrt(C)

which frees the lookup from the reference's dataflow entirely.  After
benchmarking four formulations on TPU (see `corr_lookup`'s docstring), the
production path recomputes per-pixel correlation rows on the MXU and
evaluates the bilinear window as two dense one-hot contractions — zero
HBM gathers.  `correlation_pyramid` + `corr_lookup_pyramid` reproduce the
reference dataflow and pin the equivalence in tests/test_ops.py.

Window-channel ordering quirk (preserved for weight portability): the
reference builds window offsets with meshgrid(dy, dx) but ADDS them to an
(x, y) grid (utils/corr_lookup.py:116-126), so channel k = i*(2r+1)+j
samples offset (x + (i - r), y + (j - r)) — the outer window index walks x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from picopose_tpu.geom.grids import pixel_coords_grid
from picopose_tpu.ops.resize import avg_pool2d
from picopose_tpu.ops.sample import bilinear_sample


def correlation_pyramid(
    feat1: jnp.ndarray, feat2: jnp.ndarray, num_levels: int
) -> list[jnp.ndarray]:
    """All-pairs correlation pyramid (reference dataflow; testing/debug only).

    feat1, feat2: (B, H, W, C).  Returns [(B*H*W, H/2^i, W/2^i, 1)] levels.
    Equivalent of CorrelationPyramid.forward (raft_decoder.py:30-53).
    """
    B, H, W, C = feat1.shape
    corr = jnp.einsum(
        "bpc,bqc->bpq",
        feat1.reshape(B, H * W, C),
        feat2.reshape(B, H * W, C),
        precision="highest",
    )
    corr = corr / jnp.sqrt(jnp.asarray(C, dtype=corr.dtype))
    corr = corr.reshape(B * H * W, H, W, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        pyramid.append(avg_pool2d(pyramid[-1], 2))
    return pyramid


def _window_offsets(radius: int, dtype=jnp.float32) -> jnp.ndarray:
    """((2r+1)^2, 2) offsets in (x, y) with the reference's channel order:
    outer index walks x (see module docstring)."""
    d = jnp.arange(-radius, radius + 1, dtype=dtype)
    ox, oy = jnp.meshgrid(d, d, indexing="ij")  # outer = x
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)


def corr_lookup_pyramid(
    pyramid: list[jnp.ndarray], flow: jnp.ndarray, radius: int
) -> jnp.ndarray:
    """Reference-dataflow lookup over a materialized pyramid.

    flow: (B, H, W, 2).  Returns (B, H, W, L*(2r+1)^2).
    Equivalent of CorrLookup.forward (utils/corr_lookup.py:100-134).
    """
    B, H, W, _ = flow.shape
    grid = pixel_coords_grid(H, W, flow.dtype) + flow  # (B, H, W, 2)
    offsets = _window_offsets(radius, flow.dtype)  # (K, 2)
    K = offsets.shape[0]

    outs = []
    for i, corr in enumerate(pyramid):
        centroid = grid.reshape(B * H * W, 1, 1, 2) / (2.0**i)
        coords = centroid + offsets.reshape(1, 1, K, 2)  # (BHW, 1, K, 2)
        sampled = bilinear_sample(corr, coords)  # (BHW, 1, K, 1)
        outs.append(sampled.reshape(B, H, W, K))
    return jnp.concatenate(outs, axis=-1)


def _corr_lookup_xla(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    flow: jnp.ndarray,
    radius: int,
    num_levels: int,
    group: int = 1,
) -> jnp.ndarray:
    """Windowed correlation lookup, TPU-shaped (gather-free).

    Args:
      feat1: (B, H, W, C) "template" features (the lookup's query side).
      feat2: (B, H, W, C) "real" features (the sampled side).
      flow:  (B, H, W, 2) current flow estimate, (x, y) channels.
      radius: window radius r; num_levels: pyramid depth L.

    Returns (B, H, W, L*(2r+1)^2), numerically equal to
    corr_lookup_pyramid(correlation_pyramid(feat1, feat2, L), flow, r).

    Dataflow (measured winner on TPU by ~8x over every gather formulation):
    recompute each level's correlation row per query pixel with an MXU
    matmul (FLOPs are cheap), then evaluate the bilinear window as TWO small
    dense contractions win = Ay @ corr_map @ Ax^T, where Ay/Ax are per-pixel
    (2r+1, Hp)/(2r+1, Wp) interpolation matrices holding the two bilinear
    taps per window row/column (built from iota comparisons on the VPU).
    No gathers anywhere: TPU HBM gathers ran at ~15-40 GB/s effective and
    dominated the whole stage-3 (0.5-1.7 s per batch across three gather
    designs); the dense form does ~15 GFLOP of VPU/MXU work instead and runs
    in ~60 ms at 64^2, batch 80.  Out-of-range taps hit empty one-hot rows,
    which reproduces grid_sample's padding_mode='zeros' exactly.

    The query-pixel axis is processed in lax.map chunks so the per-chunk
    correlation slab stays ~100 MB.
    """
    if group > 1:  # expand the shared sampled side (see corr_lookup)
        feat2 = jnp.repeat(feat2, group, axis=0)
    B, H, W, C = feat1.shape
    P = H * W
    n = 2 * radius + 1
    grid = pixel_coords_grid(H, W, flow.dtype) + flow
    f1 = feat1.reshape(B, P, C)
    dt = feat1.dtype

    chunk = P
    while chunk > 64 and B * chunk * P > (1 << 25):
        chunk //= 2
    n_chunks = P // chunk
    f1c = f1.reshape(B, n_chunks, chunk, C).swapaxes(0, 1)

    outs = []
    pooled = feat2
    for i in range(num_levels):
        if i > 0:
            pooled = avg_pool2d(pooled, 2)
        Hp, Wp = pooled.shape[1], pooled.shape[2]
        pooled_flat = pooled.reshape(B, Hp * Wp, C)
        scale = jnp.asarray(1.0 / np.sqrt(C), dt)
        cen = (grid / (2.0 ** i)).reshape(B, n_chunks, chunk, 2).swapaxes(0, 1)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Hp), 2)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Wp), 2)

        def level_chunk(args, Hp=Hp, Wp=Wp, pooled_flat=pooled_flat,
                        scale=scale, iota_h=iota_h, iota_w=iota_w):
            f1k, ck = args  # (B, chunk, C), (B, chunk, 2)
            corr = jnp.einsum(
                "bpc,bqc->bpq", f1k, pooled_flat, precision="highest"
            ).astype(dt) * scale
            corr = corr.reshape(B * chunk, Hp, Wp)

            ck = ck.reshape(B * chunk, 2)
            cl = jnp.floor(ck)
            fr = ck - cl
            x0 = cl[:, 0].astype(jnp.int32) - radius
            y0 = cl[:, 1].astype(jnp.int32) - radius
            off = jnp.arange(n, dtype=jnp.int32)[None, :, None]

            def interp_matrix(base, frac, iota):
                tap = base[:, None, None] + off
                return (
                    (1.0 - frac[:, None, None]) * (iota == tap)
                    + frac[:, None, None] * (iota == tap + 1)
                ).astype(dt)

            Ay = interp_matrix(y0, fr[:, 1], iota_h)  # (Pc, n, Hp)
            Ax = interp_matrix(x0, fr[:, 0], iota_w)  # (Pc, n, Wp)
            # precision='highest' is required for CORRECTNESS, not speed:
            # default-precision einsum truncates fp32 operands to bf16
            # (~0.3% error in every window tap); these contractions are
            # tiny, so the fp32 matmul cost is noise.
            t1 = jnp.einsum("poj,pji->poi", Ay, corr, precision="highest")
            win = jnp.einsum(
                "poi,pxi->pox", t1, Ax, precision="highest"
            )  # (Pc, oy, ox)
            return win.reshape(B, chunk, n, n)

        if n_chunks == 1:
            win = level_chunk((f1c[0], cen[0]))[:, :, None]
            win = win.reshape(B, P, n, n)
        else:
            win = jax.lax.map(level_chunk, (f1c, cen))
            win = win.swapaxes(0, 1).reshape(B, P, n, n)
        # reference channel order: k = ox*(2r+1) + oy (outer index walks x)
        win = jnp.swapaxes(win, -1, -2).reshape(B, H, W, n * n)
        outs.append(win)
    return jnp.concatenate(outs, axis=-1)


# pinned at first trace; see _corr_lookup_pallas_impl docstring
_CORR_VARIANT = None


def _corr_lookup_pallas_impl(feat1, feat2, flow, radius, num_levels, group=1):
    """Fused-kernel lookup: pooling in XLA, one Pallas call per level.

    Numerically equivalent to _corr_lookup_xla up to fp32-vs-bf16 window
    arithmetic (the kernel keeps the correlation block fp32 through the
    window evaluation; the XLA path rounds it to the feature dtype first).

    Kernel variant is $PICOPOSE_CORR_VARIANT, read ONCE at first trace and
    pinned for the process lifetime: the jit cache does not key on it, so a
    mid-process env change could otherwise silently keep serving the old
    kernel on cached shapes.  A/B runs (tools/micro_bench.py case_corr_ab)
    pass the variant explicitly per call instead.  ('transposed' default —
    measured ~0 ms marginal per 3-level lookup at the faithful shapes vs
    ~20 ms per-row / ~42 ms packed, tools/micro_bench.py case_corr_ab:
    the MXU does only the correlation matmul at full lane width and the
    bilinear window runs as VPU masked reductions).
    """
    from picopose_tpu.ops.pallas.corr import corr_window_pallas

    global _CORR_VARIANT
    if _CORR_VARIANT is None:
        import os

        _CORR_VARIANT = os.environ.get("PICOPOSE_CORR_VARIANT", "transposed")
    variant = _CORR_VARIANT
    B, H, W, C = feat1.shape
    B2 = feat2.shape[0]
    P = H * W
    n = 2 * radius + 1
    grid = pixel_coords_grid(H, W, flow.dtype) + flow
    f1 = feat1.reshape(B, P, C)
    outs = []
    pooled = feat2
    for i in range(num_levels):
        if i > 0:
            pooled = avg_pool2d(pooled, 2)
        Hp, Wp = pooled.shape[1], pooled.shape[2]
        cen = (grid / (2.0 ** i)).reshape(B, P, 2)
        win = corr_window_pallas(
            f1, pooled.reshape(B2, Hp * Wp, C), cen, Hp, Wp, radius,
            group=group, packed=(variant == "packed"),
            transposed=(variant == "transposed"),
        )
        outs.append(win.reshape(B, H, W, n * n))
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _corr_lookup_pallas(feat1, feat2, flow, radius, num_levels, group=1):
    return _corr_lookup_pallas_impl(
        feat1, feat2, flow, radius, num_levels, group
    )


def _corr_lookup_pallas_fwd(feat1, feat2, flow, radius, num_levels, group):
    out = _corr_lookup_pallas_impl(
        feat1, feat2, flow, radius, num_levels, group
    )
    return out, (feat1, feat2, flow)


def _corr_lookup_pallas_bwd(radius, num_levels, group, res, g):
    # Rematerialized backward through the differentiable XLA formulation
    # (the Pallas forward is opaque to autodiff; same pattern as
    # ops/attention.py — an undifferentiable kernel broke TPU training in
    # round 1, docs/PERF.md).
    feat1, feat2, flow = res
    _, vjp = jax.vjp(
        lambda a, b, c: _corr_lookup_xla(a, b, c, radius, num_levels, group),
        feat1, feat2, flow,
    )
    return vjp(g)


_corr_lookup_pallas.defvjp(_corr_lookup_pallas_fwd, _corr_lookup_pallas_bwd)


def corr_lookup(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    flow: jnp.ndarray,
    radius: int,
    num_levels: int,
    impl: str | None = None,
    group: int = 1,
) -> jnp.ndarray:
    """Windowed correlation lookup — fused Pallas kernel on TPU, XLA
    one-hot contraction elsewhere.  See _corr_lookup_xla for the shared
    semantics and the formulation benchmarks; ops/pallas/corr.py for the
    kernel.  impl: 'auto' | 'pallas' | 'xla' (default: $PICOPOSE_CORR_IMPL
    or 'auto' — the env hook exists for A/B profiling).

    group: feat2 may carry feat1.shape[0] // group entries, each shared by
    `group` consecutive feat1 streams (hypotheses folded into the batch
    axis share the query-image features) — the kernel indexes it directly,
    the XLA path expands it."""
    if impl is None:
        import os

        impl = os.environ.get("PICOPOSE_CORR_IMPL", "auto")
    if impl == "pallas" or (
        impl == "auto" and jax.devices()[0].platform == "tpu"
    ):
        return _corr_lookup_pallas(
            feat1, feat2, flow, radius, num_levels, group
        )
    return _corr_lookup_xla(feat1, feat2, flow, radius, num_levels, group)
