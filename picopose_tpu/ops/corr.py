"""RAFT-style correlation: pyramid construction and windowed lookup.

Rebuilds model/stage3/raft_decoder.py:14-53 (CorrelationPyramid) and
utils/corr_lookup.py:69-134 (CorrLookup) — with a TPU-first twist:

The reference materializes the full 4D all-pairs volume (N*H*W, 1, H, W)
then avg-pools and grid-samples it.  At the 64x64 level that volume is
H^2 * W^2 = 16.8M entries per item (0.5 GB at batch 8, fp32) and its
construction is a (H*W)x(H*W)xC matmul.  But average pooling and bilinear
sampling are both LINEAR in feat2, so

    pool_i(corr)(p, q) == <feat1[p], pool_i(feat2)[q]> / sqrt(C)

and the windowed lookup can be computed directly: bilinear-sample the POOLED
feature map feat2 at each window location, then dot with feat1.  That's
L*(2r+1)^2*C FLOPs per query pixel instead of H*W*C — ~27x fewer FLOPs at
64x64 with radius 2 — and nothing bigger than the feature maps is ever
materialized.  `corr_lookup` (direct form) is the production path;
`correlation_pyramid` + `corr_lookup_pyramid` reproduce the reference
dataflow and pin the equivalence in tests/test_corr.py.

Window-channel ordering quirk (preserved for weight portability): the
reference builds window offsets with meshgrid(dy, dx) but ADDS them to an
(x, y) grid (utils/corr_lookup.py:116-126), so channel k = i*(2r+1)+j
samples offset (x + (i - r), y + (j - r)) — the outer window index walks x.
"""

from __future__ import annotations

import jax.numpy as jnp

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


def _neighborhood_dots(feat1, pooled, base, radius):
    """dot(feat1[p], pooled[base[p] + (dx, dy)]) for the (2r+2)^2 integer
    neighborhood, with zero for out-of-bounds (matching zeros padding).

    Returns (B, H, W, 2r+2, 2r+2) with axes (..., ny, nx)."""
    B, H, W, C = feat1.shape
    Hp, Wp = pooled.shape[1], pooled.shape[2]
    flat = pooled.reshape(B, Hp * Wp, C)
    cols = []
    for dy in range(0, 2 * radius + 2):  # base is already the top-left corner
        row = []
        for dx in range(0, 2 * radius + 2):
            xi = base[..., 0] + dx
            yi = base[..., 1] + dy
            ok = (xi >= 0) & (xi <= Wp - 1) & (yi >= 0) & (yi <= Hp - 1)
            idx = (
                jnp.clip(yi, 0, Hp - 1) * Wp + jnp.clip(xi, 0, Wp - 1)
            ).reshape(B, H * W)
            g = jnp.take_along_axis(flat, idx[..., None], axis=1)
            g = g.reshape(B, H, W, C)
            d = jnp.einsum("bhwc,bhwc->bhw", feat1, g, precision="highest")
            row.append(d * ok.astype(d.dtype))
        cols.append(jnp.stack(row, axis=-1))  # (B, H, W, 2r+2)
    return jnp.stack(cols, axis=-2)  # (B, H, W, ny, nx)


def corr_lookup(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    flow: jnp.ndarray,
    radius: int,
    num_levels: int,
) -> jnp.ndarray:
    """Direct windowed correlation lookup — no materialized volume.

    Args:
      feat1: (B, H, W, C) "template" features (the lookup's query side).
      feat2: (B, H, W, C) "real" features (the sampled side).
      flow:  (B, H, W, 2) current flow estimate, (x, y) channels.
      radius: window radius r; num_levels: pyramid depth L.

    Returns (B, H, W, L*(2r+1)^2), numerically equal to
    corr_lookup_pyramid(correlation_pyramid(feat1, feat2, L), flow, r).

    Memory shape: every window tap shares the SAME fractional offset (the
    integer window rides on one fractional centroid), so instead of
    gathering (B, H, W, K, C) feature windows we compute dot products on the
    (2r+2)^2 integer neighborhood once and combine them with the four shared
    bilinear weights — peak temp is (B, H, W, C) per gather instead of K of
    them (the naive einsum form OOMs a 16 GB chip at batch 80, 64^2, C=256).
    """
    B, H, W, C = feat1.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, dtype=jnp.float32))
    grid = pixel_coords_grid(H, W, flow.dtype) + flow
    n = 2 * radius + 1

    outs = []
    pooled = feat2
    for i in range(num_levels):
        if i > 0:
            pooled = avg_pool2d(pooled, 2)
        centroid = grid / (2.0**i)  # (B, H, W, 2)
        cl = jnp.floor(centroid)
        frac = centroid - cl  # (B, H, W, 2) shared across the window
        base = cl.astype(jnp.int32) - radius  # top-left neighborhood corner
        d = _neighborhood_dots(feat1, pooled, base, radius)  # (B,H,W,ny,nx)

        fx = frac[..., 0][..., None, None]
        fy = frac[..., 1][..., None, None]
        # out[oy, ox] over the (2r+1)^2 window from the 4 shifted slices
        d00 = d[..., :n, :n]
        d01 = d[..., :n, 1:]
        d10 = d[..., 1:, :n]
        d11 = d[..., 1:, 1:]
        win = (
            (1 - fx) * (1 - fy) * d00
            + fx * (1 - fy) * d01
            + (1 - fx) * fy * d10
            + fx * fy * d11
        )  # (B, H, W, oy, ox)
        # reference channel order: k = (ox_index)*(2r+1) + (oy_index)
        # (outer window index walks x — see module docstring)
        win = jnp.swapaxes(win, -1, -2).reshape(B, H, W, n * n)
        outs.append(win * scale)
    return jnp.concatenate(outs, axis=-1)
