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
    """
    B, H, W, C = feat1.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, dtype=jnp.float32))
    grid = pixel_coords_grid(H, W, flow.dtype) + flow
    offsets = _window_offsets(radius, flow.dtype)
    K = offsets.shape[0]

    outs = []
    pooled = feat2
    for i in range(num_levels):
        if i > 0:
            pooled = avg_pool2d(pooled, 2)
        centroid = grid / (2.0**i)  # (B, H, W, 2)
        # (B, H, W, K, 2) sample coords; flatten window into the W axis
        coords = centroid[:, :, :, None, :] + offsets
        sampled = bilinear_sample(
            pooled, coords.reshape(B, H, W * K, 2)
        ).reshape(B, H, W, K, C)
        outs.append(jnp.einsum("bhwc,bhwkc->bhwk", feat1, sampled, precision="highest") * scale)
    return jnp.concatenate(outs, axis=-1)
