"""Static coordinate grids used across matching, flow and correspondence code.

Replaces utils/torch_utils.py:287-305 (init_points2d_*) and
utils/corr_lookup.py:9-26 (coords_grid) with (x, y)-channel-last variants.
"""

from __future__ import annotations

import jax.numpy as jnp


def patch_center_grid(size: int, patch: float, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) grid of patch-center pixel coordinates, channels (x, y).

    grid[r, c] = (patch*c + patch/2, patch*r + patch/2).  This is the
    (x, y)-consistent equivalent of init_points2d_torch
    (utils/torch_utils.py:297-305) — the reference enumerates a (y, x) grid
    then transposes the unflattening downstream, which cancels; see
    tests/test_grids.py for the equivalence argument.
    """
    n = int(round(size / patch))
    centers = (jnp.arange(n, dtype=dtype) * patch) + patch / 2.0
    xx, yy = jnp.meshgrid(centers, centers, indexing="xy")
    return jnp.stack([xx, yy], axis=-1)


def pixel_coords_grid(H: int, W: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) integer pixel-coordinate grid, channels (x, y).

    Channel-last equivalent of coords_grid (utils/corr_lookup.py:9-26, which
    returns (B, 2, H, W) with channel 0 = x).
    """
    xx, yy = jnp.meshgrid(
        jnp.arange(W, dtype=dtype), jnp.arange(H, dtype=dtype), indexing="xy"
    )
    return jnp.stack([xx, yy], axis=-1)
