"""Correspondence assembly between template and query patch grids.

Equivalent of utils/correspondence.py (compute_init_correspondences :10-26,
compute_stage3_correspondences :28-59), with the reference's (y, x) grid /
transposed-unflatten dance collapsed to its net effect (they cancel — see
picopose_tpu/geom/grids.py) and the dynamic `torch.nonzero` scatter replaced
by a static validity mask: XLA needs fixed shapes, so correspondences are
returned dense over the 64x64 grid with a boolean mask instead of -1-padded
compacted lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from picopose_tpu.geom.affine import apply_affine
from picopose_tpu.geom.grids import patch_center_grid, pixel_coords_grid
from picopose_tpu.ops.resize import resize_nearest


def init_correspondences(
    pred_Ms: jnp.ndarray, tem_mask: jnp.ndarray, grid: int = 16
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Seed a dense flow field from the stage-2 affine.

    Args:
      pred_Ms:  (B, 3, 3) template-crop -> query-crop affines.
      tem_mask: (B, Hc, Wc) template crop mask (crop resolution, e.g. 224).

    Returns (init_flow (B, g, g, 2), init_certainty (B, g, g, 1)):
      flow[r, c] = M @ patch_center(c, r) / patch - (c, r), zeroed to -grid
      where the template mask is empty (matching correspondence.py:16-26).
    """
    B = pred_Ms.shape[0]
    Hc = tem_mask.shape[1]
    patch = Hc / grid
    mask = resize_nearest(tem_mask, (grid, grid))  # (B, g, g)
    centers = patch_center_grid(Hc, patch).reshape(1, grid * grid, 2)
    pred = apply_affine(pred_Ms, jnp.broadcast_to(centers, (B, grid * grid, 2)))
    pred = (pred / patch).reshape(B, grid, grid, 2)
    coords = pixel_coords_grid(grid, grid)
    flow = pred * mask[..., None] - coords
    return flow, mask[..., None]


def final_correspondences(
    flow: jnp.ndarray, certainty: jnp.ndarray, threshold: float = 0.5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Threshold the finest flow into dense correspondences + validity.

    Args:
      flow:      (B, H, W, 2) template-grid -> query-grid flow.
      certainty: (B, H, W, 1) logits.

    Returns:
      tar_pts: (B, H*W, 2) query-grid coords (float; consumers floor them
               exactly like the reference's .long() cast at
               pose_recovery.py:76 via utils/torch_utils.py:257-284);
      valid:   (B, H*W) bool — sigmoid(certainty) > threshold AND the target
               strictly inside (0, H-1) x (0, W-1) (correspondence.py:36-40).

    The source points are implicitly the dense grid itself (the reference's
    compacted src list is just the grid positions of valid entries).
    """
    B, H, W, _ = flow.shape
    coords = pixel_coords_grid(H, W)
    tar = flow + coords
    inside = (
        (tar[..., 0] > 0) & (tar[..., 1] > 0)
        & (tar[..., 0] < H - 1) & (tar[..., 1] < W - 1)
    )
    conf = jax.nn.sigmoid(certainty[..., 0]) > threshold
    valid = inside & conf
    return tar.reshape(B, H * W, 2), valid.reshape(B, H * W)
