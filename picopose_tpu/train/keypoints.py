"""Ground-truth keypoint correspondences between two posed RGB-D crops.

Equivalent of utils/keypoints.py (KeyPointSampler.sample_pts :120-205):
sample the 64x64 patch-center grid on both crops, lift to 3D through the
full-resolution depth maps, transfer through the relative pose, reproject
into the other crop, and mask at every step.  Static-shaped throughout:
validity is a boolean grid, not -1 sentinels.

Divergence note: the reference's final "mutual distance" filter compares
reprojected-src points in *crop* coordinates against tar grid points in
*original-image* coordinates (keypoints.py:186-196) — a units mismatch that
makes the <1000 px test an in-range sanity check rather than a mutual-NN
filter.  We implement the effective behavior: drop points whose reprojection
lands absurdly far (>1000 px) outside the crop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from picopose_tpu.geom.affine import apply_affine, inverse_crop_affine
from picopose_tpu.geom.grids import patch_center_grid
from picopose_tpu.geom.projection import project_points, transform_points, unproject_points

PATCH = 3.5  # 224 / 64 (utils/keypoints.py:96)


class KeypointData(NamedTuple):
    src_pts: jnp.ndarray  # (B, 64, 64, 2) src grid in patch units
    tar_pts: jnp.ndarray  # (B, 64, 64, 2) reprojection in tar crop, patch units
    valid: jnp.ndarray    # (B, 64, 64) bool


def _mask_lookup(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """valid where integer (x, y) is in-bounds and mask >= 0.5
    (Keypoint.mask, utils/keypoints.py:46-66)."""
    H, W = mask.shape[-2:]
    xi = points[..., 0].astype(jnp.int32)
    yi = points[..., 1].astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xi = jnp.clip(xi, 0, W - 1)
    yi = jnp.clip(yi, 0, H - 1)
    m = jnp.take_along_axis(
        mask.reshape(*mask.shape[:-2], H * W), yi * W + xi, axis=-1
    )
    return inb & (m >= 0.5)


def sample_keypoints(
    src_mask: jnp.ndarray,   # (B, 224, 224)
    src_M: jnp.ndarray,      # (B, 3, 3) crop affine
    src_K: jnp.ndarray,
    src_depth: jnp.ndarray,  # (B, H0, W0) full-image depth
    tar_mask: jnp.ndarray,
    tar_M: jnp.ndarray,
    tar_K: jnp.ndarray,
    T_src2tar: jnp.ndarray,  # (B, 4, 4)
    crop: int = 224,
    grid: int = 64,
) -> KeypointData:
    B = src_mask.shape[0]
    N = grid * grid
    pts_crop = patch_center_grid(crop, crop / grid).reshape(1, N, 2)
    pts_crop = jnp.broadcast_to(pts_crop, (B, N, 2))

    valid = _mask_lookup(pts_crop, src_mask)

    # crop -> original image
    pts_img = apply_affine(inverse_crop_affine(src_M), pts_crop)
    # lift through depth (clamped nearest lookup; invalid handled by masks)
    pts3d = unproject_points(pts_img, src_K, src_depth)
    valid &= pts3d[..., 2] > 1e-6  # no depth -> invalid
    # transfer + reproject into tar
    pts3d_tar = transform_points(T_src2tar, pts3d)
    reproj_img = project_points(pts3d_tar, tar_K)
    reproj_crop = apply_affine(tar_M, reproj_img)
    valid &= _mask_lookup(reproj_crop, tar_mask)
    # in-range sanity (see module docstring)
    valid &= (jnp.abs(reproj_crop) < crop + 1000.0).all(axis=-1)

    patch = crop / grid  # == PATCH (3.5) at the production 224/64 setting
    src = (pts_crop / patch).reshape(B, grid, grid, 2)
    tar = (reproj_crop / patch).reshape(B, grid, grid, 2)
    return KeypointData(src, tar, valid.reshape(B, grid, grid))
