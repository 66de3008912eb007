"""Ground-truth keypoint correspondences between two posed RGB-D crops.

Equivalent of utils/keypoints.py (KeyPointSampler.sample_pts :120-205):
sample the 64x64 patch-center grid on both crops, lift to 3D through the
full-resolution depth maps, transfer through the relative pose, reproject
into the other crop, and mask at every step.  Static-shaped throughout:
validity is a boolean grid, not -1 sentinels.

The reference's final "mutual distance" filter compares reprojected-src
points in *crop* coordinates against tar grid points in *original-image*
coordinates (keypoints.py:186-196) — a frame mismatch that makes the
<1000 px test mostly an in-range sanity check — and its tar-point validity
includes the TAR side's own crop->3D->src roundtrip.  Both quirks are
reproduced exactly (this function defines the training supervision, so the
valid set must match the reference's bit-for-bit;
tests/test_reference_parity.py pins it against the real sampler).
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
    tar_depth: jnp.ndarray | None = None,  # (B, H0, W0); None disables the
    # reference's tar-roundtrip mutual-distance filter (keypoints.py:177-196)
    crop: int = 224,
    grid: int = 64,
) -> KeypointData:
    B = src_mask.shape[0]
    N = grid * grid
    pts_crop = patch_center_grid(crop, crop / grid).reshape(1, N, 2)
    pts_crop = jnp.broadcast_to(pts_crop, (B, N, 2))

    # the reference's Keypoint.mask() writes back the .long()-TRUNCATED
    # coordinates (keypoints.py:46-67 setattr), so the whole 3D lift and the
    # returned patch coords run on integer crop pixels — reproduced with
    # trunc() here (toward-zero, == torch .long())
    pts_trunc = jnp.trunc(pts_crop)

    def roundtrip(mask_a, M_a, K_a, depth_a, mask_b, M_b, K_b, T_a2b):
        """Truncated crop grid on side a -> 3D -> side b crop; returns
        (valid, reproj_crop_b TRUNCATED, pts_original_a CLAMPED)."""
        v = _mask_lookup(pts_crop, mask_a)
        pts_img = apply_affine(inverse_crop_affine(M_a), pts_trunc)
        # reference unproject_points clamps the coords IN PLACE to the depth
        # bounds (torch_utils.py:144-145); the clamped values flow onward
        H0, W0 = depth_a.shape[-2], depth_a.shape[-1]
        pts_img = jnp.stack(
            [
                jnp.clip(pts_img[..., 0], 0, W0 - 1),
                jnp.clip(pts_img[..., 1], 0, H0 - 1),
            ],
            axis=-1,
        )
        pts3d = unproject_points(pts_img, K_a, depth_a)
        v &= pts3d[..., 2] > 1e-6  # zero depth projects to NaN -> invalid
        pts3d_b = transform_points(T_a2b, pts3d)
        reproj_img = project_points(pts3d_b, K_b)
        reproj_crop = apply_affine(M_b, reproj_img)
        v &= _mask_lookup(reproj_crop, mask_b)
        return v, jnp.trunc(reproj_crop), pts_img

    valid, reproj_crop, _ = roundtrip(
        src_mask, src_M, src_K, src_depth, tar_mask, tar_M, tar_K, T_src2tar
    )
    if tar_depth is not None:
        # the TAR side's own roundtrip validity + its grid in ORIGINAL image
        # coords, exactly as the reference's cdist filter uses them
        # (keypoints.py:186-196; see module docstring for the frame quirk)
        tar_valid, _, tar_img = roundtrip(
            tar_mask, tar_M, tar_K, tar_depth, src_mask, src_M, src_K,
            jnp.linalg.inv(T_src2tar),
        )
        # min over valid tar points of |reproj_src_CROP - tar_ORIGINAL|
        d2 = (
            (reproj_crop**2).sum(-1)[:, :, None]
            + (tar_img**2).sum(-1)[:, None, :]
            - 2.0
            * jnp.einsum(
                "bnc,bmc->bnm", reproj_crop, tar_img, precision="highest"
            )
        )
        d2 = jnp.where(tar_valid[:, None, :], d2, jnp.inf)
        valid &= jnp.min(d2, axis=-1) < 1000.0**2

    patch = crop / grid  # == PATCH (3.5) at the production 224/64 setting
    src = (pts_trunc / patch).reshape(B, grid, grid, 2)
    tar = (reproj_crop / patch).reshape(B, grid, grid, 2)
    return KeypointData(src, tar, valid.reshape(B, grid, grid))
