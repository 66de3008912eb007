"""Pinhole projection / unprojection over batched points and depth maps.

Equivalent of utils/torch_utils.py:138-161 (unproject_points/project_points)
and utils/data_utils.py:97-115 (get_point_cloud_from_depth), rebuilt as pure
jnp functions with static shapes (nearest-pixel depth lookup via gather).
"""

from __future__ import annotations

import jax.numpy as jnp


def project_points(points3d: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) camera-frame points -> (..., N, 2) pixels.

    Matches utils/torch_utils.py:154-161.
    """
    p = jnp.einsum("...ij,...nj->...ni", K, points3d, precision="highest")
    return p[..., :2] / p[..., 2:3]


def unproject_points(
    points2d: jnp.ndarray, K: jnp.ndarray, depth: jnp.ndarray
) -> jnp.ndarray:
    """Lift (..., N, 2) pixels to camera-frame 3D using a (..., H, W) depth map.

    Depth is read at the clamped integer pixel (nearest lookup), matching
    utils/torch_utils.py:138-151: p3d = depth * K^-1 @ (x, y, 1).
    Invalid/-1 points simply read clamped depth; callers mask separately.
    """
    H, W = depth.shape[-2], depth.shape[-1]
    xi = jnp.clip(points2d[..., 0], 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(points2d[..., 1], 0, H - 1).astype(jnp.int32)
    d = jnp.take_along_axis(
        depth.reshape(*depth.shape[:-2], H * W),
        yi * W + xi,
        axis=-1,
    )
    ones = jnp.ones_like(points2d[..., :1])
    ph = jnp.concatenate([points2d, ones], axis=-1)
    K_inv = jnp.linalg.inv(K)
    rays = jnp.einsum("...ij,...nj->...ni", K_inv, ph, precision="highest")
    return rays * d[..., None]


def depth_to_points(
    depth: jnp.ndarray, K: jnp.ndarray
) -> jnp.ndarray:
    """Dense unprojection: (..., H, W) depth -> (..., H, W, 3) camera points.

    Equivalent of utils/data_utils.py:97-115 (get_point_cloud_from_depth):
    X = (x - cx) * z / fx, Y = (y - cy) * z / fy, Z = z.
    """
    H, W = depth.shape[-2], depth.shape[-1]
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    xs = jnp.arange(W, dtype=depth.dtype)
    ys = jnp.arange(H, dtype=depth.dtype)
    xmap, ymap = jnp.meshgrid(xs, ys, indexing="xy")
    bshape = (...,) if depth.ndim == 2 else None
    del bshape
    ex = lambda v: v[..., None, None]
    X = (xmap - ex(cx)) * depth / ex(fx)
    Y = (ymap - ex(cy)) * depth / ex(fy)
    return jnp.stack([X, Y, depth], axis=-1)


def transform_points(T: jnp.ndarray, points3d: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) rigid transform(s) to (..., N, 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, points3d, precision="highest") + t[..., None, :]
