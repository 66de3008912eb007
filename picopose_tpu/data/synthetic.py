"""Hermetic synthetic scenes: analytic sphere renderer (no render toolchain).

The reference validates only end-to-end through BOP data rendered offline by
Panda3D/Blender (SURVEY.md §4) — nothing hermetic exists.  This module fills
that gap: a textured sphere is ray-traced in closed form, giving RGB + depth
+ mask + exact poses for any viewpoint.  The texture is a function of the
MODEL-frame surface point, so multi-view appearance is genuinely consistent:
feature matching, GT keypoint reprojection, flow supervision and PnP all
exercise real geometry.

Used by tests/ (full-pipeline runs on CPU) and by bench.py /
__graft_entry__.py for driver-shaped inputs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

K_TEMPLATE = np.array(
    [[572.4114, 0.0, 320.0], [0.0, 573.57043, 240.0], [0.0, 0.0, 1.0]],
    np.float32,
)  # the reference's fixed template intrinsics (bop_test_dataset.py:57-59)

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _texture(p_model: np.ndarray, radius: float) -> np.ndarray:
    """Viewpoint-invariant procedural texture over model-frame points."""
    q = p_model / radius
    r = 0.5 + 0.45 * np.sin(9.0 * q[..., 0]) * np.cos(7.0 * q[..., 1])
    g = 0.5 + 0.45 * np.sin(8.0 * q[..., 1] + 1.3) * np.cos(6.0 * q[..., 2])
    b = 0.5 + 0.45 * np.sin(10.0 * q[..., 2] + 2.1) * np.cos(5.0 * q[..., 0])
    return np.stack([r, g, b], axis=-1)


def render_sphere(
    K: np.ndarray, pose: np.ndarray, radius: float, hw: tuple[int, int]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ray-trace a textured sphere.

    Args:
      K: (3, 3); pose: (4, 4) camera-from-model; radius in meters;
      hw: (H, W) image size.

    Returns (rgb (H, W, 3) in [0, 1], depth (H, W) meters (0 = background),
    mask (H, W) float)."""
    H, W = hw
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], axis=-1).astype(np.float64)
    d = pix @ np.linalg.inv(K).T
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)

    c = pose[:3, 3].astype(np.float64)
    # |s*d - c|^2 = r^2
    b = (d * c).sum(-1)
    disc = b**2 - (c @ c - radius**2)
    hit = disc > 0
    s = b - np.sqrt(np.maximum(disc, 0.0))
    hit &= s > 0
    p_cam = s[..., None] * d
    depth = np.where(hit, p_cam[..., 2], 0.0)

    R = pose[:3, :3].astype(np.float64)
    p_model = (p_cam - c) @ R  # R^T @ (p - t), row-vector form
    rgb = _texture(p_model, radius)
    shade = 0.6 + 0.4 * np.clip(
        -(p_cam - c) @ (c / np.linalg.norm(c)), 0, None
    ) / radius
    rgb = np.clip(rgb * shade[..., None], 0.0, 1.0)
    rgb = np.where(hit[..., None], rgb, 0.0)
    return rgb.astype(np.float32), depth.astype(np.float32), hit.astype(np.float32)


def square_crop_affine(mask: np.ndarray, out: int) -> np.ndarray:
    """Isotropic crop matrix M mapping image -> out x out crop around the
    mask's square bbox (the data layer's crop contract, SURVEY.md §3.4)."""
    ys, xs = np.where(mask > 0.5)
    if len(ys) == 0:
        return np.eye(3, dtype=np.float32)
    y1, y2, x1, x2 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    side = max(y2 - y1, x2 - x1)
    cy, cx = (y1 + y2) / 2.0, (x1 + x2) / 2.0
    s = out / side
    M = np.array(
        [[s, 0.0, out / 2.0 - s * cx], [0.0, s, out / 2.0 - s * cy], [0.0, 0.0, 1.0]],
        np.float32,
    )
    return M


def warp_crop(img: np.ndarray, M: np.ndarray, out: int) -> np.ndarray:
    """Apply crop affine with bilinear sampling (nearest for masks is fine
    too at test tolerances)."""
    import cv2

    return cv2.warpAffine(img, M[:2], (out, out), flags=cv2.INTER_LINEAR)


def clip_normalize(rgb: np.ndarray) -> np.ndarray:
    """CLIP mean/std normalization (bop_test_dataset.py:40-42).  NOTE: the
    reference also BGR-flips BOP images before normalizing
    (data_utils.py:245); synthetic textures have no color convention, so no
    flip here."""
    return (rgb - CLIP_MEAN) / CLIP_STD


@dataclass
class SyntheticView:
    rgb: np.ndarray          # (S, S, 3) normalized crop
    mask: np.ndarray         # (S, S)
    M: np.ndarray            # (3, 3)
    K: np.ndarray            # (3, 3)
    pose: np.ndarray         # (4, 4)
    full_depth: np.ndarray   # (H, W)
    depth_crop_pts: np.ndarray | None = None  # (g, g, 3) cam points, templates


def make_view(
    pose: np.ndarray,
    radius: float = 0.05,
    K: np.ndarray | None = None,
    image_hw: tuple[int, int] = (480, 640),
    crop: int = 224,
    pts_grid: int = 64,
) -> SyntheticView:
    K = K_TEMPLATE if K is None else K
    rgb, depth, mask = render_sphere(K, pose, radius, image_hw)
    M = square_crop_affine(mask, crop)
    rgb_c = warp_crop(rgb, M, crop)
    mask_c = (warp_crop(mask, M, crop) > 0.5).astype(np.float32)
    # camera-frame points on the pts_grid (template contract,
    # bop_test_dataset.py:230-233: depth -> 3D, crop, resize NEAREST)
    import cv2

    pts = _depth_to_points(depth, K)
    pts_c = cv2.warpAffine(pts, M[:2], (crop, crop), flags=cv2.INTER_NEAREST)
    pts_g = cv2.resize(pts_c, (pts_grid, pts_grid), interpolation=cv2.INTER_NEAREST)
    return SyntheticView(
        rgb=clip_normalize(rgb_c),
        mask=mask_c,
        M=M,
        K=K.astype(np.float32),
        pose=pose.astype(np.float32),
        full_depth=depth,
        depth_crop_pts=pts_g.astype(np.float32),
    )


def _depth_to_points(depth: np.ndarray, K: np.ndarray) -> np.ndarray:
    H, W = depth.shape
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    X = (xs - K[0, 2]) * depth / K[0, 0]
    Y = (ys - K[1, 2]) * depth / K[1, 1]
    return np.stack([X, Y, depth], axis=-1).astype(np.float32)


def make_pose(azimuth: float, elevation: float, z: float = 0.6) -> np.ndarray:
    """Camera-from-model pose looking at the object from (az, el)."""
    from scipy.spatial.transform import Rotation

    R = (
        Rotation.from_euler("x", elevation) * Rotation.from_euler("z", azimuth)
    ).as_matrix()
    pose = np.eye(4)
    pose[:3, :3] = R
    pose[:3, 3] = [0.0, 0.0, z]
    return pose


def query_pts2d(M: np.ndarray, crop: int = 224, grid: int = 64) -> np.ndarray:
    """Original-image coords of the crop's patch centers — the test loader's
    real_pts2d contract (bop_test_dataset.py:192-196)."""
    patch = crop / grid
    cs = np.arange(grid) * patch + patch / 2.0
    xx, yy = np.meshgrid(cs, cs)
    pts = np.stack([xx, yy, np.ones_like(xx)], -1) @ np.linalg.inv(M).T
    return (pts[..., :2] / pts[..., 2:]).astype(np.float32)
