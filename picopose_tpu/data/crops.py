"""Crop / normalize preprocessing shared by the test and train loaders.

Semantics pinned to the reference (AR parity dies here first — SURVEY.md
hard-part #5):
  * square bbox from the mask, clamped at image borders
    (utils/data_utils.py:131-196);
  * RGB loaded then channel-FLIPPED to BGR before normalization
    (data_utils.py:245, training_dataset.py:217) — the reference network
    consumes BGR CLIP-normalized crops, so we do too;
  * rgb resize INTER_LINEAR, mask/points INTER_NEAREST
    (data_utils.py:248-249);
  * CLIP mean/std (bop_test_dataset.py:40-42);
  * crop matrix M = M_resize @ M_crop with the reference's row/col
    convention (bop_test_dataset.py:181-189).
"""

from __future__ import annotations

import numpy as np
import cv2

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def mask_square_bbox(mask: np.ndarray, size_ratio: float = 1.0) -> tuple[int, int, int, int]:
    """(y1, y2, x1, x2) square bbox around the mask (data_utils.py:131-165)."""
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    rmax += 1
    cmax += 1
    return _squareize((rmin, rmax, cmin, cmax), mask.shape, size_ratio)


def square_bbox(bbox, img_hw, size_ratio: float = 1.0):
    """Square a (y1, y2, x1, x2) box (data_utils.py:167-196)."""
    return _squareize(bbox, img_hw, size_ratio)


def _squareize(bbox, img_hw, size_ratio):
    H, W = img_hw
    rmin, rmax, cmin, cmax = bbox
    b = min(max(rmax - rmin, cmax - cmin), min(H, W)) * size_ratio
    cy, cx = int((rmin + rmax) / 2), int((cmin + cmax) / 2)
    rmin, rmax = cy - int(b / 2), cy + int(b / 2)
    cmin, cmax = cx - int(b / 2), cx + int(b / 2)
    if rmin < 0:
        rmax += -rmin
        rmin = 0
    if cmin < 0:
        cmax += -cmin
        cmin = 0
    if rmax > H:
        rmin -= rmax - H
        rmax = H
    if cmax > W:
        cmin -= cmax - W
        cmax = W
    return int(rmin), int(rmax), int(cmin), int(cmax)


def crop_matrix(bbox, out: int) -> np.ndarray:
    """M mapping original-image (x, y) -> crop coords for a square bbox
    (bop_test_dataset.py:181-189; the row/col scales coincide because the
    bbox is square)."""
    y1, y2, x1, x2 = bbox
    M_crop = np.array([[1, 0, -x1], [0, 1, -y1], [0, 0, 1]], np.float32)
    M_resize = np.array(
        [[out / (y2 - y1), 0, 0], [0, out / (x2 - x1), 0], [0, 0, 1]], np.float32
    )
    return M_resize @ M_crop


def crop_and_normalize_rgb(
    rgb: np.ndarray, bbox, out: int, mask: np.ndarray | None = None,
    mask_rgb: bool = False, bgr_flip: bool = True,
) -> np.ndarray:
    """uint8 RGB image -> (out, out, 3) float32 normalized crop.

    Dispatches to the C++ fastpath when built (native/fastpath.cpp); the
    cv2/numpy `crop_and_normalize_rgb_py` is the fallback and oracle
    (tests/test_native.py; measured max deviation 1.3e-4 normalized units).
    """
    from picopose_tpu.native import fastpath

    if rgb.dtype == np.uint8 and fastpath.accelerated():
        return fastpath.crop_resize_normalize(
            rgb[..., :3], bbox, out, mask=mask, mask_rgb=mask_rgb,
            bgr_flip=bgr_flip,
        )
    return crop_and_normalize_rgb_py(rgb, bbox, out, mask, mask_rgb, bgr_flip)


def crop_and_normalize_rgb_py(
    rgb: np.ndarray, bbox, out: int, mask: np.ndarray | None = None,
    mask_rgb: bool = False, bgr_flip: bool = True,
) -> np.ndarray:
    """cv2/numpy crop path (fallback + oracle for the native fastpath)."""
    y1, y2, x1, x2 = bbox
    patch = rgb[..., ::-1] if bgr_flip else rgb
    patch = patch[y1:y2, x1:x2, :3] / 255.0
    if mask_rgb and mask is not None:
        patch = patch * (mask[y1:y2, x1:x2, None] > 0)
    patch = cv2.resize(patch, (out, out), interpolation=cv2.INTER_LINEAR)
    return ((patch - CLIP_MEAN) / CLIP_STD).astype(np.float32)


def crop_mask(mask: np.ndarray, bbox, out: int) -> np.ndarray:
    y1, y2, x1, x2 = bbox
    m = mask[y1:y2, x1:x2].astype(np.int32)
    return cv2.resize(m, (out, out), interpolation=cv2.INTER_NEAREST).astype(np.float32)


def depth_to_points(depth: np.ndarray, K: np.ndarray, bbox=None) -> np.ndarray:
    """(H, W) depth -> (H', W', 3) camera points, optional bbox crop
    (data_utils.py:97-115)."""
    H, W = depth.shape
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    if bbox is not None:
        y1, y2, x1, x2 = bbox
        depth = depth[y1:y2, x1:x2]
        xs, ys = xs[y1:y2, x1:x2], ys[y1:y2, x1:x2]
    X = (xs - K[0, 2]) * depth / K[0, 0]
    Y = (ys - K[1, 2]) * depth / K[1, 1]
    return np.stack([X, Y, depth], axis=-1).astype(np.float32)


def grid_pts2d(M: np.ndarray, crop: int = 224, grid: int = 64) -> np.ndarray:
    """Original-image coords of the crop's patch-center grid
    (bop_test_dataset.py:192-196)."""
    patch = crop / grid
    cs = (np.arange(grid) * patch + patch / 2.0).astype(np.float64)
    xx, yy = np.meshgrid(cs, cs)
    pts = np.stack([xx, yy, np.ones_like(xx)], -1) @ np.linalg.inv(M).T
    return (pts[..., :2] / pts[..., 2:]).astype(np.float32)
