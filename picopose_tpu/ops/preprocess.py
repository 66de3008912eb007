"""On-device batched preprocessing: full frames + masks/boxes -> model crops.

The host path (data/crops.py + native/fastpath.cpp) decodes detections one
at a time with cv2/C++ on the CPU; for SERVING that is one extra host hop
per frame between decode and device dispatch.  This module moves the whole
crop stage into the jit graph (the north-star layout in BASELINE.json):

    batch = preprocess_frame(frame_u8, masks_u8, bboxes, use_bbox)
    # -> real_rgb (B,S,S,3) CLIP-normalized BGR, real_mask, real_M, real_pts2d

TPU-first formulation: a square crop resized to S x S is SEPARABLE, so each
output image is two dense one-hot-weighted matmuls

    crop = Ry @ frame @ Rx^T          (per channel)

where Ry (S x H) carries each output row's two bilinear taps and Rx (S x W)
likewise for columns — built by comparing a broadcasted iota against the
per-detection source indices, exactly the trick the DINOv2 pos-embed resize
and the corr-window kernels use.  No gathers touch HBM: ~1.3 GFLOP per
detection of pure MXU work replaces 200k scattered reads.

Semantics are pinned to the host oracle bit-for-bit where integral and to
<=1e-3 where interpolation differs (tests/test_preprocess.py):
  * square bbox from the mask: data/crops.py::mask_square_bbox (reference
    utils/data_utils.py:131-196) — integer arithmetic, exact;
  * rgb: cv2.INTER_LINEAR center-aligned taps (src = (dst+.5)*scale-.5,
    border-replicate INSIDE the crop), BGR flip + CLIP normalize fused;
  * mask: cv2.INTER_NEAREST top-left convention (src = floor(dst*scale));
  * M / pts2d: data/crops.py::crop_matrix / grid_pts2d closed forms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CLIP_MEAN = jnp.array([0.48145466, 0.4578275, 0.40821073], jnp.float32)
CLIP_STD = jnp.array([0.26862954, 0.26130258, 0.27577711], jnp.float32)


def _bbox_from_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(H, W) binary mask -> (y1, y2, x1, x2) tight bbox (y2/x2 exclusive).

    argmax finds the first True; the reversed argmax the last.  Matches
    data/crops.py::mask_square_bbox's row/col scan before squareization."""
    rows = jnp.any(mask > 0, axis=1)
    cols = jnp.any(mask > 0, axis=0)
    H, W = mask.shape
    y1 = jnp.argmax(rows)
    y2 = H - jnp.argmax(rows[::-1])
    x1 = jnp.argmax(cols)
    x2 = W - jnp.argmax(cols[::-1])
    return jnp.stack([y1, y2, x1, x2]).astype(jnp.int32)


def _squareize(bbox: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Square a (y1, y2, x1, x2) box with the host's exact integer flow
    (data/crops.py::_squareize, size_ratio=1): side = min(max(h, w),
    min(H, W)), centered, then border-shifted in y-then-x order."""
    rmin, rmax, cmin, cmax = bbox[0], bbox[1], bbox[2], bbox[3]
    b = jnp.minimum(jnp.maximum(rmax - rmin, cmax - cmin), min(H, W))
    cy = (rmin + rmax) // 2
    cx = (cmin + cmax) // 2
    half = b // 2
    rmin, rmax = cy - half, cy + half
    cmin, cmax = cx - half, cx + half
    # the host clamps sequentially; b <= min(H, W) so one pass suffices
    rmax = jnp.where(rmin < 0, rmax - rmin, rmax)
    rmin = jnp.maximum(rmin, 0)
    cmax = jnp.where(cmin < 0, cmax - cmin, cmax)
    cmin = jnp.maximum(cmin, 0)
    rmin = jnp.where(rmax > H, rmin - (rmax - H), rmin)
    rmax = jnp.minimum(rmax, H)
    cmin = jnp.where(cmax > W, cmin - (cmax - W), cmin)
    cmax = jnp.minimum(cmax, W)
    return jnp.stack([rmin, rmax, cmin, cmax])


def _linear_weights(lo: jnp.ndarray, size: jnp.ndarray, n_src: int,
                    out: int) -> jnp.ndarray:
    """(out, n_src) bilinear one-hot row matrix for resizing the source
    span [lo, lo+size) to `out` samples, cv2.INTER_LINEAR semantics
    (center-aligned taps, border replicate at the span's edges)."""
    scale = size.astype(jnp.float32) / out
    dst = jnp.arange(out, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5  # in crop coords
    i0 = jnp.clip(jnp.floor(src), 0, size - 1).astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, size - 1)
    w1 = jnp.clip(src - jnp.floor(src), 0.0, 1.0)
    w1 = jnp.where(src < 0, 0.0, w1)  # replicate the first row/col
    a0, a1 = lo + i0, lo + i1  # absolute frame coords
    src_iota = jnp.arange(n_src, dtype=jnp.int32)[None, :]
    R = (src_iota == a0[:, None]) * (1.0 - w1)[:, None]
    # i1 may equal i0 at the right border: accumulate, don't overwrite
    R = R + (src_iota == a1[:, None]) * w1[:, None]
    # when i0 == i1 both terms hit the same column and sum to 1 — correct
    return R.astype(jnp.float32)


def _nearest_rows(lo: jnp.ndarray, size: jnp.ndarray, n_src: int,
                  out: int) -> jnp.ndarray:
    """(out, n_src) one-hot rows, cv2.INTER_NEAREST top-left convention
    (src = floor(dst * scale), clamped)."""
    scale = size.astype(jnp.float32) / out
    dst = jnp.arange(out, dtype=jnp.float32)
    src = jnp.clip(jnp.floor(dst * scale), 0, size - 1).astype(jnp.int32) + lo
    src_iota = jnp.arange(n_src, dtype=jnp.int32)[None, :]
    return (src_iota == src[:, None]).astype(jnp.float32)


def _crop_one(frame: jnp.ndarray, mask: jnp.ndarray, bbox: jnp.ndarray,
              out: int, pts: int, mask_rgb: bool, bgr_flip: bool):
    """One detection: square bbox -> normalized rgb crop, mask crop, M,
    pts2d.  frame is (H, W, 3) float32 in [0, 1], already BGR if bgr_flip."""
    H, W = frame.shape[:2]
    y1, y2, x1, x2 = bbox[0], bbox[1], bbox[2], bbox[3]
    hsz, wsz = y2 - y1, x2 - x1

    Ry = _linear_weights(y1, hsz, H, out)          # (out, H)
    Rx = _linear_weights(x1, wsz, W, out)          # (out, W)
    src = frame
    if mask_rgb:
        src = src * (mask > 0)[:, :, None]
    # (out,H) @ (H,W,3) @ (W,out): einsum keeps it as two MXU contractions
    crop = jnp.einsum("yh,hwc,xw->yxc", Ry, src, Rx,
                      precision=jax.lax.Precision.HIGHEST)
    rgb = (crop - CLIP_MEAN) / CLIP_STD

    Ny = _nearest_rows(y1, hsz, H, out)
    Nx = _nearest_rows(x1, wsz, W, out)
    m = jnp.einsum("yh,hw,xw->yx", Ny, mask.astype(jnp.float32), Nx,
                   precision=jax.lax.Precision.HIGHEST)

    # crop matrix M (data/crops.py::crop_matrix): square bbox -> scale s
    s = out / hsz.astype(jnp.float32)
    sx = out / wsz.astype(jnp.float32)
    M = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    M = M.at[0, 0].set(s).at[0, 2].set(-s * x1)
    M = M.at[1, 1].set(sx).at[1, 2].set(-sx * y1)

    # pts2d (data/crops.py::grid_pts2d): patch-center grid mapped through
    # M^-1 — closed form for the affine M above
    patch = out / pts
    cs = jnp.arange(pts, dtype=jnp.float32) * patch + patch / 2.0
    xx, yy = jnp.meshgrid(cs, cs)
    px = (xx + s * x1.astype(jnp.float32)) / s
    py = (yy + sx * y1.astype(jnp.float32)) / sx
    pts2d = jnp.stack([px, py], axis=-1)
    return rgb, m, M.astype(jnp.float32), pts2d


@partial(jax.jit, static_argnames=("out", "pts", "mask_rgb", "bgr_flip"))
def preprocess_frame(
    frame: jnp.ndarray,
    masks: jnp.ndarray,
    bboxes: jnp.ndarray | None = None,
    use_bbox: jnp.ndarray | None = None,
    out: int = 224,
    pts: int = 64,
    mask_rgb: bool = False,
    bgr_flip: bool = True,
) -> dict[str, jnp.ndarray]:
    """(H, W, 3) uint8 frame + (B, H, W) masks -> model-ready crop batch.

    bboxes (B, 4) xyxy as (y1, y2, x1, x2) with use_bbox (B,) selects the
    detector-box path per detection (the host's low-px-mask fallback,
    serve.py::_decode); both are squared on device.  Returns real_rgb
    (B, out, out, 3), real_mask (B, out, out), real_M (B, 3, 3),
    real_pts2d (B, pts, pts, 2) — numerically the host loader's layout."""
    H, W = frame.shape[:2]
    ff = frame.astype(jnp.float32) / 255.0
    if bgr_flip:
        ff = ff[..., ::-1]

    def per_det(mask, bbox, use_b):
        raw = _bbox_from_mask(mask)
        if bboxes is not None:
            raw = jnp.where(use_b, bbox, raw)
        sq = _squareize(raw, H, W)
        return _crop_one(ff, mask, sq, out, pts, mask_rgb, bgr_flip)

    if bboxes is None:
        bboxes = jnp.zeros((masks.shape[0], 4), jnp.int32)
        use_bbox = jnp.zeros((masks.shape[0],), bool)
    if use_bbox is None:
        use_bbox = jnp.ones((bboxes.shape[0],), bool)
    rgb, m, M, pts2d = jax.vmap(per_det)(masks, bboxes, use_bbox)
    return {"real_rgb": rgb, "real_mask": m, "real_M": M,
            "real_pts2d": pts2d}
