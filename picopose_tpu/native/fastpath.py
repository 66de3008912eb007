"""ctypes wrappers for the C++ host data path (native/fastpath.cpp).

Drop-in accelerated versions of the hot preprocessing steps; callers use
`accelerated()` to pick them when the library is built and fall back to the
numpy/cv2 implementations in picopose_tpu/data/ otherwise.
"""

from __future__ import annotations

import ctypes

import numpy as np

from picopose_tpu.native import load_library

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def accelerated() -> bool:
    """C++ fastpath available?  `PICOPOSE_NO_FASTPATH=1` forces the numpy
    fallbacks (A/B instrument for tools/loader_bench.py)."""
    import os

    if os.environ.get("PICOPOSE_NO_FASTPATH"):
        return False
    return load_library() is not None


def rle_to_mask(rle: dict) -> np.ndarray:
    """Native COCO RLE decode (compressed or raw counts) -> (h, w) uint8."""
    lib = load_library()
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        s = counts.encode("ascii") if isinstance(counts, str) else counts
        buf = np.zeros(len(s) + 1, np.int64)
        n = lib.rle_decode_counts(
            ctypes.c_char_p(s), ctypes.c_int(len(s)),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int(len(buf)),
        )
        counts = buf[:n]
    counts = np.ascontiguousarray(counts, np.int64)
    mask = np.zeros((h, w), np.uint8)
    lib.rle_counts_to_mask(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(len(counts)), ctypes.c_int(h), ctypes.c_int(w),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask


def mask_bbox(mask: np.ndarray) -> tuple[int, int, int, int] | None:
    lib = load_library()
    m = np.ascontiguousarray(mask, np.uint8)
    bbox = np.zeros(4, np.int32)
    ok = lib.mask_bbox(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(m.shape[0]), ctypes.c_int(m.shape[1]),
        bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return tuple(int(v) for v in bbox) if ok else None


def crop_resize_normalize(
    img: np.ndarray, bbox, out: int,
    mask: np.ndarray | None = None, mask_rgb: bool = False,
    bgr_flip: bool = True,
) -> np.ndarray:
    """uint8 (H, W, 3) -> normalized float32 (out, out, 3)."""
    lib = load_library()
    img = np.ascontiguousarray(img, np.uint8)
    y1, y2, x1, x2 = bbox
    dst = np.zeros((out, out, 3), np.float32)
    mptr = None
    if mask is not None:
        mask = np.ascontiguousarray(mask, np.uint8)
        mptr = mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.crop_resize_normalize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(img.shape[0]), ctypes.c_int(img.shape[1]),
        ctypes.c_int(y1), ctypes.c_int(y2), ctypes.c_int(x1), ctypes.c_int(x2),
        ctypes.c_int(out), ctypes.c_int(int(bgr_flip)),
        ctypes.c_int(int(mask_rgb)), mptr,
        CLIP_MEAN.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        CLIP_STD.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return dst


def crop_mask_nearest(mask: np.ndarray, bbox, out: int) -> np.ndarray:
    lib = load_library()
    mask = np.ascontiguousarray(mask, np.uint8)
    y1, y2, x1, x2 = bbox
    dst = np.zeros((out, out), np.float32)
    lib.crop_mask_nearest(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(mask.shape[0]), ctypes.c_int(mask.shape[1]),
        ctypes.c_int(y1), ctypes.c_int(y2), ctypes.c_int(x1), ctypes.c_int(x2),
        ctypes.c_int(out),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return dst
