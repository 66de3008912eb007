"""COCO RLE mask decoding (replaces pycocotools, which the reference uses at
provider/bop_test_dataset.py:165-168, plus its custom fallback at
utils/data_utils.py:77-94).

Supports both encodings found in CNOS detection JSONs:
  * compressed RLE: counts is a LEB128-style ascii string (COCO format);
  * uncompressed RLE: counts is a list of run lengths.
Masks are Fortran-order (column-major), per the COCO spec.
"""

from __future__ import annotations

import numpy as np


def decode_compressed_counts(s: str | bytes) -> list[int]:
    """COCO's modified LEB128: 6 bits per char, offset 48, sign-extended,
    with delta coding from the count two positions back."""
    if isinstance(s, str):
        s = s.encode("ascii")
    counts: list[int] = []
    i = 0
    while i < len(s):
        x, k, more = 0, 0, True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k + 5)
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rle_to_mask(rle: dict) -> np.ndarray:
    """{'size': [h, w], 'counts': str|list} -> (h, w) uint8 mask.

    Dispatches to the C++ fastpath (native/fastpath.cpp) when built; the
    pure-numpy `rle_to_mask_py` is the fallback and the correctness oracle
    (tests/test_native.py pins them equal).
    """
    from picopose_tpu.native import fastpath

    if fastpath.accelerated():
        return fastpath.rle_to_mask(rle)
    return rle_to_mask_py(rle)


def rle_to_mask_py(rle: dict) -> np.ndarray:
    """Pure-numpy RLE decode (fallback + oracle for the native path)."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = decode_compressed_counts(counts)
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    flat = np.zeros(h * w, dtype=np.uint8)
    ends = np.cumsum(counts)
    starts = ends - counts
    # odd runs are foreground
    for s, e in zip(starts[1::2], ends[1::2]):
        flat[s:e] = 1
    if total != h * w:
        flat = flat[: h * w]
    return flat.reshape((w, h)).T  # column-major
