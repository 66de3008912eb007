"""Torch-semantics image resizing on NHWC tensors.

The reference leans on F.interpolate in several places with *different*
semantics each time; subtle half-pixel mismatches are a known AR-killer
(SURVEY.md hard-part #3), so each variant is implemented explicitly and
pinned against torch CPU in tests/test_resize.py:

  * nearest (torch default 'nearest'): src = floor(dst * in/out)
    — mask downsampling (utils/matching.py:16,38; utils/loss_utils.py:151,197
      and correspondence.py:14);
  * bilinear align_corners=True: src = dst * (in-1)/(out-1)
    — flow/certainty upsampling (model/stage3/flow_decoder.py:89-92), DPT
      fusion upsampling (model/stage3/dpt.py:150-152);
  * bilinear align_corners=False: src = (dst+.5) * in/out - .5
    — (kept for completeness; the runtime paths above never use it).

All are gather+lerp formulations — XLA fuses them into the surrounding
elementwise work; no torch anywhere.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_rows(x: jnp.ndarray, idx: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.take(x, idx, axis=axis)


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """NHWC (or NHW) nearest resize with torch F.interpolate('nearest')
    index math: src = floor(dst * in/out)."""
    spatial_offset = 1 if x.ndim >= 4 else 1  # axis of H for (B, H, W, ...) / (B, H, W)
    H, W = x.shape[spatial_offset], x.shape[spatial_offset + 1]
    oh, ow = out_hw
    ih = jnp.floor(jnp.arange(oh) * (H / oh)).astype(jnp.int32)
    iw = jnp.floor(jnp.arange(ow) * (W / ow)).astype(jnp.int32)
    x = _gather_rows(x, ih, spatial_offset)
    x = _gather_rows(x, iw, spatial_offset + 1)
    return x


def _linear_weights(out_size: int, in_size: int, align_corners: bool):
    if align_corners and out_size > 1:
        src = jnp.arange(out_size) * ((in_size - 1) / (out_size - 1))
    elif align_corners:
        src = jnp.zeros((out_size,))
    else:
        src = (jnp.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(jnp.float32)
    return lo, hi, w_hi


def resize_bilinear(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """NHWC (or NHW) bilinear resize matching torch F.interpolate semantics."""
    ax = 1
    H, W = x.shape[ax], x.shape[ax + 1]
    oh, ow = out_hw
    ylo, yhi, wy = _linear_weights(oh, H, align_corners)
    xlo, xhi, wx = _linear_weights(ow, W, align_corners)

    def lerp(a, b, w, axis):
        shape = [1] * x.ndim
        shape[axis] = -1
        w = w.reshape(shape).astype(x.dtype)
        return a * (1 - w) + b * w

    top = lerp(_gather_rows(x, ylo, ax), _gather_rows(x, yhi, ax), wy, ax)
    return lerp(
        _gather_rows(top, xlo, ax + 1), _gather_rows(top, xhi, ax + 1), wx, ax + 1
    )


def avg_pool2d(x: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """NHWC average pool with kernel=stride=k (torch nn.AvgPool2d(k, k), used
    by the correlation pyramid at model/stage3/raft_decoder.py:27,49-51).
    Assumes H, W divisible by k (true for all 16/32/64 grids here)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // k, k, W // k, k, C)
    return x.mean(axis=(2, 4))
