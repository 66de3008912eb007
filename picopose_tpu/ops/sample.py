"""Bilinear grid sampling (the reference's F.grid_sample surface).

Equivalent of utils/corr_lookup.py:29-65 (`bilinear_sample`) with the
align_corners=True + zero-padding semantics the runtime uses everywhere
(CorrLookup default align_corners=True, utils/corr_lookup.py:89-98; flow
warping at model/stage3/flow_decoder.py:49-56).  The reference normalizes
pixel coords to [-1, 1] and calls F.grid_sample; normalizing with
align_corners=True then un-normalizing is the identity, so we sample directly
at pixel coordinates:

  out[b, j, i] = sum over 4 neighbors of grid[b, j, i] = (x, y), with
  zero contribution from out-of-bounds neighbors (padding_mode='zeros').

Implemented as flat gathers + lerp — this lowers to efficient dynamic-gather
on TPU and fuses with surrounding elementwise ops.  Pinned against torch
F.grid_sample in tests/test_sample.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from picopose_tpu.geom.grids import pixel_coords_grid


def bilinear_sample(feat: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample NHWC `feat` at (x, y) pixel locations `grid` (B, Ho, Wo, 2).

    Returns (B, Ho, Wo, C).  Out-of-bounds reads contribute zero
    (padding_mode='zeros'); coordinates are in align_corners=True pixel space
    (0 .. size-1 at pixel centers).
    """
    B, H, W, C = feat.shape
    x, y = grid[..., 0], grid[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx = (x - x0).astype(feat.dtype)
    wy = (y - y0).astype(feat.dtype)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = feat.reshape(B, H * W, C)
        idx = (yc * W + xc).reshape(B, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(*xi.shape, C)
        return vals * valid[..., None].astype(feat.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _warp_by_flow_xla(
    feat: jnp.ndarray, flow: jnp.ndarray, group: int = 1
) -> jnp.ndarray:
    if group > 1:
        feat = jnp.repeat(feat, group, axis=0)
    B, H, W, _ = flow.shape
    grid = pixel_coords_grid(H, W, dtype=flow.dtype) + flow
    return bilinear_sample(feat, grid)


def _warp_by_flow_pallas_impl(feat, flow, group=1):
    from picopose_tpu.ops.pallas.warp import warp_pallas

    B2, H, W, C = feat.shape
    B = flow.shape[0]
    grid = pixel_coords_grid(H, W, dtype=flow.dtype) + flow
    out = warp_pallas(
        feat.reshape(B2, H * W, C), grid.reshape(B, H * W, 2), H, W,
        group=group,
    )
    return out.reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _warp_by_flow_pallas(feat, flow, group=1):
    return _warp_by_flow_pallas_impl(feat, flow, group)


def _warp_fwd(feat, flow, group):
    return _warp_by_flow_pallas_impl(feat, flow, group), (feat, flow)


def _warp_bwd(group, res, g):
    # rematerialized backward through the differentiable gather path (the
    # Pallas forward is opaque to autodiff; pattern of ops/corr.py)
    feat, flow = res
    _, vjp = jax.vjp(
        lambda a, b: _warp_by_flow_xla(a, b, group), feat, flow
    )
    return vjp(g)


_warp_by_flow_pallas.defvjp(_warp_fwd, _warp_bwd)


def warp_by_flow(
    feat: jnp.ndarray, flow: jnp.ndarray, impl: str = "auto", group: int = 1
) -> jnp.ndarray:
    """Warp NHWC `feat` by (B, H, W, 2) flow: out[p] = feat[p + flow[p]].

    Equivalent of FlowDecoder.feature_sample (model/stage3/flow_decoder.py:
    49-56): identity grid plus flow, bilinear, zeros padding.  On TPU the
    sample runs as a dense one-hot matmul kernel (ops/pallas/warp.py — HBM
    gathers measured ~2x slower); elsewhere as gather+lerp.

    group: feat may carry flow.shape[0] // group maps, each shared by
    `group` consecutive flow streams (folded hypotheses)."""
    import jax as _jax

    if impl == "pallas" or (
        impl == "auto" and _jax.devices()[0].platform == "tpu"
    ):
        return _warp_by_flow_pallas(feat, flow, group)
    return _warp_by_flow_xla(feat, flow, group)
