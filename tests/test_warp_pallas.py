"""The Pallas warp kernel vs the XLA gather path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from picopose_tpu.geom.grids import pixel_coords_grid
from picopose_tpu.ops.pallas.warp import warp_pallas
from picopose_tpu.ops.sample import _warp_by_flow_xla, _warp_bwd


def _pallas_warp_interpret(feat, flow):
    B, H, W, C = feat.shape
    grid = pixel_coords_grid(H, W, dtype=flow.dtype) + flow
    out = warp_pallas(
        feat.reshape(B, H * W, C), grid.reshape(B, H * W, 2), H, W,
        interpret=True,
    )
    return out.reshape(B, H, W, C)


def test_kernel_matches_gather_path(rng):
    B, g, C = 2, 32, 64
    feat = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    flow = jnp.asarray((rng.normal(size=(B, g, g, 2)) * 4).astype(np.float32))
    ref = _warp_by_flow_xla(feat, flow)
    out = _pallas_warp_interpret(feat, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_out_of_range_is_zero(rng):
    B, g, C = 1, 16, 32
    feat = jnp.asarray(
        np.abs(rng.normal(size=(B, g, g, C))).astype(np.float32) + 1.0
    )
    flow = jnp.full((B, g, g, 2), 50.0, jnp.float32)
    out = _pallas_warp_interpret(feat, flow)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_row_window_and_fallback_paths(rng):
    """g=64 runs the K=16 row-windowed contraction; per-tile flows are
    crafted to hit (a) the in-band fast path (smooth small flow), (b) the
    full-Q fallback (y-spread >= K inside one tile), and (c) negative /
    past-edge taps whose zero-padding must hold in a shifted window."""
    B, g, C = 1, 64, 32
    feat = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    flow = np.zeros((B, g, g, 2), np.float32)
    flow[..., :] = rng.normal(size=(B, g, g, 2)).astype(np.float32) * 2  # (a)
    flow[0, 8:10, :, 1] = np.where(
        np.arange(g)[None, :] % 2 == 0, -30.0, 30.0
    )  # (b): spread 60 rows within one tile
    flow[0, 0:2, :, 1] = -3.5   # (c): taps below row 0
    flow[0, 62:64, :, 1] = 3.5  # (c): taps past the last row
    flow = jnp.asarray(flow)
    ref = _warp_by_flow_xla(feat, flow)
    out = _pallas_warp_interpret(feat, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_custom_vjp_matches_xla_grads(rng):
    B, g, C = 1, 16, 32
    feat = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    flow = jnp.asarray((rng.normal(size=(B, g, g, 2)) * 2).astype(np.float32))
    gout = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    ref = jax.vjp(_warp_by_flow_xla, feat, flow)[1](gout)
    ours = _warp_bwd(1, (feat, flow), gout)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_group_shared_feat_matches_tiled(rng):
    B2, k, g, C = 2, 3, 16, 32
    B = B2 * k
    feat = jnp.asarray(rng.normal(size=(B2, g, g, C)).astype(np.float32))
    flow = jnp.asarray((rng.normal(size=(B, g, g, 2)) * 3).astype(np.float32))
    ref = _warp_by_flow_xla(jnp.repeat(feat, k, axis=0), flow)
    got_x = _warp_by_flow_xla(feat, flow, group=k)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(ref))
    from picopose_tpu.ops.pallas.warp import warp_pallas as _wp

    grid = pixel_coords_grid(g, g, dtype=flow.dtype) + flow
    got_p = _wp(
        feat.reshape(B2, g * g, C), grid.reshape(B, g * g, 2), g, g,
        group=k, interpret=True,
    ).reshape(B, g, g, C)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref), atol=1e-4)
