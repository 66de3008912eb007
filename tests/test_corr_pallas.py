"""The fused Pallas correlation-window kernel vs the XLA one-hot path.

Runs the kernel in interpret mode (tests force the CPU backend, see
conftest.py); the TPU-compiled path is exercised by tools/micro_bench.py
and the flagship bench on the device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from picopose_tpu.geom.grids import pixel_coords_grid
from picopose_tpu.ops.corr import (
    _corr_lookup_pallas_bwd,
    _corr_lookup_xla,
    corr_lookup_pyramid,
    correlation_pyramid,
)
from picopose_tpu.ops.pallas.corr import corr_window_pallas
from picopose_tpu.ops.resize import avg_pool2d


def _pallas_lookup_interpret(
    f1, f2, flow, radius, num_levels, variant="packed"
):
    """The _corr_lookup_pallas_impl loop with interpret=True kernels."""
    B, H, W, C = f1.shape
    P = H * W
    n = 2 * radius + 1
    grid = pixel_coords_grid(H, W, flow.dtype) + flow
    outs = []
    pooled = f2
    for i in range(num_levels):
        if i > 0:
            pooled = avg_pool2d(pooled, 2)
        Hp, Wp = pooled.shape[1], pooled.shape[2]
        cen = (grid / (2.0 ** i)).reshape(B, P, 2)
        win = corr_window_pallas(
            f1.reshape(B, P, C), pooled.reshape(B, Hp * Wp, C), cen,
            Hp, Wp, radius, interpret=True,
            packed=(variant == "packed"),
            transposed=(variant == "transposed"),
        )
        outs.append(win.reshape(B, H, W, n * n))
    return jnp.concatenate(outs, axis=-1)


@pytest.mark.parametrize(
    "g,num_levels,variant",
    [(16, 1, "packed"), (16, 2, "packed"), (32, 3, "packed"),
     (16, 2, "per-row"), (32, 3, "per-row"),
     (16, 2, "transposed"), (32, 3, "transposed")],
)
def test_kernel_matches_xla_path(rng, g, num_levels, variant):
    B, C, r = 2, 64, 2
    f1 = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    fl = jnp.asarray((rng.normal(size=(B, g, g, 2)) * 3).astype(np.float32))
    ref = _corr_lookup_xla(f1, f2, fl, r, num_levels)
    out = _pallas_lookup_interpret(f1, f2, fl, r, num_levels, variant=variant)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4
    )


def test_transposed_row_window_and_fallback(rng):
    """g=64 runs the transposed kernel's K=16 row window; flows are crafted
    to hit the in-band path, the full-Q fallback (spread >= K in one tile),
    and window centers whose taps cross the image borders."""
    B, g, C, r = 1, 64, 64, 2
    f1 = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    fl = np.asarray(rng.normal(size=(B, g, g, 2)) * 2, np.float32)
    fl[0, 12:14, :, 1] = np.where(
        np.arange(g)[None, :] % 2 == 0, -25.0, 25.0
    )  # spread > K within one tile -> exact fallback
    fl[0, 0:2, :, 1] = -4.0   # taps below row 0
    fl[0, 62:64, :, 1] = 4.0  # taps past the last row
    fl = jnp.asarray(fl)
    ref = _corr_lookup_xla(f1, f2, fl, r, 1)
    out = _pallas_lookup_interpret(f1, f2, fl, r, 1, variant="transposed")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4
    )


def test_kernel_matches_reference_dataflow(rng):
    """Direct pin against the materialized-pyramid oracle (the reference's
    CorrelationPyramid + CorrLookup dataflow, utils/corr_lookup.py:100-134),
    including the kx-major window channel order."""
    B, g, C, r, L = 2, 16, 48, 2, 2
    f1 = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    fl = jnp.asarray((rng.normal(size=(B, g, g, 2)) * 2).astype(np.float32))
    oracle = corr_lookup_pyramid(correlation_pyramid(f1, f2, L), fl, r)
    out = _pallas_lookup_interpret(f1, f2, fl, r, L)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(oracle), atol=2e-4, rtol=1e-4
    )


@pytest.mark.parametrize("variant", ["packed", "per-row", "transposed"])
def test_out_of_range_taps_are_zero(rng, variant):
    """Flow pushing the window fully outside must give zeros
    (grid_sample padding_mode='zeros')."""
    B, g, C, r = 1, 16, 32, 2
    f1 = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    f2 = jnp.asarray(
        np.abs(rng.normal(size=(B, g, g, C))).astype(np.float32) + 1.0
    )
    fl = jnp.full((B, g, g, 2), 100.0, jnp.float32)  # centers way outside
    out = _pallas_lookup_interpret(f1, f2, fl, r, 1, variant=variant)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_custom_vjp_matches_xla_grads(rng):
    """The rematerialized backward must equal the direct XLA vjp."""
    B, g, C, r, L = 1, 16, 32, 2, 2
    f1 = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    fl = jnp.asarray((rng.normal(size=(B, g, g, 2)) * 2).astype(np.float32))
    n = 2 * r + 1
    gout = jnp.asarray(
        rng.normal(size=(B, g, g, L * n * n)).astype(np.float32)
    )
    ref = jax.vjp(
        lambda a, b, c: _corr_lookup_xla(a, b, c, r, L), f1, f2, fl
    )[1](gout)
    ours = _corr_lookup_pallas_bwd(r, L, 1, (f1, f2, fl), gout)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("variant", ["per-row", "packed", "transposed"])
def test_group_shared_feat2_matches_tiled(rng, variant):
    """group=k with B/k feat2 maps must equal tiling feat2 k-fold.

    Parametrized over every kernel variant: production eval runs the
    transposed kernel with group=hyp, so the hypothesis-sharing index map
    (f2 BlockSpec b//group) must be covered for each variant, not just the
    per-row one."""
    B2, k, g, C, r, L = 2, 3, 16, 32, 2, 2
    B = B2 * k
    f1 = jnp.asarray(rng.normal(size=(B, g, g, C)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(B2, g, g, C)).astype(np.float32))
    fl = jnp.asarray((rng.normal(size=(B, g, g, 2)) * 2).astype(np.float32))
    f2_tiled = jnp.repeat(f2, k, axis=0)
    ref = _corr_lookup_xla(f1, f2_tiled, fl, r, L)
    # xla path with group
    got_x = _corr_lookup_xla(f1, f2, fl, r, L, group=k)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(ref))
    # pallas kernel with group (interpret)
    from picopose_tpu.ops.resize import avg_pool2d as _pool

    P = g * g
    n = 2 * r + 1
    grid = pixel_coords_grid(g, g, fl.dtype) + fl
    outs = []
    pooled = f2
    for i in range(L):
        if i > 0:
            pooled = _pool(pooled, 2)
        Hp, Wp = pooled.shape[1], pooled.shape[2]
        cen = (grid / (2.0 ** i)).reshape(B, P, 2)
        outs.append(
            corr_window_pallas(
                f1.reshape(B, P, C), pooled.reshape(B2, Hp * Wp, C), cen,
                Hp, Wp, r, group=k, interpret=True,
                packed=(variant == "packed"),
                transposed=(variant == "transposed"),
            ).reshape(B, g, g, n * n)
        )
    got_p = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(
        np.asarray(got_p), np.asarray(ref), atol=2e-4, rtol=1e-4
    )
