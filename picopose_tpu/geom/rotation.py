"""Rotation helpers: 2D rotations from cos/sin, in-plane angle extraction.

Replaces the reference's scipy Rotation round-trips (utils/torch_utils.py:
177-183, 204-209) with closed forms that stay on device under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def cos_sin(angle: jnp.ndarray) -> jnp.ndarray:
    """(...,) angle -> (..., 2) stacked (cos, sin).

    Equivalent of utils/torch_utils.py:164-165 (`cosSin`).
    """
    return jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)


def rotation_2d(cs: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) (cos, sin) -> (..., 2, 2) rotation [[c, -s], [s, c]].

    Matches the stacking at utils/torch_utils.py:40-42 / 212-214.
    """
    c, s = cs[..., 0], cs[..., 1]
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def inplane_angle_zxy(R: jnp.ndarray) -> jnp.ndarray:
    """First (z) angle of the extrinsic 'zxy' Euler decomposition of R.

    For extrinsic zxy, R = Ry(c) @ Rx(b) @ Rz(a), whose middle row is
    [cb*sa, cb*ca, -sb]; hence a = atan2(R[1,0], R[1,1]).  Closed-form,
    on-device replacement for scipy Rotation.as_euler('zxy')[..., 0] at
    utils/torch_utils.py:177-183 (validated against scipy in
    tests/test_geom_rotation.py).
    """
    return jnp.arctan2(R[..., 1, 0], R[..., 1, 1])


def geodesic_distance(
    pred_cos_sin: jnp.ndarray, gt_cos_sin: jnp.ndarray, eps: float = 0.0
) -> jnp.ndarray:
    """Mean angular distance between (..., 2) cos/sin pairs.

    Equivalent of utils/torch_utils.py:243-254 (`geodesic_distance`) and the
    'geodesic' branch of InplaneLoss (utils/loss_utils.py:102-109, which
    clamps with eps=1e-6 for a finite gradient at +-1).
    """
    dot = (pred_cos_sin * gt_cos_sin).sum(axis=-1)
    dot = jnp.clip(dot, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(dot).mean()
