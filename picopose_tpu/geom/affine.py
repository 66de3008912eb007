"""Batched 2D affine math on (x, y) pixel points.

Functional rebuild of the affine half of the reference's utils/torch_utils.py
(affine_torch, inverse_affine, apply_affine, calc_pred_Ms, get_relative_M,
get_relative_scale_inplane, normalize_affine_transform,
calc_gt_trans_scale_inplane — reference file:lines cited per function).

All functions are batched over arbitrary leading axes and jit/vmap-safe.
Matrices are (..., 3, 3) acting on homogeneous column vectors (x, y, 1).
"""

from __future__ import annotations

import jax.numpy as jnp

from picopose_tpu.geom.rotation import cos_sin, inplane_angle_zxy, rotation_2d

def mmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision batched matmul.

    Geometry matmuls must not inherit the backend's default (TPU: bf16 MXU
    passes) matmul precision — pose accuracy dies at bf16.  Model-side convs
    and attention keep the fast default; everything in `geom` routes through
    this helper or an explicit precision="highest" einsum.
    """
    return jnp.matmul(a, b, precision="highest")


# 2D translations predicted by the stage-2 head are expressed in units of
# TRANS_SCALE pixels (reference: calc_pred_Ms trans_scale=14,
# utils/torch_utils.py:39; compute_stage_two_loss trans_scale=14,
# utils/loss_utils.py:175-180).
TRANS_SCALE = 14.0


def homogenize(points: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 2) -> (..., N, 3) by appending ones.

    Equivalent of utils/torch_utils.py:76-90 (`homogenuous`).
    """
    ones = jnp.ones((*points.shape[:-1], 1), dtype=points.dtype)
    return jnp.concatenate([points, ones], axis=-1)


def apply_affine(M: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 3, 3) affine(s) to (..., N, 2) points -> (..., N, 2).

    Projective-safe (divides by the homogeneous coordinate), matching
    utils/torch_utils.py:114-135.
    """
    ph = homogenize(points)
    out = jnp.einsum("...ij,...nj->...ni", M, ph, precision="highest")
    return out[..., :2] / out[..., 2:3]


def make_affine(
    rotation: jnp.ndarray | None = None,
    scale: jnp.ndarray | None = None,
    translation: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Compose (..., 3, 3) affines from (..., 2, 2) rotations, (...,) scales
    and (..., 2) translations.  Equivalent of utils/torch_utils.py:53-73
    (`affine_torch`): M[:2,:2] = scale * rotation, M[:2,2] = translation.
    """
    if rotation is None:
        raise ValueError("rotation (..., 2, 2) is required")
    batch = rotation.shape[:-2]
    lin = rotation
    if scale is not None:
        lin = lin * scale[..., None, None]
    t = (
        translation
        if translation is not None
        else jnp.zeros((*batch, 2), dtype=rotation.dtype)
    )
    top = jnp.concatenate([lin, t[..., :, None]], axis=-1)  # (..., 2, 3)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=rotation.dtype), (*batch, 1, 3)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def compose_affine(*Ms: jnp.ndarray) -> jnp.ndarray:
    """Left-to-right composition: compose_affine(A, B) == A @ B."""
    out = Ms[0]
    for M in Ms[1:]:
        out = mmul(out, M)
    return out


def inverse_crop_affine(M: jnp.ndarray) -> jnp.ndarray:
    """Invert an isotropic-scale, rotation-free crop affine.

    The crop matrices produced by the data layer are scale+translation only
    (reference asserts this at utils/torch_utils.py:100-101 and inverts at
    :103-111).  M_inv[:2,:2] = I/s, M_inv[:2,2] = -t/s.
    """
    scale = M[..., 0, 0]
    eye = jnp.broadcast_to(jnp.eye(2, dtype=M.dtype), (*M.shape[:-2], 2, 2))
    inv_t = -M[..., :2, 2] / scale[..., None]
    return make_affine(rotation=eye, scale=1.0 / scale, translation=inv_t)


def normalize_affine(M: jnp.ndarray) -> jnp.ndarray:
    """Strip scale from the linear part, keeping a pure 2D rotation embedded
    in a 3x3 matrix with zero translation and [2,2] = 1.

    Equivalent of utils/torch_utils.py:228-240 (`normalize_affine_transform`):
    scale is taken as the norm of the first column of the linear part.
    """
    scale = jnp.linalg.norm(M[..., :2, 0], axis=-1)
    lin = M[..., :2, :2] / scale[..., None, None]
    out = jnp.zeros_like(M)
    out = out.at[..., :2, :2].set(lin)
    out = out.at[..., 2, 2].set(1.0)
    return out


def _center2d_in_crop(pose: jnp.ndarray, K: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """Project the object center (pose translation) into crop coordinates.

    center2d = M @ dehomog(K @ t); matches the repeated idiom at
    utils/torch_utils.py:28-35 and :43-46.  Returns (..., 2)."""
    t = pose[..., :3, 3]
    c = jnp.einsum("...ij,...j->...i", K, t, precision="highest")
    c = c / c[..., 2:3]
    c = jnp.einsum("...ij,...j->...i", M, c, precision="highest")
    return c[..., :2]


def affine_from_prediction(
    pred_scale: jnp.ndarray,
    pred_cos_sin: jnp.ndarray,
    pred_translation: jnp.ndarray,
    tem_pose: jnp.ndarray,
    tem_K: jnp.ndarray,
    tem_M: jnp.ndarray,
    trans_scale: float = TRANS_SCALE,
) -> jnp.ndarray:
    """Compose the stage-2 prediction into a template-crop -> query-crop affine.

    Equivalent of utils/torch_utils.py:39-51 (`calc_pred_Ms`): the rotation
    and scale are anchored at the template's projected 2D center; the
    predicted translation (in units of `trans_scale` px) moves that center.
    """
    R = rotation_2d(pred_cos_sin)
    M = make_affine(rotation=R, scale=pred_scale)
    tem_c = _center2d_in_crop(tem_pose, tem_K, tem_M)
    moved = apply_affine(M, tem_c[..., None, :])[..., 0, :]
    target = tem_c + pred_translation * trans_scale
    return M.at[..., :2, 2].set(target - moved)


def relative_scale_inplane(
    src_K: jnp.ndarray,
    tar_K: jnp.ndarray,
    src_pose: jnp.ndarray,
    tar_pose: jnp.ndarray,
    src_M: jnp.ndarray,
    tar_M: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ground-truth relative 2D scale and in-plane angle, src crop -> tar crop.

    scale = (src_z / tar_z) * (|tar_M| / |src_M|) / (src_f / tar_f) and
    inplane = z-euler (extrinsic 'zxy') of tar_R @ src_R^T, wrapped to
    [0, 2pi).  Closed-form replacement (atan2 of R[1,0], R[1,1]) for the
    reference's scipy round-trip at utils/torch_utils.py:168-183.
    """
    rel_z = src_pose[..., 2, 3] / tar_pose[..., 2, 3]
    rel_crop = jnp.linalg.norm(tar_M[..., :2, 0], axis=-1) / jnp.linalg.norm(
        src_M[..., :2, 0], axis=-1
    )
    rel_focal = src_K[..., 0, 0] / tar_K[..., 0, 0]
    rel_scale = rel_z * rel_crop / rel_focal

    rel_R = mmul(
        tar_pose[..., :3, :3], jnp.swapaxes(src_pose[..., :3, :3], -1, -2)
    )
    inplane = inplane_angle_zxy(rel_R)
    return rel_scale, jnp.mod(inplane + 2.0 * jnp.pi, 2.0 * jnp.pi)


def gt_translation_scale_inplane(
    src_K, tar_K, src_pose, tar_pose, src_M, tar_M
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GT stage-2 targets: 2D translation (px, crop coords), scale, inplane.

    Equivalent of utils/torch_utils.py:17-37 (`calc_gt_trans_scale_inplane`)
    with src=template, tar=real: translation is the displacement between the
    projected object centers in the two crops.  NOTE: the returned
    translation is in raw pixels; the loss divides by TRANS_SCALE
    (utils/loss_utils.py:180).
    """
    rel_scale, rel_inplane = relative_scale_inplane(
        src_K, tar_K, src_pose, tar_pose, src_M, tar_M
    )
    tar_c = _center2d_in_crop(tar_pose, tar_K, tar_M)
    src_c = _center2d_in_crop(src_pose, src_K, src_M)
    return tar_c - src_c, rel_scale, rel_inplane


def relative_affine(
    src_K, tar_K, src_pose, tar_pose, src_M, tar_M
) -> jnp.ndarray:
    """Ground-truth src-crop -> tar-crop affine from the two posed crops.

    Equivalent of utils/torch_utils.py:195-226 (`get_relative_M`): rotation =
    relative in-plane angle, scale = relative 2D scale, anchored so the
    template's projected center lands on the query's projected center.
    """
    rel_scale, rel_inplane = relative_scale_inplane(
        src_K, tar_K, src_pose, tar_pose, src_M, tar_M
    )
    R = rotation_2d(cos_sin(rel_inplane))
    M = make_affine(rotation=R, scale=rel_scale)
    src_c = _center2d_in_crop(src_pose, src_K, src_M)
    tar_c = _center2d_in_crop(tar_pose, tar_K, tar_M)
    moved = apply_affine(M, src_c[..., None, :])[..., 0, :]
    return M.at[..., :2, 2].set(tar_c - moved)
