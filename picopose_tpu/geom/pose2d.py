"""6D pose recovery from a predicted 2D crop-to-crop affine.

Equivalent of utils/pose_recovery.py:9-65 (pose_recovery_2d_prediction),
fully batched and jit-safe.  This is the stage-2 pose (also the fallback when
RANSAC-PnP fails, run_test.py:177-179).
"""

from __future__ import annotations

import jax.numpy as jnp

from picopose_tpu.geom.affine import inverse_crop_affine, mmul, normalize_affine


def pose_from_affine_2d(
    query_M: jnp.ndarray,
    query_K: jnp.ndarray,
    pred_Ms: jnp.ndarray,
    template_K: jnp.ndarray,
    template_M: jnp.ndarray,
    template_pose: jnp.ndarray,
) -> jnp.ndarray:
    """Recover (..., 4, 4) query pose from the predicted template->query affine.

    Steps (mirroring utils/pose_recovery.py:32-65):
      1. rotation: in-plane rotation (scale-stripped pred_Ms) left-composed
         onto the template viewpoint rotation;
      2. 2D center: full image-space affine inv(query_M) @ pred_Ms @ tem_M
         applied to the template's projected center;
      3. depth: z_query = (z_template / scale2d) * (f_query / f_template);
      4. translation: ray through the recovered center, scaled to z_query.
    """
    R_inplane = normalize_affine(pred_Ms)  # (..., 3, 3), top-left 2x2 rotation
    pred_pose = template_pose
    pred_pose = pred_pose.at[..., :3, :3].set(
        mmul(R_inplane, template_pose[..., :3, :3])
    )

    tem_z = pred_pose[..., 2, 3]
    tem_t = pred_pose[..., :3, 3]
    tem_c = jnp.einsum("...ij,...j->...i", template_K, tem_t, precision="highest")
    tem_c = tem_c / tem_c[..., 2:3]

    affine2d = mmul(mmul(inverse_crop_affine(query_M), pred_Ms), template_M)
    query_c = jnp.einsum("...ij,...j->...i", affine2d, tem_c, precision="highest")

    scale2d = jnp.linalg.norm(affine2d[..., :2, 0], axis=-1)
    focal_ratio = query_K[..., 0, 0] / template_K[..., 0, 0]
    query_z = (tem_z / scale2d) * focal_ratio

    ray = jnp.einsum(
        "...ij,...j->...i", jnp.linalg.inv(query_K), query_c, precision="highest"
    )
    ray = ray / ray[..., 2:3]
    return pred_pose.at[..., :3, 3].set(ray * query_z[..., None])
