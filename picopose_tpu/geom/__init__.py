"""Pure-JAX geometry core: affine math, projections, rotations, template poses.

Everything here is a pure function over batched jnp arrays — no framework
state, no host callbacks — so it composes freely under jit / vmap / shard_map.
Functional equivalents of the reference's utils/torch_utils.py,
utils/template_utils.py and the geometric halves of utils/pose_recovery.py.
"""

from picopose_tpu.geom.affine import (
    apply_affine,
    compose_affine,
    homogenize,
    inverse_crop_affine,
    make_affine,
    normalize_affine,
    relative_affine,
    relative_scale_inplane,
    affine_from_prediction,
    gt_translation_scale_inplane,
)
from picopose_tpu.geom.projection import (
    depth_to_points,
    project_points,
    unproject_points,
)
from picopose_tpu.geom.rotation import (
    cos_sin,
    geodesic_distance,
    inplane_angle_zxy,
    rotation_2d,
)
from picopose_tpu.geom.pose2d import pose_from_affine_2d
from picopose_tpu.geom.templates import (
    icosphere_cam_positions,
    look_at_opengl,
    opencv_from_opengl,
    template_object_poses,
)
from picopose_tpu.geom.grids import patch_center_grid, pixel_coords_grid
