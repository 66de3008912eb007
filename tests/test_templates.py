"""Template pose table regeneration tests.

The gold standard is the reference's vendored .npy tables
(utils/predefined_poses/*.npy); when the reference checkout is present we
compare bit-for-bit (to fp tolerance), otherwise we check the structural
invariants that define the tables.
"""

import os

import numpy as np
import pytest

from picopose_tpu.geom.templates import (
    icosphere_cam_positions,
    template_camera_poses,
    template_object_poses,
    upper_hemisphere_index,
)

_REF = "/root/reference/utils/predefined_poses"


@pytest.mark.parametrize("level,count", [(0, 42), (1, 162), (2, 642)])
def test_counts(level, count):
    assert icosphere_cam_positions(level).shape == (count, 3)
    assert template_object_poses(level).shape == (count, 4, 4)


def test_positions_on_sphere():
    p = icosphere_cam_positions(1)
    np.testing.assert_allclose(np.linalg.norm(p, axis=1), 1000.0, rtol=1e-6)


def test_sorted_by_elevation_azimuth():
    p = icosphere_cam_positions(1)
    el = np.arctan2(p[:, 2], np.hypot(p[:, 0], p[:, 1]))
    assert np.all(np.diff(el) > -1e-9)


def test_object_pose_is_inverse_camera_pose():
    cam = template_camera_poses(1)
    obj = template_object_poses(1)
    np.testing.assert_allclose(np.linalg.inv(cam), obj, atol=1e-9)


@pytest.mark.parametrize("level", [0, 1, 2])
@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference tables absent")
def test_matches_reference_tables_as_viewpoint_set(level):
    """Our viewpoints are the same SET as the reference tables (to the
    reference's own coordinate rounding); ordering is canonicalized
    differently (see geom/templates.py module docstring)."""
    from scipy.spatial.distance import cdist

    ref_cam = np.load(f"{_REF}/cam_poses_level{level}.npy")
    ours = np.asarray(icosphere_cam_positions(level))
    d = cdist(ref_cam[:, :3, 3], ours)
    assert d.min(axis=1).max() < 0.05  # mm, at radius 1000
    # one-to-one
    assert len(set(d.argmin(axis=1))) == len(ours)


def test_upper_hemisphere_index():
    idx = upper_hemisphere_index(1)
    cams = template_camera_poses(1)
    assert np.all(cams[idx, 2, 3] >= 0)
    assert len(idx) < 162
