"""Pose metric sanity tests."""

import numpy as np
from scipy.spatial.transform import Rotation

from picopose_tpu.eval.metrics import (
    add_metric,
    adds_metric,
    pose_summary,
    rotation_error_deg,
    translation_error,
)


def test_rotation_error():
    R = Rotation.from_euler("z", 30, degrees=True).as_matrix()
    assert np.isclose(rotation_error_deg(R, np.eye(3)), 30.0, atol=1e-5)
    assert np.isclose(rotation_error_deg(np.eye(3), np.eye(3)), 0.0, atol=1e-3)


def test_add_zero_at_gt(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float64)
    R = Rotation.random(random_state=1).as_matrix()
    t = np.array([0.1, -0.2, 0.5])
    assert add_metric(R, t, R, t, pts) < 1e-12
    assert adds_metric(R, t, R, t, pts) < 1e-9


def test_adds_symmetric_object(rng):
    """A z-symmetric ring scores ~0 under ADD-S for a z-rotation but not
    under ADD."""
    theta = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    pts = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)], -1)
    Rz = Rotation.from_euler("z", 45, degrees=True).as_matrix()
    t = np.zeros(3)
    assert add_metric(Rz, t, np.eye(3), t, pts) > 0.1
    assert adds_metric(Rz, t, np.eye(3), t, pts) < 1e-2


def test_summary_keys(rng):
    R = np.broadcast_to(np.eye(3), (4, 3, 3))
    t = rng.normal(size=(4, 3))
    pts = rng.normal(size=(50, 3))
    s = pose_summary(R, t, R, t + 0.01, model_points=pts, diameter=1.0)
    assert set(s) >= {"rot_err_deg_mean", "trans_err_median", "add_mean", "add_0.1d_acc"}
    # uniform +0.01 offset on each axis -> error = 0.01*sqrt(3)
    assert np.isclose(s["trans_err_mean"], 0.01 * np.sqrt(3), rtol=1e-5)
