"""On-device RANSAC-PnP vs ground truth and the OpenCV oracle.

cv2.solvePnPRansac (EPnP) is exactly what the reference calls
(utils/pose_recovery.py:93-96); our solver must recover poses of comparable
accuracy on the same synthetic correspondence sets.
"""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from picopose_tpu.ops.pnp import ransac_pnp

K = np.array([[572.4114, 0, 320.0], [0, 573.57043, 240.0], [0, 0, 1.0]], np.float32)


def make_scene(rng, n=256, noise_px=0.5, outlier_frac=0.0, n_valid=None):
    R = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), rng.uniform(0.6, 1.5)])
    X = rng.uniform(-0.08, 0.08, size=(n, 3))
    p = X @ R.T + t
    uv = p[:, :2] / p[:, 2:]
    px = uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    px += rng.normal(0, noise_px, px.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        px[idx] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    valid = np.ones(n, bool)
    if n_valid is not None:
        valid[n_valid:] = False
    return X.astype(np.float32), px.astype(np.float32), R, t, valid


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


class TestRansacPnP:
    def _run(self, scenes):
        X = jnp.asarray(np.stack([s[0] for s in scenes]))
        px = jnp.asarray(np.stack([s[1] for s in scenes]))
        valid = jnp.asarray(np.stack([s[4] for s in scenes]))
        Kb = jnp.asarray(np.stack([K] * len(scenes)))
        return ransac_pnp(X, px, Kb, valid, jax.random.PRNGKey(0))

    def test_clean_scene_recovers_pose(self, rng):
        scenes = [make_scene(rng, noise_px=0.3) for _ in range(4)]
        res = self._run(scenes)
        for b, (X, px, R, t, valid) in enumerate(scenes):
            assert bool(res.success[b])
            assert rot_err_deg(np.array(res.R[b]), R) < 1.0
            assert np.linalg.norm(np.array(res.t[b]) - t) < 0.01
            assert float(res.inlier_ratio[b]) > 0.9

    def test_outliers_rejected(self, rng):
        scenes = [make_scene(rng, noise_px=0.3, outlier_frac=0.4) for _ in range(4)]
        res = self._run(scenes)
        for b, (X, px, R, t, valid) in enumerate(scenes):
            assert bool(res.success[b])
            assert rot_err_deg(np.array(res.R[b]), R) < 2.0
            assert np.linalg.norm(np.array(res.t[b]) - t) < 0.02

    def test_too_few_points_fails_gracefully(self, rng):
        scenes = [make_scene(rng, n_valid=4)]
        res = self._run(scenes)
        assert not bool(res.success[0])
        np.testing.assert_allclose(np.array(res.R[0]), np.eye(3))
        np.testing.assert_allclose(np.array(res.t[0]), [0, 0, 1])
        assert float(res.inlier_ratio[0]) == 0.0

    def test_comparable_to_opencv(self, rng):
        """Accuracy within ~2x of cv2.solvePnPRansac EPnP on noisy scenes."""
        ours_rot, cv_rot, ours_t, cv_t = [], [], [], []
        scenes = [make_scene(rng, noise_px=1.0, outlier_frac=0.2) for _ in range(6)]
        res = self._run(scenes)
        for b, (X, px, R, t, valid) in enumerate(scenes):
            okcv, rvec, tvec, inl = cv2.solvePnPRansac(
                X, px, K, None, reprojectionError=2, iterationsCount=150,
                flags=cv2.SOLVEPNP_EPNP,
            )
            Rcv, _ = cv2.Rodrigues(rvec)
            ours_rot.append(rot_err_deg(np.array(res.R[b]), R))
            cv_rot.append(rot_err_deg(Rcv, R))
            ours_t.append(np.linalg.norm(np.array(res.t[b]) - t))
            cv_t.append(np.linalg.norm(tvec[:, 0] - t))
        # mean accuracy comparable (ours within 2x of OpenCV or < 0.5 deg)
        assert np.mean(ours_rot) < max(2 * np.mean(cv_rot), 0.5), (ours_rot, cv_rot)
        assert np.mean(ours_t) < max(2 * np.mean(cv_t), 0.005), (ours_t, cv_t)
