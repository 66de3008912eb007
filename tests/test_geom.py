"""Golden-value and oracle tests for the geometry core.

Oracles: scipy (euler angles), numpy closed forms, and hand-built transforms.
These pin the math that the reference implements in utils/torch_utils.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from picopose_tpu.geom import (
    affine_from_prediction,
    apply_affine,
    cos_sin,
    depth_to_points,
    geodesic_distance,
    gt_translation_scale_inplane,
    homogenize,
    inplane_angle_zxy,
    inverse_crop_affine,
    make_affine,
    normalize_affine,
    patch_center_grid,
    pixel_coords_grid,
    pose_from_affine_2d,
    project_points,
    relative_affine,
    relative_scale_inplane,
    rotation_2d,
    unproject_points,
)


def random_pose(rng, z=(0.5, 2.0)):
    T = np.eye(4)
    T[:3, :3] = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    T[:3, 3] = [rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), rng.uniform(*z)]
    return T


def crop_affine(rng):
    s = rng.uniform(0.5, 3.0)
    M = np.eye(3)
    M[0, 0] = M[1, 1] = s
    M[:2, 2] = rng.uniform(-100, 100, 2)
    return M


K0 = np.array([[572.4114, 0, 320.0], [0, 573.57043, 240.0], [0, 0, 1.0]])


class TestAffineBasics:
    def test_homogenize(self):
        p = jnp.array([[1.0, 2.0], [3.0, 4.0]])
        out = homogenize(p)
        np.testing.assert_allclose(out, [[1, 2, 1], [3, 4, 1]])

    def test_apply_affine_matches_manual(self, rng):
        M = jnp.asarray(rng.normal(size=(4, 3, 3)))
        M = M.at[:, 2, :].set(jnp.array([0.0, 0.0, 1.0]))
        pts = jnp.asarray(rng.normal(size=(4, 7, 2)))
        out = apply_affine(M, pts)
        for b in range(4):
            for n in range(7):
                ph = np.array([*np.array(pts[b, n]), 1.0])
                expect = np.array(M[b]) @ ph
                np.testing.assert_allclose(
                    out[b, n], expect[:2] / expect[2], rtol=1e-5, atol=1e-6
                )

    def test_make_affine_scale_rot_trans(self):
        R = rotation_2d(cos_sin(jnp.array([np.pi / 2])))
        M = make_affine(rotation=R, scale=jnp.array([2.0]), translation=jnp.array([[3.0, 4.0]]))
        # (1, 0) -> rot90 -> (0, 1) -> *2 -> (0, 2) -> +t -> (3, 6)
        out = apply_affine(M, jnp.array([[[1.0, 0.0]]]))
        np.testing.assert_allclose(out[0, 0], [3.0, 6.0], atol=1e-6)

    def test_inverse_crop_affine(self, rng):
        M = jnp.asarray(np.stack([crop_affine(rng) for _ in range(5)]))
        Minv = inverse_crop_affine(M)
        np.testing.assert_allclose(
            np.array(Minv) @ np.array(M),
            np.broadcast_to(np.eye(3), (5, 3, 3)),
            atol=1e-5,
        )

    def test_normalize_affine_strips_scale(self, rng):
        theta = rng.uniform(0, 2 * np.pi, size=3)
        R = rotation_2d(cos_sin(jnp.asarray(theta)))
        M = make_affine(rotation=R, scale=jnp.asarray(rng.uniform(0.5, 2, 3)),
                        translation=jnp.asarray(rng.normal(size=(3, 2))))
        N = normalize_affine(M)
        np.testing.assert_allclose(np.array(N[:, :2, :2]), np.array(R), atol=1e-6)
        np.testing.assert_allclose(np.array(N[:, :2, 2]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.array(N[:, 2, 2]), 1.0)


class TestRotation:
    def test_inplane_angle_matches_scipy_zxy(self, rng):
        Rm = Rotation.random(64, random_state=3).as_matrix()
        ours = np.array(inplane_angle_zxy(jnp.asarray(Rm)))
        scipys = Rotation.from_matrix(Rm).as_euler("zxy")[:, 0]
        # compare as angles (mod 2pi)
        d = np.angle(np.exp(1j * (ours - scipys)))
        np.testing.assert_allclose(d, 0.0, atol=1e-6)

    def test_geodesic_distance(self):
        a = cos_sin(jnp.array([0.0, np.pi / 2]))
        b = cos_sin(jnp.array([np.pi / 2, np.pi / 2]))
        assert np.isclose(float(geodesic_distance(a, b)), np.pi / 4)


class TestProjection:
    def test_project_unproject_roundtrip(self, rng):
        depth_val = 1.7
        depth = jnp.full((2, 48, 64), depth_val)
        K = jnp.asarray(np.stack([K0, K0 * np.diag([1.1, 1.1, 1.0])]))
        K = K.at[:, 2, 2].set(1.0)
        pts2d = jnp.asarray(rng.uniform(5, 40, size=(2, 10, 2)))
        p3 = unproject_points(jnp.floor(pts2d), K, depth)
        np.testing.assert_allclose(np.array(p3[..., 2]), depth_val, rtol=1e-6)
        back = project_points(p3, K)
        np.testing.assert_allclose(np.array(back), np.floor(np.array(pts2d)), atol=1e-3)

    def test_depth_to_points(self):
        depth = jnp.ones((4, 6)) * 2.0
        pts = depth_to_points(depth, jnp.asarray(K0))
        assert pts.shape == (4, 6, 3)
        # center pixel maps to ray through principal point
        np.testing.assert_allclose(
            np.array(pts[0, 0]),
            [(0 - 320) * 2 / 572.4114, (0 - 240) * 2 / 573.57043, 2.0],
            rtol=1e-5,
        )


class TestRelativeAffine:
    def _setup(self, rng):
        # template/real pair with a pure in-plane relative rotation so the
        # affine model is exact.
        src_pose = random_pose(rng)
        angle = rng.uniform(0, 2 * np.pi)
        Rz = np.eye(4)
        Rz[:3, :3] = Rotation.from_euler("z", angle).as_matrix()
        tar_pose = Rz @ src_pose
        tar_pose[:3, 3] = [0.01, -0.02, src_pose[2, 3] * rng.uniform(0.7, 1.4)]
        return src_pose, tar_pose, angle

    def test_relative_scale_inplane(self, rng):
        src_pose, tar_pose, angle = self._setup(rng)
        src_M, tar_M = crop_affine(rng), crop_affine(rng)
        scale, inp = relative_scale_inplane(
            jnp.asarray(K0), jnp.asarray(K0),
            jnp.asarray(src_pose), jnp.asarray(tar_pose),
            jnp.asarray(src_M), jnp.asarray(tar_M),
        )
        expect_scale = (src_pose[2, 3] / tar_pose[2, 3]) * (tar_M[0, 0] / src_M[0, 0])
        assert np.isclose(float(scale), expect_scale, rtol=1e-5)
        assert np.isclose(
            np.angle(np.exp(1j * (float(inp) - angle))), 0.0, atol=1e-5
        )

    def test_relative_affine_maps_center(self, rng):
        src_pose, tar_pose, _ = self._setup(rng)
        src_M, tar_M = crop_affine(rng), crop_affine(rng)
        M = relative_affine(
            jnp.asarray(K0), jnp.asarray(K0),
            jnp.asarray(src_pose), jnp.asarray(tar_pose),
            jnp.asarray(src_M), jnp.asarray(tar_M),
        )

        def center(pose, K, Mc):
            c = K @ pose[:3, 3]
            c = c / c[2]
            c = Mc @ c
            return c[:2]

        src_c = center(src_pose, K0, src_M)
        tar_c = center(tar_pose, K0, tar_M)
        out = apply_affine(M, jnp.asarray(src_c)[None, :])[0]
        np.testing.assert_allclose(np.array(out), tar_c, rtol=1e-4)

    def test_affine_from_prediction_consistency(self, rng):
        """affine_from_prediction(gt components) == relative_affine."""
        src_pose, tar_pose, _ = self._setup(rng)
        src_M, tar_M = crop_affine(rng), crop_affine(rng)
        args = (
            jnp.asarray(K0), jnp.asarray(K0),
            jnp.asarray(src_pose), jnp.asarray(tar_pose),
            jnp.asarray(src_M), jnp.asarray(tar_M),
        )
        gt_M = relative_affine(*args)
        trans, scale, inp = gt_translation_scale_inplane(*args)
        M2 = affine_from_prediction(
            scale, cos_sin(inp), trans / 14.0,
            jnp.asarray(src_pose), jnp.asarray(K0), jnp.asarray(src_M),
        )
        np.testing.assert_allclose(np.array(M2), np.array(gt_M), atol=1e-4)


class TestPose2D:
    def test_recovers_inplane_pose(self, rng):
        """With gt affine components, the 2D pose recovery reproduces the
        target pose exactly for an in-plane-rotated pair."""
        src_pose = random_pose(rng)
        angle = rng.uniform(0, 2 * np.pi)
        Rz = np.eye(4)
        Rz[:3, :3] = Rotation.from_euler("z", angle).as_matrix()
        tar_pose = Rz @ src_pose
        tar_pose[:3, 3] = [0.03, 0.01, src_pose[2, 3] * 1.2]
        src_M, tar_M = crop_affine(rng), crop_affine(rng)

        M = relative_affine(
            jnp.asarray(K0), jnp.asarray(K0),
            jnp.asarray(src_pose), jnp.asarray(tar_pose),
            jnp.asarray(src_M), jnp.asarray(tar_M),
        )
        pred = pose_from_affine_2d(
            jnp.asarray(tar_M), jnp.asarray(K0), M,
            jnp.asarray(K0), jnp.asarray(src_M), jnp.asarray(src_pose),
        )
        np.testing.assert_allclose(np.array(pred), tar_pose, atol=1e-4)


class TestGrids:
    def test_patch_center_grid(self):
        g = patch_center_grid(224, 14.0)
        assert g.shape == (16, 16, 2)
        np.testing.assert_allclose(g[0, 0], [7.0, 7.0])
        np.testing.assert_allclose(g[2, 5], [5 * 14 + 7, 2 * 14 + 7])

    def test_pixel_coords_grid(self):
        g = pixel_coords_grid(3, 4)
        np.testing.assert_allclose(g[1, 2], [2.0, 1.0])
