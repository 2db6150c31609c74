"""Geometry unit tests against scipy/OpenCV oracles (SURVEY.md §4 strategy)."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from speedplusbaseline_tpu.geometry import (
    quat2dcm,
    dcm2quat,
    quat_mul,
    quat_angular_distance,
    weighted_mean_quaternion,
    project_keypoints,
    undistort_points,
)
from tests.conftest import random_pose


def scipy_quat2dcm_reference(q):
    """Reproduces reference utils.py:168-199 numerically via scipy."""
    # reference quat2dcm(q) == R_std(q).T where R_std is scipy's matrix
    q_sl = np.asarray(q)[[1, 2, 3, 0]]
    return R.from_quat(q_sl).as_matrix().T


class TestQuat2DCM:
    def test_matches_reference_convention(self, rng):
        for _ in range(50):
            q, _ = random_pose(rng)
            ours = np.asarray(quat2dcm(jnp.asarray(q)))
            ref = scipy_quat2dcm_reference(q)
            np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_batched(self, rng):
        qs = rng.randn(16, 4)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        batched = np.asarray(quat2dcm(jnp.asarray(qs)))
        for i in range(16):
            np.testing.assert_allclose(batched[i], scipy_quat2dcm_reference(qs[i]), atol=1e-6)


class TestDCM2Quat:
    def test_roundtrip(self, rng):
        for _ in range(100):
            q, _ = random_pose(rng)
            R_std = np.asarray(quat2dcm(jnp.asarray(q))).T  # standard matrix
            q_back = np.asarray(dcm2quat(jnp.asarray(R_std)))
            # Same rotation up to sign
            assert min(np.linalg.norm(q_back - q), np.linalg.norm(q_back + q)) < 1e-4

    def test_matches_scipy(self, rng):
        for _ in range(50):
            q, _ = random_pose(rng)
            R_std = R.from_quat(q[[1, 2, 3, 0]]).as_matrix()
            q_ours = np.asarray(dcm2quat(jnp.asarray(R_std)))
            q_scipy = R.from_matrix(R_std).as_quat()[[3, 0, 1, 2]]
            assert min(np.linalg.norm(q_ours - q_scipy), np.linalg.norm(q_ours + q_scipy)) < 1e-4

    def test_near_degenerate_axes(self):
        # 180-degree rotations about each axis hit the non-trace branches.
        for axis in ["x", "y", "z"]:
            R_std = R.from_euler(axis, 180, degrees=True).as_matrix()
            q_ours = np.asarray(dcm2quat(jnp.asarray(R_std)))
            R_back = R.from_quat(np.asarray(q_ours)[[1, 2, 3, 0]]).as_matrix()
            np.testing.assert_allclose(R_back, R_std, atol=1e-5)


class TestQuatOps:
    def test_mul_matches_scipy(self, rng):
        for _ in range(20):
            q1, _ = random_pose(rng)
            q2, _ = random_pose(rng)
            ours = np.asarray(quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
            r = R.from_quat(q1[[1, 2, 3, 0]]) * R.from_quat(q2[[1, 2, 3, 0]])
            ref = r.as_quat()[[3, 0, 1, 2]]
            assert min(np.linalg.norm(ours - ref), np.linalg.norm(ours + ref)) < 1e-6

    def test_angular_distance(self, rng):
        for _ in range(20):
            q1, _ = random_pose(rng)
            q2, _ = random_pose(rng)
            ours = float(quat_angular_distance(jnp.asarray(q1), jnp.asarray(q2)))
            ref = (R.from_quat(q1[[1, 2, 3, 0]]).inv() * R.from_quat(q2[[1, 2, 3, 0]])).magnitude()
            assert abs(ours - ref) < 1e-4


class TestWeightedMeanQuaternion:
    def test_matches_scipy_mean(self, rng):
        """Reference utils.py:139-166 delegates to scipy Rotation.mean."""
        for _ in range(20):
            qs = rng.randn(5, 4)
            qs /= np.linalg.norm(qs, axis=1, keepdims=True)
            # Cluster them to a common hemisphere for a well-defined mean
            base = qs[0]
            qs = np.where((qs @ base)[:, None] < 0, -qs, qs)
            w = rng.uniform(0.1, 1.0, size=5)

            ours = np.asarray(weighted_mean_quaternion(jnp.asarray(qs), jnp.asarray(w)))
            ref = R.from_quat(qs[:, [1, 2, 3, 0]]).mean(w).as_quat()[[3, 0, 1, 2]]
            assert min(np.linalg.norm(ours - ref), np.linalg.norm(ours + ref)) < 1e-4

    def test_uniform_weights_default(self, rng):
        qs = rng.randn(7, 4)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        base = qs[0]
        qs = np.where((qs @ base)[:, None] < 0, -qs, qs)
        ours = np.asarray(weighted_mean_quaternion(jnp.asarray(qs)))
        ref = R.from_quat(qs[:, [1, 2, 3, 0]]).mean().as_quat()[[3, 0, 1, 2]]
        assert min(np.linalg.norm(ours - ref), np.linalg.norm(ours + ref)) < 1e-4


class TestProjection:
    def test_matches_opencv_projectpoints(self, rng, camera, tango_points):
        cv2 = pytest.importorskip("cv2")
        K, dist = camera
        for _ in range(20):
            q, t = random_pose(rng)
            ours = np.asarray(
                project_keypoints(
                    jnp.asarray(q), jnp.asarray(t), jnp.asarray(K), jnp.asarray(dist),
                    jnp.asarray(tango_points),
                )
            )  # (2, N)
            R_std = scipy_quat2dcm_reference(q).T
            rvec, _ = cv2.Rodrigues(R_std)
            ref, _ = cv2.projectPoints(
                tango_points.reshape(-1, 1, 3), rvec, t.reshape(3, 1), K, dist
            )
            ref = ref.reshape(-1, 2).T
            np.testing.assert_allclose(ours, ref, atol=1e-2)  # sub-0.01px

    def test_undistort_inverts_distortion(self, rng, camera, tango_points):
        K, dist = camera
        for _ in range(10):
            q, t = random_pose(rng)
            uv = np.asarray(
                project_keypoints(
                    jnp.asarray(q), jnp.asarray(t), jnp.asarray(K), jnp.asarray(dist),
                    jnp.asarray(tango_points),
                )
            ).T  # (N, 2)
            norm = np.asarray(undistort_points(jnp.asarray(uv), jnp.asarray(K), jnp.asarray(dist)))
            # Re-project without distortion: should equal the pinhole projection
            uv_pin = np.asarray(
                project_keypoints(
                    jnp.asarray(q), jnp.asarray(t), jnp.asarray(K),
                    jnp.zeros(5), jnp.asarray(tango_points),
                )
            ).T
            back_u = K[0, 0] * norm[:, 0] + K[0, 2]
            back_v = K[1, 1] * norm[:, 1] + K[1, 2]
            np.testing.assert_allclose(np.stack([back_u, back_v], 1), uv_pin, atol=1e-3)
