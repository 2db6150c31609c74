"""EPnP tests: exact recovery on noise-free data + OpenCV cross-check.

SURVEY.md §7 names batched EPnP the highest-risk component; these tests pin it
against synthetic ground truth and cv2.solvePnP(SOLVEPNP_EPNP).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speedplusbaseline_tpu.geometry import (
    epnp,
    epnp_batched,
    keypoints_to_pose,
    project_keypoints,
)
from speedplusbaseline_tpu.metrics import error_orientation, error_translation
from tests.conftest import random_pose

# jit once per shape — dispatching the unjitted solver op-by-op makes the
# suite ~20x slower for identical numerics.
_epnp_jit = jax.jit(lambda p3, p2, K, d: epnp(p3, p2, K, d))


def epnp_fast(p3, p2, K, d):
    q, t = _epnp_jit(jnp.asarray(p3, jnp.float32), jnp.asarray(p2, jnp.float32),
                     jnp.asarray(K, jnp.float32), jnp.asarray(d, jnp.float32))
    return q, t


def make_observation(q, t, K, dist, pts3d):
    uv = np.asarray(
        project_keypoints(jnp.asarray(q), jnp.asarray(t), jnp.asarray(K),
                          jnp.asarray(dist), jnp.asarray(pts3d))
    ).T  # (N, 2)
    return uv


class TestEPnPExactRecovery:
    def test_noise_free_no_distortion(self, rng, camera, tango_points):
        K, _ = camera
        dist = np.zeros(5)
        for _ in range(25):
            q, t = random_pose(rng)
            uv = make_observation(q, t, K, dist, tango_points)
            q_pr, t_pr = epnp_fast(tango_points, uv, K, dist)
            # 0.08 deg tolerance: the f32 quaternion-dot acos noise floor is
            # ~0.05 deg (2*sqrt(2*eps)); actual pose error is at the f32 limit.
            assert float(error_orientation(q_pr, jnp.asarray(q))) < 0.08  # deg
            assert float(error_translation(t_pr, jnp.asarray(t))) < 1e-3  # m

    def test_noise_free_with_distortion(self, rng, camera, tango_points):
        K, dist = camera
        for _ in range(25):
            q, t = random_pose(rng)
            uv = make_observation(q, t, K, dist, tango_points)
            q_pr, t_pr = epnp_fast(tango_points, uv, K, dist)
            assert float(error_orientation(q_pr, jnp.asarray(q))) < 0.08
            assert float(error_translation(t_pr, jnp.asarray(t))) < 1e-3

    def test_noisy_observations_close_to_opencv(self, rng, camera, tango_points):
        cv2 = pytest.importorskip("cv2")
        K, dist = camera
        worse = 0
        for _ in range(20):
            q, t = random_pose(rng)
            uv = make_observation(q, t, K, dist, tango_points)
            uv_noisy = uv + rng.randn(*uv.shape) * 2.0  # 2px keypoint noise

            q_pr, t_pr = epnp_fast(tango_points, uv_noisy, K, dist)
            err_q_ours = float(error_orientation(q_pr, jnp.asarray(q)))
            err_t_ours = float(error_translation(t_pr, jnp.asarray(t)))

            ok, rvec, tvec = cv2.solvePnP(
                tango_points.reshape(-1, 1, 3), uv_noisy.reshape(-1, 1, 2),
                K, dist, flags=cv2.SOLVEPNP_EPNP,
            )
            R_cv, _ = cv2.Rodrigues(rvec)
            from scipy.spatial.transform import Rotation as R
            q_cv = R.from_matrix(R_cv).as_quat()[[3, 0, 1, 2]]
            err_q_cv = float(error_orientation(jnp.asarray(q_cv), jnp.asarray(q)))
            err_t_cv = float(error_translation(jnp.asarray(tvec.squeeze()), jnp.asarray(t)))

            # We should be comparable to OpenCV (within 2x or both tiny)
            if err_q_ours > max(2.0 * err_q_cv, 0.5):
                worse += 1
            if err_t_ours > max(2.0 * err_t_cv, 0.05):
                worse += 1
        assert worse <= 4, f"too many cases worse than OpenCV: {worse}"

    def test_batched_matches_single(self, rng, camera, tango_points):
        K, dist = camera
        B = 8
        uvs, qs, ts = [], [], []
        for _ in range(B):
            q, t = random_pose(rng)
            uvs.append(make_observation(q, t, K, dist, tango_points))
            qs.append(q)
            ts.append(t)
        uv_b = jnp.asarray(np.stack(uvs))
        q_b, t_b = epnp_batched(jnp.asarray(tango_points), uv_b, jnp.asarray(K), jnp.asarray(dist))
        for i in range(B):
            q_s, t_s = epnp_fast(tango_points, uvs[i], K, dist)
            np.testing.assert_allclose(np.abs(np.asarray(q_b[i]) @ np.asarray(q_s)), 1.0, atol=1e-5)
            np.testing.assert_allclose(np.asarray(t_b[i]), np.asarray(t_s), atol=1e-4)


class TestKeypointsToPose:
    def test_roi_denormalization(self, rng, camera, tango_points):
        """Full _keypts_to_pose path (inference.py:227-248): normalized RoI
        keypoints -> pixel coords -> EPnP."""
        K, dist = camera
        B = 4
        x_list, y_list, bb_list, qs, ts = [], [], [], [], []
        for _ in range(B):
            q, t = random_pose(rng)
            uv = make_observation(q, t, K, dist, tango_points)
            xmin, xmax = uv[:, 0].min() - 10, uv[:, 0].max() + 10
            ymin, ymax = uv[:, 1].min() - 10, uv[:, 1].max() + 10
            x_n = (uv[:, 0] - xmin) / (xmax - xmin)
            y_n = (uv[:, 1] - ymin) / (ymax - ymin)
            x_list.append(x_n)
            y_list.append(y_n)
            bb_list.append([xmin, xmax, ymin, ymax])
            qs.append(q)
            ts.append(t)

        q_pr, t_pr = keypoints_to_pose(
            jnp.asarray(np.stack(x_list), jnp.float32),
            jnp.asarray(np.stack(y_list), jnp.float32),
            jnp.asarray(np.array(bb_list), jnp.float32),
            jnp.asarray(tango_points, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(dist, jnp.float32),
        )
        for i in range(B):
            assert float(error_orientation(q_pr[i], jnp.asarray(qs[i]))) < 0.2
            assert float(error_translation(t_pr[i], jnp.asarray(ts[i]))) < 0.01
