"""SPN Gauss-Newton position solver vs a numpy re-derivation of the reference
semantics (computePositionSPN.py:33-175)."""
import numpy as np

import jax.numpy as jnp

from speedplusbaseline_tpu.geometry import (
    compute_position_spn,
    compute_position_spn_batched,
    project_keypoints,
)
from tests.conftest import random_pose


def tight_bbox(q, t, K, pts3d):
    uv = np.asarray(
        project_keypoints(jnp.asarray(q), jnp.asarray(t), jnp.asarray(K),
                          jnp.zeros(5), jnp.asarray(pts3d))
    )
    return np.array([uv[0].min(), uv[0].max(), uv[1].min(), uv[1].max()])


class TestComputePositionSPN:
    def test_recovers_position_given_true_attitude(self, camera, tango_points):
        """With a perfect bbox and the true attitude, the solver must recover
        the position nearly exactly (it is fitting 4 exact constraints).

        Uses a LOCAL RandomState (the shared session rng makes pose draws
        depend on test ordering); includes lateral poses that trip the
        reference's mirrored R_y(-az) init (see geometry/spn_position.py
        _initial_guess docstring)."""
        rng = np.random.RandomState(42)
        K, _ = camera
        dist = np.zeros(5)
        for _ in range(20):
            q, t = random_pose(rng)
            bbox = tight_bbox(q, t, K, tango_points)
            t_pr = np.asarray(
                compute_position_spn(q, bbox, tango_points, K, dist)
            )
            assert np.linalg.norm(t_pr - t) < 0.02, (t_pr, t)

    def test_batched_matches_single(self, rng, camera, tango_points):
        K, _ = camera
        dist = np.zeros(5)
        qs, bbs = [], []
        for _ in range(6):
            q, t = random_pose(rng)
            qs.append(q)
            bbs.append(tight_bbox(q, t, K, tango_points))
        t_b = np.asarray(
            compute_position_spn_batched(
                jnp.asarray(np.stack(qs), jnp.float32),
                jnp.asarray(np.stack(bbs), jnp.float32),
                jnp.asarray(tango_points, jnp.float32),
                jnp.asarray(K, jnp.float32),
                jnp.asarray(dist, jnp.float32),
            )
        )
        for i in range(6):
            t_s = np.asarray(compute_position_spn(qs[i], bbs[i], tango_points, K, dist))
            np.testing.assert_allclose(t_b[i], t_s, atol=1e-4)

    def test_initial_guess_range_scaling(self, camera, tango_points):
        """Farther object -> smaller box -> solver still converges."""
        K, _ = camera
        q = np.array([1.0, 0.0, 0.0, 0.0])
        for z in [3.0, 6.0, 10.0]:
            t = np.array([0.1, -0.05, z])
            bbox = tight_bbox(q, t, K, tango_points)
            t_pr = np.asarray(compute_position_spn(q, bbox, tango_points, K, np.zeros(5)))
            assert np.linalg.norm(t_pr - t) < 0.05
