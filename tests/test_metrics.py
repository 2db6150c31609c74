"""Metrics tests against a numpy oracle re-deriving metrics.py:30-67 semantics
(with the intended fix for the applyThresh=False UnboundLocalError)."""
import numpy as np

import jax.numpy as jnp

from speedplusbaseline_tpu.metrics import (
    error_translation,
    error_orientation,
    speed_score,
    speed_score_batched,
    ROT_THRESH_DEG,
    POS_THRESH,
)
from tests.conftest import random_pose


def oracle_speed(t_pr, q_pr, t_gt, q_gt, apply_thresh, rot_thresh=0.5, pos_thresh=0.005):
    err_t = np.linalg.norm(np.asarray(t_gt) - np.asarray(t_pr))
    qdot = min(abs(float(np.dot(q_pr, q_gt))), 1.0)
    err_q = np.rad2deg(2 * np.arccos(qdot))
    speed_t = err_t / np.linalg.norm(t_gt)
    speed_r = np.deg2rad(err_q)
    if apply_thresh and err_q < rot_thresh:
        speed_r = 0.0
    if apply_thresh and speed_t < pos_thresh:
        speed_t = 0.0
    return speed_t + speed_r, float(err_q < rot_thresh and err_t / np.linalg.norm(t_gt) < pos_thresh)


class TestErrors:
    def test_translation(self, rng):
        for _ in range(10):
            a, b = rng.randn(3), rng.randn(3)
            assert abs(float(error_translation(a, b)) - np.linalg.norm(a - b)) < 1e-6

    def test_orientation_identical(self):
        q = np.array([1.0, 0, 0, 0])
        assert float(error_orientation(q, q)) < 1e-3

    def test_orientation_sign_invariant(self, rng):
        q, _ = random_pose(rng)
        # f32 acos floor: |dot| rounds to 1-eps -> ~0.05 deg noise.
        assert float(error_orientation(q, -q)) < 0.06

    def test_orientation_90deg(self):
        q1 = np.array([1.0, 0, 0, 0])
        q2 = np.array([np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0])
        assert abs(float(error_orientation(q1, q2)) - 90.0) < 1e-3


class TestSpeedScore:
    def test_matches_oracle_raw_and_thresholded(self, rng):
        for _ in range(30):
            q_gt, t_gt = random_pose(rng)
            q_pr = q_gt + rng.randn(4) * 0.01
            q_pr /= np.linalg.norm(q_pr)
            t_pr = t_gt + rng.randn(3) * 0.01

            for apply_thresh, rt, pt in [(False, 0.5, 0.005),
                                          (True, 0.5, 0.005),
                                          (True, ROT_THRESH_DEG, POS_THRESH)]:
                ours, acc = speed_score(t_pr, q_pr, t_gt, q_gt, apply_thresh, rt, pt)
                ref, acc_ref = oracle_speed(t_pr, q_pr, t_gt, q_gt, apply_thresh, rt, pt)
                assert abs(float(ours) - ref) < 1e-4
                if (apply_thresh, rt, pt) == (True, 0.5, 0.005):
                    assert float(acc) == acc_ref

    def test_perfect_pose_zero_score(self, rng):
        q, t = random_pose(rng)
        s, acc = speed_score(t, q, t, q, apply_thresh=True)
        assert float(s) == 0.0 and float(acc) == 1.0

    def test_batched_dict(self, rng):
        B = 5
        qs, ts, qps, tps = [], [], [], []
        for _ in range(B):
            q, t = random_pose(rng)
            qs.append(q); ts.append(t)
            qp = q + rng.randn(4) * 0.02
            qps.append(qp / np.linalg.norm(qp))
            tps.append(t + rng.randn(3) * 0.05)
        out = speed_score_batched(
            jnp.asarray(np.stack(tps)), jnp.asarray(np.stack(qps)),
            jnp.asarray(np.stack(ts)), jnp.asarray(np.stack(qs)))
        assert out["err_q"].shape == (B,)
        for i in range(B):
            raw_ref, _ = oracle_speed(tps[i], qps[i], ts[i], qs[i], False)
            mod_ref, _ = oracle_speed(tps[i], qps[i], ts[i], qs[i], True,
                                       ROT_THRESH_DEG, POS_THRESH)
            assert abs(float(out["speed_raw"][i]) - raw_ref) < 1e-4
            assert abs(float(out["speed_mod"][i]) - mod_ref) < 1e-4
