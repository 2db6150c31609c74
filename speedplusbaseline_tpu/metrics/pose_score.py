"""SPEED+ pose metrics in JAX (batched) — reference src/utils/metrics.py:30-67.

Deviation from the reference, by design (SURVEY.md §2.7): the reference's
``speed_score`` with ``applyThresh=False`` crashes with UnboundLocalError
because ``speed_q`` is only assigned inside the threshold branch
(metrics.py:56-62). We implement the intended semantics:
``speed = speed_t + speed_r`` where ``speed_r`` is the rotation error in
radians, and with ``apply_thresh`` each term is zeroed when below its
threshold.
"""
from __future__ import annotations

import jax.numpy as jnp

# SPEED+ HIL thresholds (reference inference.py:91-92,195-196).
ROT_THRESH_DEG = 0.169  # [deg]
POS_THRESH = 0.002173  # [m/m]


def error_translation(t_pr, t_gt):
    """L2 translation error, batched over leading dims (metrics.py:30-34)."""
    t_pr = jnp.asarray(t_pr)
    t_gt = jnp.asarray(t_gt)
    return jnp.sqrt(jnp.sum(jnp.square(t_gt - t_pr), axis=-1))


def error_orientation(q_pr, q_gt):
    """Angular error in degrees: 2*acos(|<q_pr, q_gt>|) (metrics.py:36-43)."""
    q_pr = jnp.asarray(q_pr)
    q_gt = jnp.asarray(q_gt)
    qdot = jnp.abs(jnp.sum(q_pr * q_gt, axis=-1))
    qdot = jnp.minimum(qdot, 1.0)
    return jnp.rad2deg(2.0 * jnp.arccos(qdot))


def speed_score(
    t_pr,
    q_pr,
    t_gt,
    q_gt,
    apply_thresh: bool = True,
    rot_thresh: float = 0.5,
    pos_thresh: float = 0.005,
):
    """SPEED+ score = normalized translation error + rotation error [rad].

    Matches metrics.py:45-67 intended behavior (see module docstring for the
    fixed ``applyThresh=False`` path). Batched over leading dims.

    Returns:
        (speed, acc): score(s) and within-threshold accuracy indicator(s).
    """
    err_t = error_translation(t_pr, t_gt)
    err_q = error_orientation(q_pr, q_gt)  # [deg]

    t_gt = jnp.asarray(t_gt)
    speed_t = err_t / jnp.sqrt(jnp.sum(jnp.square(t_gt), axis=-1))
    speed_r = jnp.deg2rad(err_q)

    if apply_thresh:
        speed_r = jnp.where(err_q < rot_thresh, 0.0, speed_r)
        speed_t_scored = jnp.where(speed_t < pos_thresh, 0.0, speed_t)
    else:
        speed_t_scored = speed_t

    speed = speed_t_scored + speed_r
    acc = jnp.logical_and(err_q < rot_thresh, speed_t < pos_thresh).astype(jnp.float32)
    return speed, acc


def speed_score_batched(t_pr, q_pr, t_gt, q_gt):
    """Both raw and HIL-thresholded scores in one call (eval hot path).

    Returns dict with err_q [deg], err_t [m], speed_raw, speed_mod, acc —
    matching the per-image quantities valid_krn/valid_spn track
    (inference.py:88-92,192-196).
    """
    err_t = error_translation(t_pr, t_gt)
    err_q = error_orientation(q_pr, q_gt)
    speed_raw, _ = speed_score(t_pr, q_pr, t_gt, q_gt, apply_thresh=False)
    speed_mod, acc = speed_score(
        t_pr, q_pr, t_gt, q_gt, apply_thresh=True,
        rot_thresh=ROT_THRESH_DEG, pos_thresh=POS_THRESH,
    )
    return {
        "err_q": err_q,
        "err_t": err_t,
        "speed_raw": speed_raw,
        "speed_mod": speed_mod,
        "acc": acc,
    }
