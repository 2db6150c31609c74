"""SPN analytic position solver in pure JAX (batched, jit-able).

Replaces reference src/utils/computePositionSPN.py:33-175: initial range guess
by similar triangles, then Gauss-Newton fitting the four extremal reprojected
model points to the bounding-box edges. The reference loops until
``dx <= 5e-10`` or 50 iterations; here we run a fixed 50-iteration
``lax.while_loop``-equivalent with a convergence freeze so shapes stay static.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ._precision import f32_matmuls
from .quaternion import quat2dcm

MAX_MODEL_LENGTH = 1.246  # [m] Tango model diagonal (computePositionSPN.py:42)
_MAX_ITERS = 50
_TOL = 5e-10


def _initial_guess(bbox, camera_matrix):
    """Range by similar triangles + direction through the bbox center.

    DELIBERATE DEVIATION from the reference: computePositionSPN.py:55 builds
    the direction with R_y(-az), which puts the initial x on the MIRRORED
    side of the optical axis (a pixel right of center has x/z > 0, but
    R_y(-az)@[0,0,r] has x = -r·sin(az)·cos(el)); the elevation half uses the
    consistent sign. Starting Gauss-Newton in the mirrored basin makes it
    converge to a reflected position for some lateral poses. We use R_y(+az)
    so the init points along the true bbox-center ray (covered by
    tests/test_spn_position.py across random lateral poses)."""
    xmin, xmax, ymin, ymax = bbox[0], bbox[1], bbox[2], bbox[3]
    width, height = xmax - xmin, ymax - ymin
    box_size = jnp.sqrt(width**2 + height**2)
    cx_box = xmin + width / 2.0
    cy_box = ymin + height / 2.0
    fx, fy = camera_matrix[0, 0], camera_matrix[1, 1]
    cx, cy = camera_matrix[0, 2], camera_matrix[1, 2]
    az = jnp.arctan((cx_box - cx) / fx)
    el = jnp.arctan((cy_box - cy) / fy)
    rng = fx * MAX_MODEL_LENGTH / box_size
    ca, sa = jnp.cos(az), jnp.sin(az)
    ce, se = jnp.cos(-el), jnp.sin(-el)
    Ry = jnp.array([[ca, 0.0, sa], [0.0, 1.0, 0.0], [-sa, 0.0, ca]])
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, ce, -se], [0.0, se, ce]])
    return (Ry @ Rx @ jnp.array([0.0, 0.0, 1.0])) * rng


def _extremal_points(q, t, corners3d_vbs_rows, camera_matrix):
    """Rows of the 4 extremal body points in VBS frame, given current t.

    Mirrors _compute_extremal_points (computePositionSPN.py:88-107): pick the
    model points whose zero-distortion reprojection is extremal in x/y.
    """
    xyz = corners3d_vbs_rows + t  # (N, 3) camera-frame
    u = camera_matrix[0, 0] * (xyz[:, 0] / xyz[:, 2]) + camera_matrix[0, 2]
    v = camera_matrix[1, 1] * (xyz[:, 1] / xyz[:, 2]) + camera_matrix[1, 2]
    idx = jnp.stack([jnp.argmin(u), jnp.argmax(u), jnp.argmin(v), jnp.argmax(v)])
    return corners3d_vbs_rows[idx]  # (4, 3): left, right, top, bottom


def _residuals(r_vbs, camera_matrix, dist_coeffs, t, bbox):
    xyz = r_vbs + t  # (4, 3)
    x0 = xyz[:, 0] / xyz[:, 2]
    y0 = xyz[:, 1] / xyz[:, 2]
    k1, k2, p1, p2, k3 = (dist_coeffs[i] for i in range(5))
    r2 = x0 * x0 + y0 * y0
    cdist = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    x = x0 * cdist + p1 * 2 * x0 * y0 + p2 * (r2 + 2 * x0 * x0)
    y = y0 * cdist + p1 * (r2 + 2 * y0 * y0) + p2 * 2 * x0 * y0
    u = camera_matrix[0, 0] * x + camera_matrix[0, 2]
    v = camera_matrix[1, 1] * y + camera_matrix[1, 2]
    # left->xmin, right->xmax, top->ymin, bottom->ymax
    return jnp.stack([u[0] - bbox[0], u[1] - bbox[1], v[2] - bbox[2], v[3] - bbox[3]])


def _jacobian(r_vbs, camera_matrix, t):
    """Distortion-free Jacobian, as in _calc_jacobian (:139-175)."""
    fx, fy = camera_matrix[0, 0], camera_matrix[1, 1]
    z = r_vbs[:, 2] + t[2]  # (4,)
    xw = r_vbs[:, 0] + t[0]
    yw = r_vbs[:, 1] + t[1]
    zero = jnp.zeros(())
    J = jnp.stack(
        [
            jnp.stack([fx / z[0], zero, -fx * xw[0] / z[0] ** 2]),
            jnp.stack([fx / z[1], zero, -fx * xw[1] / z[1] ** 2]),
            jnp.stack([zero, fy / z[2], -fy * yw[2] / z[2] ** 2]),
            jnp.stack([zero, fy / z[3], -fy * yw[3] / z[3] ** 2]),
        ]
    )
    return J  # (4, 3)


@f32_matmuls
def compute_position_spn(q_vbs2tango, bbox, corners3d, camera_matrix, dist_coeffs=None):
    """Position from predicted attitude + detected bbox (Gauss-Newton).

    Args:
        q_vbs2tango: (4,) scalar-first unit quaternion (predicted).
        bbox: (4,) [xmin, xmax, ymin, ymax] pixels.
        corners3d: (K, 3) Tango 3D model points.
        camera_matrix: (3, 3); dist_coeffs: (5,) or None.
    Returns:
        (3,) position vector r_Vo2To_vbs (m).
    """
    q = jnp.asarray(q_vbs2tango, dtype=jnp.float32)
    bbox = jnp.asarray(bbox, dtype=jnp.float32)
    corners3d = jnp.asarray(corners3d, dtype=jnp.float32)
    camera_matrix = jnp.asarray(camera_matrix, dtype=jnp.float32)
    if dist_coeffs is None:
        dist_coeffs = jnp.zeros((5,), dtype=jnp.float32)
    dist_coeffs = jnp.reshape(jnp.asarray(dist_coeffs, dtype=jnp.float32), (-1,))[:5]

    # Body points rotated to VBS frame once: rows of (R(q) @ P^T)^T = P @ R^T.
    R_std = quat2dcm(q).T
    corners_vbs = corners3d @ R_std.T  # (K, 3)

    t0 = _initial_guess(bbox, camera_matrix)

    def body(state):
        t, it, dx = state
        r_vbs = _extremal_points(q, t, corners_vbs, camera_matrix)
        r = _residuals(r_vbs, camera_matrix, dist_coeffs, t, bbox)
        J = _jacobian(r_vbs, camera_matrix, t)
        JtJ = J.T @ J + 1e-12 * jnp.eye(3)
        t_new = t - jnp.linalg.solve(JtJ, J.T @ r)
        dx_new = jnp.linalg.norm(t_new - t)
        return t_new, it + 1, dx_new

    def cond(state):
        _, it, dx = state
        return jnp.logical_and(dx > _TOL, it <= _MAX_ITERS)

    t, _, _ = jax.lax.while_loop(cond, body, (t0, jnp.zeros((), jnp.int32), jnp.ones(()) + 1e-15))
    return t


@functools.partial(jax.jit, static_argnums=())
@f32_matmuls
def compute_position_spn_batched(q_batch, bbox_batch, corners3d, camera_matrix, dist_coeffs):
    """vmap over (B, 4) quaternions and (B, 4) bboxes -> (B, 3) positions.

    Note: uses a fixed-iteration fori_loop with a convergence freeze instead of
    while_loop, because while_loop bodies must be batched manually under vmap.
    """

    def single(q, bbox):
        R_std = quat2dcm(q).T
        corners_vbs = corners3d @ R_std.T
        t0 = _initial_guess(bbox, camera_matrix)

        def body(_, carry):
            t, dx = carry
            r_vbs = _extremal_points(q, t, corners_vbs, camera_matrix)
            r = _residuals(r_vbs, camera_matrix, dist_coeffs, t, bbox)
            J = _jacobian(r_vbs, camera_matrix, t)
            JtJ = J.T @ J + 1e-12 * jnp.eye(3)
            t_new = t - jnp.linalg.solve(JtJ, J.T @ r)
            dx_new = jnp.linalg.norm(t_new - t)
            # Freeze once converged (mirrors the reference's early exit).
            conv = dx <= _TOL
            t_out = jnp.where(conv, t, t_new)
            dx_out = jnp.where(conv, dx, dx_new)
            return t_out, dx_out

        t, _ = jax.lax.fori_loop(0, _MAX_ITERS + 1, body, (t0, jnp.ones(()) + 1e-15))
        return t

    return jax.vmap(single)(
        jnp.asarray(q_batch, jnp.float32), jnp.asarray(bbox_batch, jnp.float32)
    )
