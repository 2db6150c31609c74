"""Pinhole projection with the OpenCV 5-coefficient distortion model, in JAX.

Replaces reference src/utils/utils.py:201-235 (``project_keypoints``) and the
implicit undistortion performed inside cv2.solvePnP. Everything is batched and
jit/vmap-able; shapes are static.
"""
from __future__ import annotations

import jax.numpy as jnp

from ._precision import f32_matmuls
from .quaternion import quat2dcm


def distort_normalized(x0, y0, dist_coeffs):
    """Apply the OpenCV (k1, k2, p1, p2, k3) distortion to normalized coords.

    Mirrors the polynomial in reference utils.py:225-229.
    """
    k1, k2, p1, p2, k3 = (dist_coeffs[..., i] for i in range(5))
    r2 = x0 * x0 + y0 * y0
    cdist = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    x = x0 * cdist + p1 * 2.0 * x0 * y0 + p2 * (r2 + 2.0 * x0 * x0)
    y = y0 * cdist + p1 * (r2 + 2.0 * y0 * y0) + p2 * 2.0 * x0 * y0
    return x, y


def undistort_points(points_2d, camera_matrix, dist_coeffs, num_iters: int = 10):
    """Pixel coords -> undistorted normalized coords (iterative inversion).

    Same fixed-point iteration as cv2.undistortPoints' default path, with a
    static iteration count so it stays jit-friendly.

    Args:
        points_2d: (..., 2) pixel coordinates.
        camera_matrix: (3, 3).
        dist_coeffs: (5,).
    Returns:
        (..., 2) normalized image coordinates (x', y') with distortion removed.
    """
    fx, fy = camera_matrix[0, 0], camera_matrix[1, 1]
    cx, cy = camera_matrix[0, 2], camera_matrix[1, 2]
    xd = (points_2d[..., 0] - cx) / fx
    yd = (points_2d[..., 1] - cy) / fy

    k1, k2, p1, p2, k3 = (dist_coeffs[..., i] for i in range(5))
    x, y = xd, yd
    for _ in range(num_iters):
        r2 = x * x + y * y
        icdist = 1.0 / (1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) * icdist
        y = (yd - dy) * icdist
    return jnp.stack([x, y], axis=-1)


@f32_matmuls
def project_keypoints(q_vbs2tango, r_Vo2To_vbs, camera_matrix, dist_coeffs, keypoints):
    """Project 3D keypoints to pixel coordinates.

    Matches reference utils.py:201-235: pose matrix is
    ``[quat2dcm(q).T | t]`` applied to homogeneous 3D points, then the full
    distortion polynomial, then the camera matrix.

    Args:
        q_vbs2tango: (4,) scalar-first unit quaternion.
        r_Vo2To_vbs: (3,) position (m).
        camera_matrix: (3, 3).
        dist_coeffs: (5,).
        keypoints: (N, 3) 3D points (m). (Row-major; the reference accepts
            either and transposes — we standardize on (N, 3).)
    Returns:
        (2, N) projected pixel coordinates, same layout as the reference.
    """
    R = quat2dcm(q_vbs2tango).T  # standard rotation matrix
    xyz = keypoints @ R.T + r_Vo2To_vbs  # (N, 3) camera-frame points
    x0 = xyz[:, 0] / xyz[:, 2]
    y0 = xyz[:, 1] / xyz[:, 2]
    x, y = distort_normalized(x0, y0, dist_coeffs)
    u = camera_matrix[0, 0] * x + camera_matrix[0, 2]
    v = camera_matrix[1, 1] * y + camera_matrix[1, 2]
    return jnp.stack([u, v], axis=0)
