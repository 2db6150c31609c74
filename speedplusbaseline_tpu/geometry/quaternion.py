"""Pure-JAX quaternion algebra (scalar-first convention).

Replaces the reference's scipy.spatial.transform.Rotation usage
(/root/reference/src/utils/utils.py:139-199) with jit/vmap-able code that runs
on-device. All functions also operate on plain numpy arrays through jnp.

Conventions match the reference exactly:
  * quaternions are scalar-first: q = [q0, q1, q2, q3] = [w, x, y, z]
  * ``quat2dcm`` reproduces utils.py:168-199 — i.e. it returns the TRANSPOSE of
    the standard rotation matrix R(q); the reference composes poses as
    ``[quat2dcm(q).T | t]`` (utils.py:222-223), so ``quat2dcm(q).T == R(q)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ._precision import f32_matmuls


def quat_normalize(q):
    """Normalize quaternion(s) along the last axis."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat2dcm(q):
    """Direction cosine matrix from scalar-first quaternion.

    Semantics of reference utils.py:168-199 (returns R(q)^T under the standard
    active-rotation convention). Supports leading batch dims.
    """
    q = quat_normalize(q)
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    r00 = 2 * q0 * q0 - 1 + 2 * q1 * q1
    r11 = 2 * q0 * q0 - 1 + 2 * q2 * q2
    r22 = 2 * q0 * q0 - 1 + 2 * q3 * q3

    r01 = 2 * q1 * q2 + 2 * q0 * q3
    r02 = 2 * q1 * q3 - 2 * q0 * q2
    r10 = 2 * q1 * q2 - 2 * q0 * q3
    r12 = 2 * q2 * q3 + 2 * q0 * q1
    r20 = 2 * q1 * q3 + 2 * q0 * q2
    r21 = 2 * q2 * q3 - 2 * q0 * q1

    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def dcm2quat(R):
    """Rotation matrix -> scalar-first unit quaternion, branchless for jit.

    ``R`` here is a STANDARD rotation matrix (i.e. ``quat2dcm(q).T``).
    Computes all four Shepperd candidates and selects the best-conditioned one
    with jnp.where, so it vmaps and differentiates cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate squared magnitudes (4*w^2, 4*x^2, 4*y^2, 4*z^2 offsets).
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # Candidate quaternions (unnormalized), one per dominant component.
    eps = 1e-12
    sw = jnp.sqrt(jnp.maximum(qw2, eps))
    cand_w = jnp.stack([sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1)
    sx = jnp.sqrt(jnp.maximum(qx2, eps))
    cand_x = jnp.stack([(m21 - m12) / sx, sx, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1)
    sy = jnp.sqrt(jnp.maximum(qy2, eps))
    cand_y = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, sy, (m12 + m21) / sy], axis=-1)
    sz = jnp.sqrt(jnp.maximum(qz2, eps))
    cand_z = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, sz], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    return quat_normalize(q)


def quat_mul(q, p):
    """Hamilton product of scalar-first quaternions (batched on leading dims)."""
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_angular_distance(q, p):
    """Angular distance(s) in radians: 2*acos(|q . p|).

    Matches reference preprocess.py:137-147 (angle of q^-1 * p) and
    metrics.py:36-43 semantics.
    """
    d = jnp.abs(jnp.sum(q * p, axis=-1))
    d = jnp.minimum(d, 1.0)
    return 2.0 * jnp.arccos(d)


def rodrigues(w):
    """Axis-angle vector (3,) -> standard rotation matrix, safe at theta=0."""
    theta2 = jnp.sum(w * w)
    theta = jnp.sqrt(theta2 + 1e-24)
    k = w / theta
    K = jnp.array(
        [
            [0.0, -k[2], k[1]],
            [k[2], 0.0, -k[0]],
            [-k[1], k[0], 0.0],
        ]
    )
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    R_full = jnp.eye(3) + s * K + (1.0 - c) * (K @ K)
    # First-order fallback for tiny angles (avoids k = w/theta blowup).
    W = jnp.array(
        [
            [0.0, -w[2], w[1]],
            [w[2], 0.0, -w[0]],
            [-w[1], w[0], 0.0],
        ]
    )
    R_small = jnp.eye(3) + W + 0.5 * (W @ W)
    return jnp.where(theta2 > 1e-12, R_full, R_small)


@f32_matmuls
def weighted_mean_quaternion(qs, weights=None):
    """Weighted chordal-L2 mean of unit quaternions (Markley et al. 2007).

    Equivalent to scipy Rotation.mean(weights) used by the reference
    (utils.py:139-166): the mean is the eigenvector of M = sum_i w_i q_i q_i^T
    with the largest eigenvalue. Pure JAX; differentiable; vmap-able.

    Args:
        qs: (N, 4) scalar-first unit quaternions.
        weights: (N,) nonnegative weights or None for uniform.
    Returns:
        (4,) scalar-first unit quaternion with nonnegative scalar part.
    """
    qs = jnp.asarray(qs)
    if weights is None:
        weights = jnp.ones((qs.shape[0],), dtype=qs.dtype)
    M = jnp.einsum("n,ni,nj->ij", weights, qs, qs)
    _, vecs = jnp.linalg.eigh(M)  # ascending eigenvalues
    q = vecs[:, -1]
    # Polish with shifted inverse iteration — f32 eigh alone leaves ~1e-3
    # eigenvector error, which matters against the 0.169 deg HIL threshold.
    eye = jnp.eye(4, dtype=M.dtype)
    for _ in range(3):
        mu = q @ M @ q  # Rayleigh quotient
        # Small diagonal damping keeps (M - mu I) invertible at convergence.
        v = jnp.linalg.solve(M - (mu + 1e-6) * eye, q)
        q = v / jnp.linalg.norm(v)
    # Canonical sign (scipy returns either; metrics use |dot| so sign-free).
    q = q * jnp.sign(jnp.where(q[0] == 0, 1.0, q[0]))
    return quat_normalize(q)
