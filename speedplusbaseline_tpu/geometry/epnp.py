"""Batched EPnP (Efficient Perspective-n-Point) in pure JAX.

TPU-native replacement for the reference's only native compute kernel in the
inference path — cv2.solvePnP(flags=SOLVEPNP_EPNP) + cv2.Rodrigues called per
image on the host (reference src/utils/utils.py:237-269, src/core/
inference.py:227-248). Here the whole solve is jit-compiled XLA with static
shapes and vmaps over the evaluation batch, so pose recovery runs on-device
alongside the model forward pass.

Algorithm follows Lepetit, Moreno-Noguer & Fua, "EPnP: An Accurate O(n)
Solution to the PnP Problem" (IJCV 2009), with the three beta-case
approximations + Gauss-Newton refinement and best-reprojection selection, the
same structure OpenCV implements. Distorted inputs are first undistorted with
the iterative model inverse (cv2.undistortPoints semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ._precision import f32_matmuls
from .projection import distort_normalized, undistort_points
from .quaternion import dcm2quat, rodrigues

_GN_ITERS = 8
_REFINE_ITERS = 5


def _solve_lstsq(A, b):
    """Small dense least-squares via regularized normal equations (vmap-safe)."""
    AtA = A.T @ A
    AtA = AtA + 1e-10 * jnp.eye(AtA.shape[0], dtype=A.dtype)
    return jnp.linalg.solve(AtA, A.T @ b)


def _control_points(pws):
    """World control points: centroid + principal axes (N-scaled)."""
    n = pws.shape[0]
    cw0 = jnp.mean(pws, axis=0)
    centered = pws - cw0
    cov = centered.T @ centered  # (3, 3)
    eigval, eigvec = jnp.linalg.eigh(cov)  # ascending
    # Descending order, scaled like OpenCV: k = sqrt(lambda / n).
    scale = jnp.sqrt(jnp.maximum(eigval[::-1], 1e-12) / n)
    axes = eigvec[:, ::-1].T  # rows = principal directions, descending
    cws = jnp.concatenate([cw0[None, :], cw0[None, :] + scale[:, None] * axes], axis=0)
    return cws  # (4, 3)


def _barycentric(pws, cws):
    CC = (cws[1:] - cws[0]).T  # (3, 3), columns = control-point axes
    CC_inv = jnp.linalg.inv(CC + 1e-12 * jnp.eye(3, dtype=CC.dtype))
    a123 = (pws - cws[0]) @ CC_inv.T  # (N, 3)
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)  # (N, 4)


def _build_M(alphas, uv_norm):
    """(2N, 12) EPnP design matrix in normalized coordinates (f=1, c=0)."""
    n = alphas.shape[0]
    u = uv_norm[:, 0]
    v = uv_norm[:, 1]
    zeros = jnp.zeros_like(alphas)
    # Row pairs per point: [a_j, 0, -a_j*u] and [0, a_j, -a_j*v] for j=0..3.
    row_u = jnp.stack([alphas, zeros, -alphas * u[:, None]], axis=2)  # (N,4,3)
    row_v = jnp.stack([zeros, alphas, -alphas * v[:, None]], axis=2)  # (N,4,3)
    M = jnp.stack([row_u, row_v], axis=1).reshape(2 * n, 12)
    return M


_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _build_L_rho(vs, cws):
    """L (6, 10) distance-constraint matrix and rho (6,) squared distances.

    ``vs`` is (4, 4, 3): four null-space candidate vectors (v1 = smallest
    eigenvalue first), each reshaped to 4 control points x 3.
    beta10 ordering: [b11, b12, b22, b13, b23, b33, b14, b24, b34, b44].
    """
    rows = []
    rhos = []
    for (i, j) in _PAIRS:
        dv = vs[:, i, :] - vs[:, j, :]  # (4, 3) per null vector
        d = lambda a, b: jnp.dot(dv[a], dv[b])
        rows.append(
            jnp.stack(
                [
                    d(0, 0),
                    2 * d(0, 1),
                    d(1, 1),
                    2 * d(0, 2),
                    2 * d(1, 2),
                    d(2, 2),
                    2 * d(0, 3),
                    2 * d(1, 3),
                    2 * d(2, 3),
                    d(3, 3),
                ]
            )
        )
        rhos.append(jnp.sum((cws[i] - cws[j]) ** 2))
    return jnp.stack(rows), jnp.stack(rhos)


def _betas_approx_1(L, rho):
    """Assume beta = (b1, b2, b3, b4) dominated by b1: cols [b11,b12,b13,b14]."""
    L4 = L[:, jnp.array([0, 1, 3, 6])]
    b = _solve_lstsq(L4, rho)
    b1 = jnp.sqrt(jnp.abs(b[0]))
    sign = jnp.sign(jnp.where(b[0] == 0, 1.0, b[0]))
    rest = b[1:] / jnp.where(b1 == 0, 1.0, b1) * sign
    return jnp.concatenate([b1[None], rest])


def _betas_approx_2(L, rho):
    """Cols [b11, b12, b22]."""
    L3 = L[:, jnp.array([0, 1, 2])]
    b = _solve_lstsq(L3, rho)
    b1 = jnp.sqrt(jnp.abs(b[0]))
    # b22 must agree in sign with b11 to have a real sqrt; zero otherwise.
    b2 = jnp.where(b[0] * b[2] > 0, jnp.sqrt(jnp.abs(b[2])), 0.0)
    b1 = jnp.where(b[1] < 0, -b1, b1)  # sign from b12 = b1*b2
    return jnp.stack([b1, b2, jnp.zeros(()), jnp.zeros(())])


def _betas_approx_3(L, rho):
    """Cols [b11, b12, b22, b13, b23]."""
    L5 = L[:, jnp.array([0, 1, 2, 3, 4])]
    b = _solve_lstsq(L5, rho)
    b1 = jnp.sqrt(jnp.abs(b[0]))
    b2 = jnp.where(b[0] * b[2] > 0, jnp.sqrt(jnp.abs(b[2])), 0.0)
    b1s = jnp.where(b[1] < 0, -b1, b1)
    b3 = b[3] / jnp.where(b1s == 0, 1.0, b1s)
    return jnp.stack([b1s, b2, b3, jnp.zeros(())])


def _beta10(beta):
    b1, b2, b3, b4 = beta[0], beta[1], beta[2], beta[3]
    return jnp.stack(
        [b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3, b3 * b3, b1 * b4, b2 * b4, b3 * b4, b4 * b4]
    )


def _gauss_newton(L, rho, beta):
    """Refine betas minimizing ||L beta10(beta) - rho||^2 (fixed iterations)."""

    def step(beta, _):
        b1, b2, b3, b4 = beta[0], beta[1], beta[2], beta[3]
        z = jnp.zeros(())
        J10 = jnp.stack(
            [
                jnp.stack([2 * b1, z, z, z]),
                jnp.stack([b2, b1, z, z]),
                jnp.stack([z, 2 * b2, z, z]),
                jnp.stack([b3, z, b1, z]),
                jnp.stack([z, b3, b2, z]),
                jnp.stack([z, z, 2 * b3, z]),
                jnp.stack([b4, z, z, b1]),
                jnp.stack([z, b4, z, b2]),
                jnp.stack([z, z, b4, b3]),
                jnp.stack([z, z, z, 2 * b4]),
            ]
        )  # (10, 4) = d beta10 / d beta
        J = L @ J10  # (6, 4)
        r = rho - L @ _beta10(beta)
        delta = _solve_lstsq(J, r)
        return beta + delta, None

    beta, _ = jax.lax.scan(step, beta, None, length=_GN_ITERS)
    return beta


def _pose_from_betas(beta, vs, alphas, pws):
    """Camera-frame control points -> (R, t) via Horn's closed-form alignment."""
    ccs = jnp.einsum("k,kij->ij", beta, vs)  # (4, 3)
    pcs = alphas @ ccs  # (N, 3)
    # Resolve global sign: depths must be positive.
    flip = jnp.where(jnp.mean(pcs[:, 2]) < 0, -1.0, 1.0)
    pcs = pcs * flip

    pc0 = jnp.mean(pcs, axis=0)
    pw0 = jnp.mean(pws, axis=0)
    H = (pcs - pc0).T @ (pws - pw0)  # (3, 3), maps world -> camera
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.stack([jnp.ones(()), jnp.ones(()), d]))
    R = U @ D @ Vt
    t = pc0 - R @ pw0
    return R, t


def _refine_pose(R, t, pws, uv_norm):
    """Gauss-Newton refinement of (R, t) on reprojection residuals.

    Left-multiplicative axis-angle update, normalized undistorted coords.
    This stage takes EPnP's closed-form estimate to the f32 noise floor and
    improves robustness under keypoint noise beyond OpenCV's unrefined EPnP
    (the reference calls cv2.solvePnP EPNP without refinement).
    """

    def step(carry, _):
        R0, t0 = carry

        def res(params):
            w, dt = params[:3], params[3:]
            Rd = rodrigues(w) @ R0
            xyz = pws @ Rd.T + (t0 + dt)
            proj = xyz[:, :2] / xyz[:, 2:3]
            return (proj - uv_norm).reshape(-1)

        p0 = jnp.zeros(6)
        J = jax.jacfwd(res)(p0)  # (2N, 6)
        r = res(p0)
        delta = _solve_lstsq(J, -r)
        R1 = rodrigues(delta[:3]) @ R0
        t1 = t0 + delta[3:]
        return (R1, t1), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=_REFINE_ITERS)
    return R, t


def _reproj_error(R, t, pws, uv_pix, camera_matrix, dist_coeffs):
    xyz = pws @ R.T + t
    x0 = xyz[:, 0] / xyz[:, 2]
    y0 = xyz[:, 1] / xyz[:, 2]
    x, y = distort_normalized(x0, y0, dist_coeffs)
    u = camera_matrix[0, 0] * x + camera_matrix[0, 2]
    v = camera_matrix[1, 1] * y + camera_matrix[1, 2]
    return jnp.mean(jnp.sqrt((u - uv_pix[:, 0]) ** 2 + (v - uv_pix[:, 1]) ** 2))


@f32_matmuls
def epnp(points_3d, points_2d, camera_matrix, dist_coeffs=None):
    """Solve PnP with EPnP. Returns (q, t) like reference utils.py:237-269.

    Args:
        points_3d: (N, 3) world/model points.
        points_2d: (N, 2) pixel observations (distorted, as measured).
        camera_matrix: (3, 3).
        dist_coeffs: (5,) or None.
    Returns:
        q: (4,) scalar-first unit quaternion (the standard quaternion of the
            camera rotation matrix, matching scipy's from_matrix in the
            reference).
        t: (3,) translation (m).
    """
    points_3d = jnp.asarray(points_3d, dtype=jnp.float32)
    points_2d = jnp.asarray(points_2d, dtype=jnp.float32)
    camera_matrix = jnp.asarray(camera_matrix, dtype=jnp.float32)
    if dist_coeffs is None:
        dist_coeffs = jnp.zeros((5,), dtype=jnp.float32)
    dist_coeffs = jnp.reshape(jnp.asarray(dist_coeffs, dtype=jnp.float32), (-1,))[:5]

    uv_norm = undistort_points(points_2d, camera_matrix, dist_coeffs)

    cws = _control_points(points_3d)
    alphas = _barycentric(points_3d, cws)
    M = _build_M(alphas, uv_norm)
    MtM = M.T @ M
    _, eigvecs = jnp.linalg.eigh(MtM)  # ascending
    vs = eigvecs[:, :4].T.reshape(4, 4, 3)  # v1..v4, each (4 ctrl pts, 3)

    L, rho = _build_L_rho(vs, cws)

    candidates = [
        _betas_approx_1(L, rho),
        _betas_approx_2(L, rho),
        _betas_approx_3(L, rho),
    ]

    best_err = jnp.inf
    best_R = jnp.eye(3)
    best_t = jnp.zeros(3)
    for beta0 in candidates:
        beta = _gauss_newton(L, rho, beta0)
        R, t = _pose_from_betas(beta, vs, alphas, points_3d)
        err = _reproj_error(R, t, points_3d, points_2d, camera_matrix, dist_coeffs)
        take = err < best_err
        best_err = jnp.where(take, err, best_err)
        best_R = jnp.where(take, R, best_R)
        best_t = jnp.where(take, t, best_t)

    best_R, best_t = _refine_pose(best_R, best_t, points_3d, uv_norm)
    q = dcm2quat(best_R)
    return q, best_t


@functools.partial(jax.jit, static_argnums=())
@f32_matmuls
def epnp_batched(points_3d, points_2d_batch, camera_matrix, dist_coeffs):
    """vmap EPnP over a batch of 2D observations sharing one 3D model.

    Args:
        points_3d: (N, 3).
        points_2d_batch: (B, N, 2).
    Returns:
        q: (B, 4), t: (B, 3).
    """
    return jax.vmap(lambda p2: epnp(points_3d, p2, camera_matrix, dist_coeffs))(
        points_2d_batch
    )


@f32_matmuls
def keypoints_to_pose(x_pr, y_pr, bbox, corners3d, camera_matrix, dist_coeffs):
    """Normalized RoI keypoints -> pose, batched (inference.py:227-248).

    Args:
        x_pr, y_pr: (B, K) keypoint coords normalized to [0, 1] within the RoI.
        bbox: (B, 4) RoI [xmin, xmax, ymin, ymax] in pixels.
        corners3d: (K, 3) 3D model points.
    Returns:
        q: (B, 4), t: (B, 3).
    """
    xmin, xmax = bbox[:, 0:1], bbox[:, 1:2]
    ymin, ymax = bbox[:, 2:3], bbox[:, 3:4]
    u = x_pr * (xmax - xmin) + xmin  # (B, K)
    v = y_pr * (ymax - ymin) + ymin
    uv = jnp.stack([u, v], axis=-1)  # (B, K, 2)
    return jax.vmap(lambda p2: epnp(corners3d, p2, camera_matrix, dist_coeffs))(uv)
