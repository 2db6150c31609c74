from .quaternion import (
    quat_normalize,
    quat2dcm,
    dcm2quat,
    quat_mul,
    quat_conj,
    quat_angular_distance,
    weighted_mean_quaternion,
)
from .projection import project_keypoints, undistort_points, distort_normalized
from .epnp import epnp, epnp_batched, keypoints_to_pose
from .spn_position import compute_position_spn, compute_position_spn_batched

__all__ = [
    "quat_normalize",
    "quat2dcm",
    "dcm2quat",
    "quat_mul",
    "quat_conj",
    "quat_angular_distance",
    "weighted_mean_quaternion",
    "project_keypoints",
    "undistort_points",
    "distort_normalized",
    "epnp",
    "epnp_batched",
    "keypoints_to_pose",
    "compute_position_spn",
    "compute_position_spn_batched",
]
