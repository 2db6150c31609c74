"""Label preprocessing: SPEED+ JSON -> per-model CSV (reference preprocess.py).

Projects the 11 Tango 3D keypoints through the true pose + camera distortion,
computes the tight bbox, and writes the CSV schema of preprocess.py:104-114.
For SPN, finds the ``num_neighbors`` nearest attitude classes and their
normalized weights 1 - theta/pi^2 (preprocess.py:124-157).

Vectorized numpy throughout (the reference loops per label with scipy); the
quat-bin search is a single (N_labels x N_classes) angular-distance matrix.
"""
from __future__ import annotations

import json
import os


import numpy as np

from ..geometry.projection import project_keypoints
from ..io_utils.assets import (
    load_attitude_classes,
    load_camera_intrinsics,
    load_tango_3d_keypoints,
)


def get_quat_bins(q_pose: np.ndarray, q_class: np.ndarray, num_neighbors: int):
    """Nearest attitude classes + weights for one quaternion
    (preprocess.py:124-157 semantics).

    Angular distance 2*acos(|<q, q_c>|); weights 1 - theta/pi^2, normalized.
    """
    dots = np.abs(q_class @ np.asarray(q_pose, dtype=np.float64))
    dots = np.minimum(dots, 1.0)
    angles = 2.0 * np.arccos(dots)
    order = np.argsort(angles, kind="stable")
    n_classes = order[:num_neighbors]
    n_angles = angles[n_classes]
    weights = 1.0 - n_angles / np.pi**2
    weights = weights / np.sum(weights)
    return n_classes, weights


def json2csv(
    dataroot: str,
    dataname: str,
    domain: str,
    jsonfile: str,
    csvfile: str,
    model_name: str = "krn",
    num_keypoints: int = 11,
    num_neighbors: int = 5,
    keypts_3d_model: str = "",
    attitude_class: str = "",
) -> str:
    """Create a CSV from a SPEED+ JSON label file; returns the CSV path."""
    assert model_name in ("krn", "spn"), "Model must be either krn or spn"

    root = os.path.join(dataroot, dataname)
    with open(os.path.join(root, domain, jsonfile)) as f:
        labels = json.load(f)

    camera_matrix, dist_coeffs = load_camera_intrinsics(
        os.path.join(root, "camera.json"))
    kpts3d = load_tango_3d_keypoints(keypts_3d_model)

    if model_name == "spn":
        att_classes = load_attitude_classes(attitude_class).astype(np.float64)

    out = os.path.join(root, domain, csvfile)
    os.makedirs(os.path.dirname(out), exist_ok=True)

    with open(out, "w") as csv:
        for label in labels:
            filename = os.path.join(domain, "images", label["filename"])
            q = np.array(label["q_vbs2tango_true"], dtype=np.float64)
            t = np.array(label["r_Vo2To_vbs_true"], dtype=np.float64)

            uv = np.asarray(project_keypoints(q, t, camera_matrix, dist_coeffs,
                                              kpts3d))  # (2, K)
            bbox = [uv[0].min(), uv[0].max(), uv[1].min(), uv[1].max()]
            row = [filename] + list(bbox) + q.tolist() + t.tolist()

            if model_name == "krn":
                row += uv.T.reshape(2 * num_keypoints).tolist()
            else:
                classes, weights = get_quat_bins(q, att_classes, num_neighbors)
                row += classes.tolist() + weights.tolist()

            csv.write(", ".join(str(e) for e in row) + "\n")
    return out
