"""Asset loaders — reference src/utils/utils.py:273-285 equivalents.

Accepts both the reference's .mat files (via scipy, for drop-in CLI parity
with --keypts_3d_model / --attitude_class flags) and the framework-native
.npy conversions in assets/ (scripts/convert_assets.py).
"""
from __future__ import annotations

import json
import os

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def default_assets_dir() -> str:
    """Repo ``assets/`` dir, overridable via SPEEDPLUS_ASSETS_DIR (used by
    tests to point train.py at converter-generated pretrained files)."""
    return os.environ.get("SPEEDPLUS_ASSETS_DIR") or os.path.join(
        _REPO_ROOT, "assets")


def _resolve(path: str, native_name: str) -> str:
    """Fall back to the native asset when the configured path is missing."""
    if os.path.exists(path):
        return path
    native = os.path.join(default_assets_dir(), native_name)
    if os.path.exists(native):
        return native
    raise FileNotFoundError(f"asset not found: {path} (no fallback {native})")


def load_tango_3d_keypoints(path: str = "") -> np.ndarray:
    """(11, 3) float32 Tango keypoints (utils.py:273-277)."""
    path = _resolve(path, "tango_points.npy")
    if path.endswith(".mat"):
        from scipy.io import loadmat

        return np.asarray(loadmat(path)["tango3Dpoints"], dtype=np.float32).T
    return np.load(path).astype(np.float32)


def load_attitude_classes(path: str = "") -> np.ndarray:
    """(num_classes, 4) scalar-first unit quaternion bins (train.py:119)."""
    path = _resolve(path, "attitude_classes.npy")
    if path.endswith(".mat"):
        from scipy.io import loadmat

        return np.asarray(loadmat(path)["qClass"], dtype=np.float32)
    return np.load(path).astype(np.float32)


def load_camera_intrinsics(camera_json: str):
    """(cameraMatrix (3,3), distCoeffs (5,)) from camera.json (utils.py:279-285)."""
    with open(camera_json) as f:
        cam = json.load(f)
    camera_matrix = np.array(cam["cameraMatrix"], dtype=np.float32)
    dist_coeffs = np.array(cam["distCoeffs"], dtype=np.float32).reshape(-1)
    return camera_matrix, dist_coeffs
