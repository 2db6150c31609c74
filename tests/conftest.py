"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

This exercises the data-parallel sharding path (SURVEY.md §4) without TPU
hardware. Must run before anything imports jax, hence module scope here.
"""
import os

# Force CPU: the machine's base environment pins JAX_PLATFORMS to the TPU
# plugin, so setdefault would silently leave tests running over the TPU
# tunnel (slow, and single-claim contention hangs concurrent processes).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The machine's TPU plugin sitecustomize force-writes jax_platforms at
# interpreter startup; importing the package re-applies JAX_PLATFORMS=cpu
# (see speedplusbaseline_tpu._respect_jax_platforms_env) so tests never touch
# (or block on) the single TPU claim.
import speedplusbaseline_tpu  # noqa: E402,F401

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(2021)


@pytest.fixture(scope="session")
def camera():
    """A SPEED+-like camera: 1920x1200, ~17.6mm/5.86um, mild distortion."""
    fx = fy = 0.0176 / 5.86e-6
    K = np.array([[fx, 0.0, 960.0], [0.0, fy, 600.0], [0.0, 0.0, 1.0]], dtype=np.float64)
    dist = np.array([-0.22383016606510672, 0.51409797089106379,
                     -0.00066499611998340662, -0.00021404771667484594,
                     -0.13124227429077406], dtype=np.float64)
    return K, dist


@pytest.fixture(scope="session")
def tango_points():
    """11 Tango-scale 3D keypoints (synthetic stand-in for tangoPoints.mat)."""
    rs = np.random.RandomState(7)
    pts = rs.uniform(-0.4, 0.4, size=(11, 3))
    pts[:, 2] *= 0.75
    return pts.astype(np.float64)


def random_pose(rs):
    """Random scalar-first unit quaternion + position in front of the camera."""
    q = rs.randn(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    t = np.array([rs.uniform(-0.6, 0.6), rs.uniform(-0.4, 0.4), rs.uniform(3.5, 9.0)])
    return q, t
