"""Visualization debug helpers — reference src/utils/visualize.py:33-95.

Same three helpers (imshow, plot_2D_bbox, scatter_keypoints) operating on
NHWC float [0,1] arrays (numpy or JAX). Uses the Agg backend by default so
they work headless; pass show=False (default) to get the figure back instead
of blocking on a window.
"""
from __future__ import annotations

import numpy as np


def _to_numpy_image(image):
    img = np.asarray(image)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = np.transpose(img, (1, 2, 0))  # accept CHW for convenience
    return np.clip(img, 0.0, 1.0)


def _figure():
    import matplotlib

    if matplotlib.get_backend().lower() not in ("agg", "module://matplotlib_inline.backend_inline"):
        try:
            matplotlib.use("Agg")
        except Exception:
            pass
    import matplotlib.pyplot as plt

    return plt


def imshow(image, show: bool = False):
    """Display an image tensor (visualize.py:33-43)."""
    plt = _figure()
    fig, ax = plt.subplots()
    ax.imshow(_to_numpy_image(image))
    ax.axis("off")
    if show:
        plt.show()
    return fig


def plot_2D_bbox(image, bbox, show: bool = False):
    """Image + [xmin, xmax, ymin, ymax] box overlay (visualize.py:46-66)."""
    plt = _figure()
    from matplotlib.patches import Rectangle

    fig, ax = plt.subplots()
    ax.imshow(_to_numpy_image(image))
    xmin, xmax, ymin, ymax = [float(v) for v in np.asarray(bbox)]
    ax.add_patch(Rectangle((xmin, ymin), xmax - xmin, ymax - ymin,
                           fill=False, edgecolor="lime", linewidth=2))
    ax.axis("off")
    if show:
        plt.show()
    return fig


def scatter_keypoints(image, x, y, normalized: bool = True, show: bool = False):
    """Image + keypoint scatter (visualize.py:69-95). ``normalized`` means
    x/y are in [0,1] and get scaled by the image size."""
    plt = _figure()
    img = _to_numpy_image(image)
    h, w = img.shape[:2]
    xs = np.asarray(x, dtype=np.float64).reshape(-1)
    ys = np.asarray(y, dtype=np.float64).reshape(-1)
    if normalized:
        xs = xs * w
        ys = ys * h
    fig, ax = plt.subplots()
    ax.imshow(img)
    ax.scatter(xs, ys, c="red", s=24, marker="x")
    ax.axis("off")
    if show:
        plt.show()
    return fig
