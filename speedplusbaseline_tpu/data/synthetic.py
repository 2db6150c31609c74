"""Synthetic SPEED+-format dataset generator for tests and benchmarks.

Writes a miniature dataset with the exact on-disk layout the reference
consumes (README.md structure):

  root/
    camera.json                      (cameraMatrix, distCoeffs)
    {domain}/images/imgNNNNNN.jpg
    {domain}/{split}.json            (q_vbs2tango_true, r_Vo2To_vbs_true)

Images contain bright markers at each projected keypoint location (unique hue
per keypoint), so KRN training on this data is actually learnable — the e2e
tests train a few steps and watch the loss drop. Domains carry a real domain
gap mirroring SPEED+'s synthetic vs HIL split (``DOMAIN_STYLES``): synthetic
renders gaussian blobs on dim noise, lightbox/sunlamp render ring markers on
a bright striped background with optical blur — the substrate for the DANN
adaptation demo (scripts/dann_adaptation_run.py). Run preprocess.py on the
generated JSONs to produce the CSVs (exercising the real label pipeline).
"""
from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

from ..geometry.projection import project_keypoints
from ..io_utils.assets import load_tango_3d_keypoints


def _default_camera(width: int, height: int):
    f = 0.6 * width  # short focal so a ~1m target at 3-6m fits the tiny frame
    camera_matrix = [[f, 0.0, width / 2.0], [0.0, f, height / 2.0], [0.0, 0.0, 1.0]]
    dist = [-0.1, 0.03, -5e-4, -5e-4, 0.0]
    return camera_matrix, dist


def _render(width, height, uv, rs, style="blobs"):
    """Per-keypoint marker with one UNIQUE hue each, on a domain-styled
    background.

    Unique colors make the keypoint-identification task well-posed (the real
    SPEED+ target is identifiable from its asymmetric texture). An earlier
    version cycled 3 colors (``i % 3``), which left keypoints within a color
    group distinguishable only by constellation geometry — ambiguous views
    produced within-group correspondence swaps, and EPnP with swapped
    correspondences yields catastrophic (>90 deg) pose outliers on the
    convergence runs.

    ``style`` gives the fake dataset a real source/target DOMAIN GAP,
    mirroring SPEED+'s synthetic vs hardware-in-the-loop imagery
    (reference README.md:8):

    - ``"blobs"`` (synthetic/source): gaussian blob markers on a dim
      uniform-noise background.
    - ``"rings"`` (lightbox/sunlamp, i.e. HIL/target): ring (annulus)
      markers of the SAME hue, a brighter striped background, and a mild
      optical blur. The pose→pixel mapping is unchanged (markers centered
      at the same projected keypoints), but the LOW-LEVEL statistics
      (marker shape, background texture, sharpness) differ — a gap the
      reference's photometric augs (brightness/contrast/noise,
      transforms.py:71-110) do NOT cover, so bridging it requires domain
      adaptation rather than augmentation. This is what makes the DANN
      adaptation demo (scripts/dann_adaptation_run.py) well-posed.
    - ``"blobs_bright"``: the SAME gaussian-blob markers as the source but
      in the rings style's photometric environment (bright striped
      background, optical blur) — a PURELY photometric/low-level gap with
      no structural (marker-shape) change. This is the split style
      augmentation is supposed to cover (reference README.md:20 randomizes
      texture/color, not geometry), so it separates "styleaug helps where
      the gap is photometric" from "no augmentation can invent unseen
      marker shapes" in scripts/styleaug_ab_run.py.
    """
    import colorsys

    bright_bg = style in ("rings", "blobs_bright")
    ring_markers = style == "rings"
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    if bright_bg:
        stripes = 0.5 + 0.5 * np.sin(
            2.0 * np.pi * (3.0 * xx / width + 2.0 * yy / height))
        img = (35.0 + 45.0 * stripes)[..., None] + (
            rs.rand(height, width, 3) * 25).astype(np.float32)
        img = img.astype(np.float32)
    else:
        img = (rs.rand(height, width, 3) * 40).astype(np.float32)
    k = uv.shape[1]
    for i in range(k):
        u, v = uv[0, i], uv[1, i]
        color = np.array(colorsys.hsv_to_rgb(i / max(k, 1), 1.0, 1.0),
                         dtype=np.float32)
        if ring_markers:
            r = np.sqrt((xx - u) ** 2 + (yy - v) ** 2)
            marker = np.exp(-((r - 4.0) ** 2) / (2.0 * 1.2**2))
        else:
            marker = np.exp(-((xx - u) ** 2 + (yy - v) ** 2) / (2.0 * 2.5**2))
        img += marker[..., None] * (0.35 + 0.65 * color[None, None]) * 255.0
    img = np.clip(img, 0, 255)
    if bright_bg:
        from scipy.ndimage import gaussian_filter

        img = gaussian_filter(img, sigma=(1.0, 1.0, 0.0))
    return img.astype(np.uint8)


#: Default per-domain render styles: synthetic is the clean source domain,
#: the HIL test domains (lightbox/sunlamp) carry the domain gap.
DOMAIN_STYLES = {"synthetic": "blobs", "lightbox": "rings", "sunlamp": "rings"}


def generate_fake_speedplus(
    root: str,
    num_train: int = 24,
    num_test: int = 8,
    width: int = 320,
    height: int = 200,
    domains: Sequence[str] = ("synthetic", "lightbox"),
    seed: int = 0,
    domain_styles=None,
) -> str:
    """Create the dataset under ``root``/speedplus and return that path."""
    from PIL import Image

    dataroot = os.path.join(root, "speedplus")
    os.makedirs(dataroot, exist_ok=True)
    camera_matrix, dist = _default_camera(width, height)
    with open(os.path.join(dataroot, "camera.json"), "w") as f:
        json.dump({"cameraMatrix": camera_matrix, "distCoeffs": dist}, f)

    kpts3d = load_tango_3d_keypoints()
    K = np.array(camera_matrix, dtype=np.float64)
    D = np.array(dist, dtype=np.float64)

    styles = dict(DOMAIN_STYLES)
    if domain_styles:
        styles.update(domain_styles)

    rs = np.random.RandomState(seed)
    for domain in domains:
        style = styles.get(domain, "blobs")
        img_dir = os.path.join(dataroot, domain, "images")
        os.makedirs(img_dir, exist_ok=True)
        for split, n in (("train", num_train), ("test", num_test)):
            labels = []
            for i in range(n):
                # Resample until the whole target is inside the frame: a
                # truncated view leaves some keypoint blobs unrendered, which
                # is unlearnable label noise (one such val image produced a
                # catastrophic 172-deg EPnP outlier in the round-3
                # convergence run — the old code nudged t_z once and never
                # re-checked).
                for _ in range(100):
                    q = rs.randn(4)
                    q /= np.linalg.norm(q)
                    if q[0] < 0:
                        q = -q
                    t = np.array([rs.uniform(-0.3, 0.3), rs.uniform(-0.2, 0.2),
                                  rs.uniform(3.0, 6.0)])
                    uv = np.asarray(project_keypoints(q, t, K, D, kpts3d))
                    if (uv[0].min() >= 8 and uv[0].max() <= width - 8
                            and uv[1].min() >= 8 and uv[1].max() <= height - 8):
                        break
                else:
                    t[2] += 4.0  # pathological camera geometry: back way off
                    uv = np.asarray(project_keypoints(q, t, K, D, kpts3d))
                fname = f"{domain}_{split}_img{i:06d}.jpg"
                img = _render(width, height, uv, rs, style=style)
                Image.fromarray(img).save(
                    os.path.join(img_dir, fname), quality=92)
                labels.append({
                    "filename": fname,
                    "q_vbs2tango_true": [float(v) for v in q],
                    "r_Vo2To_vbs_true": [float(v) for v in t],
                })
            with open(os.path.join(dataroot, domain, f"{split}.json"), "w") as f:
                json.dump(labels, f)
    return dataroot


def generate_attitude_classes(num_classes: int, seed: int = 0,
                              pool: int = 100_000) -> np.ndarray:
    """Farthest-point-sampled unit-quaternion attitude bins, scalar-first,
    with q and -q identified (SO(3), not S³).

    A uniform stand-in for the reference's 5000-bin attitudeClasses.mat
    (spn.py:101; train.py:119) at class counts the fake dataset can actually
    cover: 5000-way classification from a few thousand random-init images is
    unlearnable without the reference's bvlc_alexnet bootstrap (BASELINE.md,
    round-4 SPN diagnosis), so the convergence harness scales the bin count
    to the data. FPS over a seeded uniform pool gives a near-optimal covering
    radius, i.e. the best quantization floor per class.
    """
    rs = np.random.RandomState(seed)
    q = rs.randn(pool, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q[q[:, 0] < 0] *= -1.0
    picked = np.empty((num_classes, 4), np.float64)
    picked[0] = q[0]
    # 1 - |q·p| is monotone in geodesic distance and identifies q with -q.
    mind = 1.0 - np.abs(q @ picked[0])
    for i in range(1, num_classes):
        picked[i] = q[int(np.argmax(mind))]
        np.minimum(mind, 1.0 - np.abs(q @ picked[i]), out=mind)
    return picked.astype(np.float32)
