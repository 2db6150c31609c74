"""Pre-decoded RoI cache — the cure for the host-decode bottleneck.

The SPEED+ frames are 1920x1200 JPEGs but every training/eval crop lies in a
bounded neighborhood of the target bbox (reference transforms.py:112-190:
RandomCrop enlarges the RoI by U[1, 1.5] and shifts it by up to 0.2*roi, so
every possible crop is inside center +- 1.05*max(w, h); the eval crop uses
1.2x/2 = 0.6 and SPN clamps the bbox itself). ``build_cache`` decodes each
frame ONCE offline, crops that union box, downscales it to at most
``cache_size`` px and re-encodes (quality 95) — at the reference bbox scale
this is ~10x fewer pixels per image, so the per-worker host rate rises by
about that factor. The loaders (data/csv_dataset.py) then remap bbox /
keypoints into cache coordinates, crop from the small cached image and map
the crop box back to original pixel coordinates for the pose pipeline.

Pixels are resampled twice (cache downscale + final crop resize) and JPEG
re-encoded, so crops are visually identical but not bit-identical to the
full-frame path; the random augmentation stack dwarfs the difference. The
cache NEVER upsamples: scale = min(1, cache_size / box_side).

Layout: <cache_dir>/<dataname>/<domain>/images_cache/*.jpg plus a
``cache_manifest.csv`` with rows [relpath, cache_relpath, x0, y0, sx, sy].
"""
from __future__ import annotations

import csv
import logging
import math
import os
import os.path as osp
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

CACHE_MARGIN = 1.05  # covers U[1,1.5]/2 + 0.2*1.5 = 0.75 + 0.3 (transforms.py)
MANIFEST = "cache_manifest.csv"

# (cache_abspath, x0, y0, sx, sy)
CacheEntry = Tuple[str, float, float, float, float]


def union_box(bbox, img_w: int, img_h: int):
    """Union of every crop box RandomCrop/ResizeCrop can draw for ``bbox``,
    clamped to the frame. Returns (x0, x1, y0, y1) ints."""
    xmin, xmax, ymin, ymax = [float(v) for v in bbox]
    w, h = xmax - xmin, ymax - ymin
    cx, cy = xmin + w / 2.0, ymin + h / 2.0
    half = CACHE_MARGIN * max(w, h)
    x0 = max(0, int(math.floor(cx - half)))
    x1 = min(img_w, int(math.ceil(cx + half)))
    y0 = max(0, int(math.floor(cy - half)))
    y1 = min(img_h, int(math.ceil(cy + half)))
    return x0, x1, y0, y1


def build_cache(dataroot: str, dataname: str, domain: str, csv_files,
                cache_dir: str, cache_size: int = 512,
                quality: int = 95) -> str:
    """Build the cache for every image referenced by ``csv_files`` (raw
    preprocess.py-schema CSVs: imagepath, xmin, xmax, ymin, ymax, ...).
    Returns the manifest path."""
    import cv2
    import pandas as pd

    root = osp.join(dataroot, dataname)
    out_root = osp.join(cache_dir, dataname, domain)
    img_out = osp.join(out_root, "images_cache")
    os.makedirs(img_out, exist_ok=True)

    seen = {}
    for f in csv_files:
        df = pd.read_csv(f, header=None)
        for _, row in df.iterrows():
            rel = str(row[0]).strip()
            if rel not in seen:
                seen[rel] = np.array(row[1:5], dtype=np.float32)

    rows = []
    for i, (rel, bbox) in enumerate(sorted(seen.items())):
        src = osp.join(root, rel)
        img = cv2.imread(src, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"failed to decode {src}")
        ih, iw = img.shape[:2]
        x0, x1, y0, y1 = union_box(bbox, iw, ih)
        crop = img[y0:y1, x0:x1]
        bh, bw = crop.shape[:2]
        scale = min(1.0, cache_size / max(bw, bh))
        ow = max(1, int(round(bw * scale)))
        oh = max(1, int(round(bh * scale)))
        if scale < 1.0:
            crop = cv2.resize(crop, (ow, oh), interpolation=cv2.INTER_AREA)
        cache_rel = osp.join("images_cache",
                             osp.splitext(osp.basename(rel))[0] + ".jpg")
        cv2.imwrite(osp.join(out_root, cache_rel), crop,
                    [cv2.IMWRITE_JPEG_QUALITY, quality])
        rows.append([rel, cache_rel, x0, y0, ow / bw, oh / bh])
        if (i + 1) % 500 == 0:
            logger.info("cached %d/%d images", i + 1, len(seen))

    manifest = osp.join(out_root, MANIFEST)
    with open(manifest, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    logger.info("cache built: %d images -> %s", len(rows), out_root)
    return manifest


def load_manifest(cache_dir: str, dataname: str,
                  domain: str) -> Optional[Dict[str, CacheEntry]]:
    """relpath -> (cache_abspath, x0, y0, sx, sy), or None if absent."""
    out_root = osp.join(cache_dir, dataname, domain)
    manifest = osp.join(out_root, MANIFEST)
    if not osp.exists(manifest):
        return None
    table: Dict[str, CacheEntry] = {}
    with open(manifest, newline="") as f:
        for rel, cache_rel, x0, y0, sx, sy in csv.reader(f):
            table[rel] = (osp.join(out_root, cache_rel),
                          float(x0), float(y0), float(sx), float(sy))
    return table


def to_cache_coords(entry: CacheEntry, bbox, keypts=None):
    """Map an original-pixel bbox [xmin,xmax,ymin,ymax] (and optional (2,K)
    keypoints) into the cached image's coordinate frame."""
    _, x0, y0, sx, sy = entry
    b = np.array([(bbox[0] - x0) * sx, (bbox[1] - x0) * sx,
                  (bbox[2] - y0) * sy, (bbox[3] - y0) * sy], dtype=np.float32)
    if keypts is None:
        return b, None
    k = np.asarray(keypts, dtype=np.float32).copy()
    k[0] = (k[0] - x0) * sx
    k[1] = (k[1] - y0) * sy
    return b, k


def to_original_coords(entry: CacheEntry, bbox):
    """Inverse of to_cache_coords for a crop box (for the pose pipeline,
    which needs the crop box in original camera pixels)."""
    _, x0, y0, sx, sy = entry
    return np.array([x0 + bbox[0] / sx, x0 + bbox[1] / sx,
                     y0 + bbox[2] / sy, y0 + bbox[3] / sy], dtype=np.float32)
