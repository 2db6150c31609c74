"""Host input-pipeline throughput on SPEED+-sized JPEGs (VERDICT item 6a).

Generates synthetic 1920x1200 JPEGs, then measures images/sec through
  * the native fused decode+crop+resize core (speedloader.cpp),
  * the Python cv2/PIL decode + random_crop path,
  * the full threaded DataLoader (batch assembly + device_put to CPU jax),
at the KRN training crop (224x224). The reference's bottleneck is exactly
this path (8 torch workers doing PIL decode, reference build.py:45-66).

Prints one JSON line:
  {"native_img_s_per_worker": ..., "python_img_s_per_worker": ...,
   "dataloader_img_s": ..., "host_cores": N}

Per-worker rates scale ~linearly with cores (decode releases the GIL in both
paths); a real v5e host has dozens of cores per chip, so feeding rate =
per-worker rate x cores. Run with JAX_PLATFORMS=cpu — no TPU needed.

Usage: python scripts/bench_host_loader.py [num_images]
"""
from __future__ import annotations

import json
import os
import os.path as osp
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

_sys_path_root = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, _sys_path_root)

import numpy as np

import speedplusbaseline_tpu  # noqa: F401

W, H = 1920, 1200
CROP = (224, 224)


def make_jpegs(root: str, n: int):
    from PIL import Image

    rs = np.random.RandomState(0)
    paths = []
    base = rs.randint(0, 255, size=(H, W, 3), dtype=np.uint8)
    for i in range(n):
        # vary content a little so decode work is realistic, reuse the base
        # noise to keep generation fast
        img = np.roll(base, i * 17, axis=1)
        p = osp.join(root, f"img{i:04d}.jpg")
        Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    return paths


def rand_boxes(rs, n):
    boxes = []
    for _ in range(n):
        size = rs.randint(300, 900)
        x = rs.randint(0, W - size)
        y = rs.randint(0, H - size)
        boxes.append((float(x), float(y), float(size), float(size)))
    return boxes


def bench_native(paths, boxes):
    from speedplusbaseline_tpu.native import decode_crop_resize, native_available

    if not native_available():
        return None
    for p, b in zip(paths[:4], boxes[:4]):  # warmup
        decode_crop_resize(p, b, CROP)
    t0 = time.perf_counter()
    for p, b in zip(paths, boxes):
        out = decode_crop_resize(p, b, CROP)
    dt = time.perf_counter() - t0
    assert out.shape == (*CROP, 3)
    return len(paths) / dt


def bench_python(paths, boxes):
    from speedplusbaseline_tpu.data.csv_dataset import _imread
    from speedplusbaseline_tpu.data.transforms import random_crop

    rng = np.random.Generator(np.random.Philox(7))
    kp = np.zeros((2, 11), np.float32)
    for p in paths[:4]:
        _imread(p)
    t0 = time.perf_counter()
    for p, (x, y, s, _) in zip(paths, boxes):
        img = _imread(p)
        bbox = np.array([x, x + s, y, y + s], np.float32)
        crop, _, _ = random_crop(rng, img, bbox, kp, CROP, True)
    dt = time.perf_counter() - t0
    return len(paths) / dt


def bench_python_cached(tmp, paths, boxes):
    """Per-worker rate through the pre-decoded RoI cache (data/cache.py) —
    the shipped cure for the full-frame decode bottleneck. Builds the cache
    (one-time offline cost, excluded from the rate) and times decode+crop of
    the ~10x-smaller cached images exactly as the dataset path does."""
    from speedplusbaseline_tpu.data.cache import (
        build_cache,
        load_manifest,
        to_cache_coords,
    )
    from speedplusbaseline_tpu.data.csv_dataset import _imread
    from speedplusbaseline_tpu.data.transforms import random_crop

    dataroot = osp.join(tmp, "speedplus")
    rels, rows = [], []
    for p, (x, y, s, _) in zip(paths, boxes):
        rel = osp.relpath(p, dataroot)
        rels.append(rel)
        rows.append(",".join(str(v) for v in
                             [rel, x, x + s, y, y + s] + [0.0] * 29))
    csv_path = osp.join(tmp, "cache_bench.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows))
    cache_dir = osp.join(tmp, "roi_cache")
    build_cache(tmp, "speedplus", "synthetic", [csv_path], cache_dir)
    manifest = load_manifest(cache_dir, "speedplus", "synthetic")

    rng = np.random.Generator(np.random.Philox(7))
    kp = np.zeros((2, 11), np.float32)
    for rel in rels[:4]:  # warmup
        _imread(manifest[rel][0])
    t0 = time.perf_counter()
    for rel, (x, y, s, _) in zip(rels, boxes):
        entry = manifest[rel]
        img = _imread(entry[0])
        bbox = np.array([x, x + s, y, y + s], np.float32)
        b, k = to_cache_coords(entry, bbox, kp)
        crop, _, _ = random_crop(rng, img, b, k, CROP, True)
    dt = time.perf_counter() - t0
    return len(paths) / dt


def bench_dataloader(tmp, paths, boxes, use_native):
    """Full DataLoader path over a generated CSV (KRN schema)."""
    from speedplusbaseline_tpu.config import default_cfg
    from speedplusbaseline_tpu.data import make_dataloader

    dataroot = osp.join(tmp, "speedplus")
    domain = osp.join(dataroot, "synthetic")
    os.makedirs(osp.join(domain, "splits_krn"), exist_ok=True)
    rows = []
    rs = np.random.RandomState(1)
    for p, (x, y, s, _) in zip(paths, boxes):
        rel = osp.relpath(p, dataroot)
        vals = [rel, x, x + s, y, y + s] + list(rs.rand(7)) + \
            list(rs.rand(22) * s)
        rows.append(",".join(str(v) for v in vals))
    with open(osp.join(domain, "splits_krn", "train.csv"), "w") as f:
        f.write("\n".join(rows))

    cfg = default_cfg(dataroot=tmp, input_shape=CROP, batch_size=16,
                      num_workers=max(2, os.cpu_count() or 2),
                      use_native_loader=use_native)
    loader = make_dataloader(cfg, is_train=True, is_source=True)
    n = 0
    t0 = time.perf_counter()
    for batch in loader:
        n += batch["image"].shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    rs = np.random.RandomState(3)
    with tempfile.TemporaryDirectory() as tmp:
        img_dir = osp.join(tmp, "speedplus", "synthetic", "images")
        os.makedirs(img_dir, exist_ok=True)
        paths = make_jpegs(img_dir, n)
        boxes = rand_boxes(rs, n)

        native = bench_native(paths, boxes)
        python = bench_python(paths, boxes)
        cached = bench_python_cached(tmp, paths, boxes)
        dl = bench_dataloader(tmp, paths, boxes, use_native=native is not None)

    print(json.dumps({
        "native_img_s_per_worker": round(native, 1) if native else None,
        "python_img_s_per_worker": round(python, 1),
        "cached_img_s_per_worker": round(cached, 1),
        "dataloader_img_s": round(dl, 1),
        "host_cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
