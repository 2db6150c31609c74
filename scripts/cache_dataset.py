"""Build the pre-decoded RoI cache for a SPEED+ domain (data/cache.py).

The host decode of 1920x1200 frames is the end-to-end bottleneck (~33
img/s/worker native, BASELINE.md); the cache decodes each frame once
offline and stores the bounded crop-union region at <= --cache_size px
(~10x fewer pixels), which the loaders consume via --cache_dir.

Usage:
  python scripts/cache_dataset.py --dataroot $DATAROOT --domain synthetic \
      --csv splits_krn/train.csv [--csv splits_spn/train.csv ...] \
      --cache_dir $CACHEDIR [--cache_size 512] [--quality 95]
"""
from __future__ import annotations

import argparse
import logging
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from speedplusbaseline_tpu.data.cache import build_cache  # noqa: E402


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--dataname", default="speedplus")
    p.add_argument("--domain", required=True)
    p.add_argument("--csv", action="append", required=True,
                   help="CSV path(s) relative to <dataroot>/<dataname>/<domain>")
    p.add_argument("--cache_dir", required=True)
    p.add_argument("--cache_size", type=int, default=512)
    p.add_argument("--quality", type=int, default=95)
    args = p.parse_args(argv)

    csvs = [osp.join(args.dataroot, args.dataname, args.domain, c)
            for c in args.csv]
    manifest = build_cache(args.dataroot, args.dataname, args.domain, csvs,
                           args.cache_dir, args.cache_size, args.quality)
    print(f"manifest: {manifest}")


if __name__ == "__main__":
    main()
