"""Convert SPEED+ baseline binary assets into framework-native .npy files.

Inputs (from a speedplusbaseline checkout, MIT-licensed data assets):
  * src/utils/tangoPoints.mat        -> assets/tango_points.npy        (11, 3)
  * src/utils/attitudeClasses.mat    -> assets/attitude_classes.npy    (5000, 4)
  * src/styleaug/checkpoints/checkpoint_embeddings.pth
        -> assets/style_embedding_pbn_mean.npy (100,)
        -> assets/style_embedding_pbn_cov.npy  (100, 100)
  * src/styleaug/checkpoints/embedding_mean_speedplus.npy
        -> assets/style_embedding_speedplus_mean.npy (100,)

Run:  python scripts/convert_assets.py --src /path/to/speedplusbaseline
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="speedplusbaseline checkout root")
    ap.add_argument("--out", default="assets")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from scipy.io import loadmat

    tango = loadmat(os.path.join(args.src, "src/utils/tangoPoints.mat"))
    pts = np.asarray(tango["tango3Dpoints"], dtype=np.float32).T  # (11, 3)
    np.save(os.path.join(args.out, "tango_points.npy"), pts)
    print("tango_points:", pts.shape)

    att = loadmat(os.path.join(args.src, "src/utils/attitudeClasses.mat"))
    qclass = np.asarray(att["qClass"], dtype=np.float32)  # (5000, 4)
    np.save(os.path.join(args.out, "attitude_classes.npy"), qclass)
    print("attitude_classes:", qclass.shape)

    emb_path = os.path.join(args.src, "src/styleaug/checkpoints/checkpoint_embeddings.pth")
    if os.path.exists(emb_path):
        import torch

        ckpt = torch.load(emb_path, map_location="cpu", weights_only=False)
        mean = ckpt["pbn_embedding_mean"].numpy().reshape(-1).astype(np.float32)
        cov = ckpt["pbn_embedding_covariance"].numpy().astype(np.float32)
        np.save(os.path.join(args.out, "style_embedding_pbn_mean.npy"), mean)
        np.save(os.path.join(args.out, "style_embedding_pbn_cov.npy"), cov)
        print("pbn embedding:", mean.shape, cov.shape)

    sp_mean_path = os.path.join(
        args.src, "src/styleaug/checkpoints/embedding_mean_speedplus.npy")
    if os.path.exists(sp_mean_path):
        sp_mean = np.load(sp_mean_path).reshape(-1).astype(np.float32)
        np.save(os.path.join(args.out, "style_embedding_speedplus_mean.npy"), sp_mean)
        print("speedplus mean embedding:", sp_mean.shape)


if __name__ == "__main__":
    main()
