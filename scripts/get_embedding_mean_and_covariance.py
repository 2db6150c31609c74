"""Precompute SPEED+ style-embedding statistics — reference
src/styleaug/get_embedding_mean_and_covariance.py:25-81.

Runs the StylePredictor over a directory of images (batched, jitted, on TPU
when available) and writes:
  assets/embeddings_speedplus.npy               (N, 100)
  assets/style_embedding_speedplus_mean.npy     (100,)
  assets/embedding_covariance_speedplus.npy     (100, 100)

The predictor checkpoint (checkpoint_stylepredictor.pth) is absent from this
environment; pass --checkpoint with a converted .msgpack or run with random
init for pipeline testing (--allow_random_init).
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True,
                    help="Directory of style images (searched recursively)")
    ap.add_argument("--batchsize", type=int, default=8)
    ap.add_argument("--input_size", type=int, nargs=2, default=(320, 480),
                    help="H W to resize images to")
    ap.add_argument("--checkpoint", type=str, default="",
                    help="StylePredictor params (.msgpack)")
    ap.add_argument("--allow_random_init", action="store_true")
    ap.add_argument("--out_dir", type=str, default="assets")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from speedplusbaseline_tpu.models.style_predictor import StylePredictor

    paths = []
    for root, _, files in os.walk(args.data_dir):
        for f in sorted(files):
            if f.lower().endswith((".jpg", ".jpeg", ".png")):
                paths.append(os.path.join(root, f))
    if not paths:
        raise SystemExit(f"no images under {args.data_dir}")
    print(f"{len(paths)} images")

    model = StylePredictor()
    h, w = args.input_size
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, h, w, 3)))
    if args.checkpoint:
        from flax import serialization

        with open(args.checkpoint, "rb") as f:
            variables = serialization.from_bytes(variables, f.read())
    elif not args.allow_random_init:
        raise SystemExit("no --checkpoint given (use --allow_random_init to "
                         "run the pipeline with random weights)")

    @jax.jit
    def embed(batch):
        return model.apply(variables, batch, train=False)

    out = np.zeros((len(paths), 100), np.float32)
    bs = args.batchsize
    for i in range(0, len(paths) - len(paths) % bs, bs):
        imgs = [np.asarray(Image.open(p).convert("RGB").resize((w, h)))
                for p in paths[i:i + bs]]
        batch = jnp.asarray(np.stack(imgs), jnp.float32) / 255.0
        out[i:i + bs] = np.asarray(embed(batch))
        if (i // bs) % 20 == 0:
            print(f"{i}/{len(paths)}")
    n = len(paths) - len(paths) % bs
    out = out[:n]

    mean = out.mean(axis=0)
    sigma = np.cov(out, rowvar=False)
    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, "embeddings_speedplus.npy"), out)
    np.save(os.path.join(args.out_dir, "style_embedding_speedplus_mean.npy"), mean)
    np.save(os.path.join(args.out_dir, "embedding_covariance_speedplus.npy"), sigma)
    print("saved mean/cov to", args.out_dir)


if __name__ == "__main__":
    main()
