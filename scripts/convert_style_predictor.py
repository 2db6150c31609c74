"""Convert StylePredictor torch checkpoint -> flax msgpack.

Ingests the public philipjackson/style-augmentation release
(checkpoint_stylepredictor.pth, the file the reference loads at
styleAugmentor.py:30-34 — absent from this environment) and writes
assets/style_predictor.msgpack, which
scripts/get_embedding_mean_and_covariance.py consumes via --checkpoint to
precompute the SPEED+ style-embedding mean/covariance.

Run: python scripts/convert_style_predictor.py --src checkpoint_stylepredictor.pth
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", default="assets/style_predictor.msgpack")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch
    from flax import serialization

    from speedplusbaseline_tpu.models.style_predictor import StylePredictor
    from speedplusbaseline_tpu.models.weight_convert import (
        convert_style_predictor,
    )

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict_stylepredictor", ckpt)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    model = StylePredictor()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 96, 96, 3)))
    converted = convert_style_predictor(sd, variables)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(converted)))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
