"""Convert Ghiasi transformer torch checkpoint -> flax msgpack.

Ingests the public philipjackson/style-augmentation release
(checkpoint_transformer.pth with key 'state_dict_ghiasi', the file the
reference loads at styleAugmentor.py:23-27 — absent from this environment)
and writes assets/ghiasi_params.msgpack, which train.py auto-loads when
--randomize_texture is on.

Run: python scripts/convert_ghiasi.py --src checkpoint_transformer.pth
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
    ap.add_argument("--out", default="assets/ghiasi_params.msgpack")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch
    from flax import serialization

    from speedplusbaseline_tpu.models import Ghiasi
    from speedplusbaseline_tpu.models.weight_convert import convert_ghiasi

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict_ghiasi", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}

    model = Ghiasi()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 100)))
    params = convert_ghiasi(sd, variables["params"])

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(params))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
