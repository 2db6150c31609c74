"""Export SPN conv1-5 from a trained flax checkpoint in bvlc_alexnet.npy
dict format — the exact file `maybe_load_pretrained` consumes.

The reference never trains SPN from scratch: it bootstraps conv1-5 from
bvlc_alexnet.npy (/root/reference/src/nets/spn.py:101-123). That binary
can't be downloaded here (no egress), but the same transfer-learning arc can
be reproduced in-environment: train SPN at a class count the fake dataset
covers (scripts/convergence_run.py --num_classes 500), dump its learned
conv trunk with this script, and bootstrap the full 5000-class arm from it
(drop the file as bvlc_alexnet.npy in a dir passed via SPEEDPLUS_ASSETS_DIR
— the same hook the pretrained-asset CLI tests use). The dict format
is {convN: [kernel(HWIO f32), bias]} — convert_bvlc_alexnet
(models/weight_convert.py:110-124) keys on ndim to tell them apart.

Usage: python scripts/dump_spn_convs.py <model_best.msgpack> <out.npy>
Pure host-side numpy; safe to run next to a live TPU process.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
from flax import serialization


def dump(ckpt_path: str, out_path: str) -> dict:
    with open(ckpt_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = raw["params"] if "params" in raw else raw
    weights = {}
    for i in range(1, 6):
        name = f"conv{i}"
        entry = params[name]
        kernel = np.asarray(entry["kernel"], dtype=np.float32)
        bias = np.asarray(entry["bias"], dtype=np.float32)
        assert kernel.ndim == 4 and bias.ndim == 1, (name, kernel.shape)
        weights[name] = [kernel, bias]
    np.save(out_path, np.array(weights, dtype=object), allow_pickle=True)
    return weights


if __name__ == "__main__":
    ckpt, out = _sys.argv[1], _sys.argv[2]
    w = dump(ckpt, out)
    print({k: [tuple(a.shape) for a in v] for k, v in w.items()})
    print("wrote", out)
