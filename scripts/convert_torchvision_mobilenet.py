"""Convert torchvision mobilenet_v2 ImageNet weights -> KRN backbone msgpack.

The reference KRN uses torchvision's pretrained MobileNetV2 features as its
backbone (park2019.py:107). torchvision isn't installed and the machine has
no network egress, so this converter runs wherever the user has the
state_dict (``mobilenet_v2-*.pth`` from the torchvision model zoo or an
exported state_dict) and produces assets/mobilenetv2_backbone.msgpack, which
train.py loads into the KRN ``base`` subtree at startup when present.

Run: python scripts/convert_torchvision_mobilenet.py --src mobilenet_v2.pth
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="torch state_dict .pth")
    ap.add_argument("--out", default="assets/mobilenetv2_backbone.msgpack")
    args = ap.parse_args(argv)

    import torch
    from flax import serialization

    from speedplusbaseline_tpu.models.weight_convert import convert_mobilenet_v2

    sd = torch.load(args.src, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    params, stats = convert_mobilenet_v2(sd)
    payload = serialization.msgpack_serialize(
        serialization.to_state_dict({"params": params, "batch_stats": stats}))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(payload)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
