"""Export a trained KRN's MobileNetV2 backbone in torchvision state-dict
format — the exact .pth file scripts/convert_torchvision_mobilenet.py (and
therefore maybe_load_pretrained) consumes.

The reference KRN's quality rests on ImageNet-pretrained MobileNetV2
features (/root/reference/src/nets/park2019.py:107, ``pretrained=True``).
That binary can't be downloaded here (no egress), but the same
transfer-learning arc can be reproduced in-environment, mirroring the SPN
bvlc proof (scripts/dump_spn_convs.py): train a donor KRN on a full split,
dump its learned backbone with this script into torchvision layout, convert
it back through the REAL converter chain, and bootstrap a reduced-data arm
from it (scripts/krn_transfer_run.py records the boot-vs-scratch curves).

This is the exact inverse of models/weight_convert.convert_mobilenet_v2:
  flax conv kernel (kh, kw, I/g, O) -> torch (O, I/g, kh, kw)
  flax BN scale/bias + batch_stats mean/var ->
      torch weight/bias/running_mean/running_var
so `convert_mobilenet_v2(dump(params, stats))` round-trips bit-exactly
(tests/test_torch_parity.py TestKRNBackboneRoundTrip).

Usage: python scripts/dump_krn_backbone.py <model_best.msgpack> <out.pth>
Pure host-side numpy/torch; safe to run next to a live TPU process.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

# (expand_ratio, repeats) schedule — mirrors mobilenetv2._IR_SETTINGS and
# the forward mapping in weight_convert.convert_mobilenet_v2.
_SETTINGS = [(1, 1), (6, 2), (6, 3), (6, 4), (6, 3), (6, 3), (6, 1)]


def _inv_conv(k) -> np.ndarray:
    """flax (kh, kw, I/g, O) -> torch (O, I/g, kh, kw)."""
    return np.ascontiguousarray(
        np.transpose(np.asarray(k, dtype=np.float32), (3, 2, 0, 1)))


def _inv_convbn(sd, conv_key, bn_key, p, s):
    sd[conv_key + ".weight"] = _inv_conv(p["Conv_0"]["kernel"])
    bn_p, bn_s = p["BatchNorm_0"], s["BatchNorm_0"]
    sd[bn_key + ".weight"] = np.asarray(bn_p["scale"], dtype=np.float32)
    sd[bn_key + ".bias"] = np.asarray(bn_p["bias"], dtype=np.float32)
    sd[bn_key + ".running_mean"] = np.asarray(bn_s["mean"], dtype=np.float32)
    sd[bn_key + ".running_var"] = np.asarray(bn_s["var"], dtype=np.float32)


def backbone_to_torchvision(params, stats) -> dict:
    """(params, batch_stats) trees of models.mobilenetv2.MobileNetV2Features
    -> torchvision ``mobilenet_v2().features`` state-dict (numpy arrays)."""
    sd: dict = {}
    _inv_convbn(sd, "features.0.0", "features.0.1",
                params["stem"], stats["stem"])
    idx = 1
    for (t, n) in _SETTINGS:
        for _ in range(n):
            name = f"block{idx}"
            p, s = params[name], stats[name]
            base = f"features.{idx}.conv"
            if t != 1:
                _inv_convbn(sd, f"{base}.0.0", f"{base}.0.1",
                            p["expand"], s["expand"])
                dw_i, proj_conv_i, proj_bn_i = 1, 2, 3
            else:
                dw_i, proj_conv_i, proj_bn_i = 0, 1, 2
            _inv_convbn(sd, f"{base}.{dw_i}.0", f"{base}.{dw_i}.1",
                        p["depthwise"], s["depthwise"])
            # torchvision's project conv/BN are bare children of `conv`
            # (conv.N / conv.N+1), not nested Sequentials — the key shapes
            # still match what _inv_convbn emits.
            _inv_convbn(sd, f"{base}.{proj_conv_i}", f"{base}.{proj_bn_i}",
                        p["project"], s["project"])
            idx += 1
    return sd


def dump(ckpt_path: str, out_path: str) -> dict:
    """Load a trained KRN checkpoint, export its ``base`` subtree as a
    torch-saved torchvision state-dict."""
    import torch
    from flax import serialization

    with open(ckpt_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = raw["params"] if "params" in raw else raw
    stats = raw.get("batch_stats", {})
    if "net" in params:  # DANN checkpoint: KRN lives under net/
        params, stats = params["net"], stats.get("net", {})
    sd = backbone_to_torchvision(params["base"], stats["base"])
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, out_path)
    return sd


if __name__ == "__main__":
    ckpt, out = _sys.argv[1], _sys.argv[2]
    sd = dump(ckpt, out)
    print(f"{len(sd)} tensors")
    print("wrote", out)
