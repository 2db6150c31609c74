"""Checkpoint converters: torch/caffe weight formats -> flax params.

Covers the three pretrained-weight dependencies of the reference:
  * torchvision ``mobilenet_v2`` ImageNet weights -> KRN backbone
    (reference park2019.py:107, ``pretrained=True``)
  * ``bvlc_alexnet.npy`` (caffe, HWIO) conv1-5 -> SPN trunk
    (reference spn.py:101-123)
  * ``checkpoint_transformer.pth`` (philipjackson/style-augmentation) ->
    Ghiasi flax params (reference styleAugmentor.py:23-27)

None of the binary assets ship in this environment (no network egress;
.MISSING_LARGE_BLOBS), so these converters are exercised by tests on
synthetically-generated state dicts with the original layouts, and run for
real when a user provides the files.

Layout rules:
  torch Conv2d  (O, I/g, kh, kw) -> flax (kh, kw, I/g, O): transpose(2,3,1,0)
  torch Linear  (O, I)           -> flax (I, O):           transpose
  torch BN      weight/bias/running_mean/running_var ->
                scale/bias + batch_stats mean/var
  caffe conv    (kh, kw, I/g, O) -> flax: identity (already HWIO)
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t_conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _t_lin(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w)))


def _bn(prefix: str, sd: Dict[str, Any]):
    return (
        {"scale": np.asarray(sd[prefix + ".weight"]),
         "bias": np.asarray(sd[prefix + ".bias"])},
        {"mean": np.asarray(sd[prefix + ".running_mean"]),
         "var": np.asarray(sd[prefix + ".running_var"])},
    )


def _convbn(conv_key: str, bn_key: str, sd) -> tuple:
    params_bn, stats_bn = _bn(bn_key, sd)
    params = {"Conv_0": {"kernel": _t_conv(sd[conv_key + ".weight"])},
              "BatchNorm_0": params_bn}
    stats = {"BatchNorm_0": stats_bn}
    return params, stats


def convert_mobilenet_v2(sd: Dict[str, Any]):
    """torchvision mobilenet_v2 state_dict -> (params, batch_stats) trees for
    models.mobilenetv2.MobileNetV2Features (stem + block1..block17).

    torchvision layout: features.0 = ConvBNReLU stem; features.i (i=1..17) =
    InvertedResidual with .conv = [ConvBNReLU expand]? + ConvBNReLU dw +
    Conv project + BN.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem"], stats["stem"] = _convbn("features.0.0", "features.0.1", sd)

    # (expand_ratio, repeats) schedule mirrors mobilenetv2._IR_SETTINGS.
    settings = [(1, 1), (6, 2), (6, 3), (6, 4), (6, 3), (6, 3), (6, 1)]
    idx = 1
    for (t, n) in settings:
        for _ in range(n):
            name = f"block{idx}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            base = f"features.{idx}.conv"
            if t != 1:
                p["expand"], s["expand"] = _convbn(f"{base}.0.0", f"{base}.0.1", sd)
                dw_i, proj_conv_i, proj_bn_i = 1, 2, 3
            else:
                dw_i, proj_conv_i, proj_bn_i = 0, 1, 2
            p["depthwise"], s["depthwise"] = _convbn(
                f"{base}.{dw_i}.0", f"{base}.{dw_i}.1", sd)
            bn_p, bn_s = _bn(f"{base}.{proj_bn_i}", sd)
            p["project"] = {
                "Conv_0": {"kernel": _t_conv(sd[f"{base}.{proj_conv_i}.weight"])},
                "BatchNorm_0": bn_p,
            }
            s["project"] = {"BatchNorm_0": bn_s}
            params[name] = p
            stats[name] = s
            idx += 1
    return params, stats


def load_mobilenet_v2_into_krn(krn_variables, sd: Dict[str, Any]):
    """Replace the ``base`` subtree of KRN variables with converted
    torchvision weights; extras/head keep their fresh init."""
    import jax

    params, stats = convert_mobilenet_v2(sd)
    new_vars = jax.tree_util.tree_map(lambda x: x, krn_variables)  # copy refs
    new_params = dict(new_vars["params"])
    new_params["base"] = jax.tree_util.tree_map(np.asarray, params)
    new_stats = dict(new_vars.get("batch_stats", {}))
    new_stats["base"] = jax.tree_util.tree_map(np.asarray, stats)
    return {**new_vars, "params": new_params, "batch_stats": new_stats}


def convert_bvlc_alexnet(weights_dict: Dict[str, Any], spn_params):
    """bvlc_alexnet.npy dict -> SPN params with conv1-5 replaced
    (spn.py:104-123). The caffe arrays are HWIO already — flax-native, no
    transpose (the torch reference had to transpose to OIHW)."""
    out = dict(spn_params)
    for name in ["conv1", "conv2", "conv3", "conv4", "conv5"]:
        entry = dict(out[name])
        for data in weights_dict[name]:
            data = np.asarray(data)
            if data.ndim == 4:
                entry["kernel"] = data.astype(np.float32)
            else:
                entry["bias"] = data.astype(np.float32)
        out[name] = entry
    return out


def convert_spn_torch(sd: Dict[str, Any], spn_params):
    """Full torch SpacecraftPoseNet state_dict -> flax SPN params.

    Beyond the layout transposes, fc6/fc9 consume the FLATTENED pool5 tensor:
    torch flattens NCHW (C-major: index = c*36 + h*6 + w, reference spn.py:133)
    while the flax model flattens NHWC (models/spn.py:62), so the input axis
    of those two Linear weights is permuted (C,6,6) -> (6,6,C)."""
    out = dict(spn_params)

    def put(name, kernel, bias):
        out[name] = {"kernel": np.ascontiguousarray(kernel.astype(np.float32)),
                     "bias": np.asarray(bias, dtype=np.float32)}

    for name in ["conv1", "conv2", "conv3", "conv4", "conv5"]:
        put(name, _t_conv(sd[name + ".weight"]), sd[name + ".bias"])

    for name in ["fc6", "fc9"]:
        w = np.asarray(sd[name + ".weight"])  # (4096, 9216) over (C=256,6,6)
        w = w.reshape(w.shape[0], 256, 6, 6).transpose(0, 2, 3, 1)
        put(name, w.reshape(w.shape[0], -1).T, sd[name + ".bias"])

    for name in ["fc7", "fc8", "fc10", "fc11"]:
        put(name, _t_lin(sd[name + ".weight"]), sd[name + ".bias"])
    return out


def _replace_subtree(tree, path, value):
    """Immutable nested-dict update: tree[path[0]][path[1]]... = value."""
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _replace_subtree(out.get(path[0], {}), path[1:], value)
    return out


def maybe_load_pretrained(cfg, state, assets_dir: str):
    """Load converted pretrained weights into a fresh TrainState when the
    assets exist (no-op otherwise).

    KRN/RevGrad: ``mobilenetv2_backbone.msgpack`` -> the ``base`` subtree
    (path ``net/base`` under DANN). SPN: ``bvlc_alexnet.npy`` -> conv1-5.
    """
    import logging
    import os.path as osp

    from flax import serialization

    logger = logging.getLogger(__name__)

    if cfg.model_name == "krn":
        ckpt = osp.join(assets_dir, "mobilenetv2_backbone.msgpack")
        if not osp.exists(ckpt):
            return state
        with open(ckpt, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        path = ("net", "base") if cfg.dann else ("base",)

        def get(tree, p):
            for k in p:
                tree = tree[k]
            return tree

        new_params = _replace_subtree(
            state.params, path,
            serialization.from_state_dict(get(state.params, path),
                                          raw["params"]))
        new_stats = _replace_subtree(
            state.batch_stats, path,
            serialization.from_state_dict(get(state.batch_stats, path),
                                          raw["batch_stats"]))
        logger.info("MobileNetV2 ImageNet backbone loaded from %s", ckpt)
        return state.replace(params=new_params, batch_stats=new_stats)

    if cfg.model_name == "spn":
        bvlc = osp.join(assets_dir, "bvlc_alexnet.npy")
        if not osp.exists(bvlc):
            return state
        weights = np.load(bvlc, allow_pickle=True, encoding="bytes").item()
        weights = {k.decode() if isinstance(k, bytes) else k: v
                   for k, v in weights.items()}
        logger.info("bvlc_alexnet conv1-5 loaded from %s", bvlc)
        return state.replace(params=convert_bvlc_alexnet(weights, state.params))

    return state


_GHIASI_TORCH_LAYERS = {
    # layer index -> (kind) for mapping torch module names
    0: "convinrelu", 1: "convinrelu", 2: "convinrelu",
    3: "res", 4: "res", 5: "res", 6: "res", 7: "res",
    8: "upsample", 9: "upsample", 10: "upsample",
}


def convert_ghiasi(sd: Dict[str, Any], ghiasi_params):
    """checkpoint_transformer.pth state dict (keys ``layers.N.*``) -> flax
    Ghiasi params (models/ghiasi.py layerN names)."""
    out = {k: dict(v) for k, v in ghiasi_params.items()}

    def put(layer: str, sub: str, kernel=None, bias=None):
        entry = dict(out[layer].get(sub, {}))
        if kernel is not None:
            entry["kernel"] = kernel
        if bias is not None:
            entry["bias"] = bias
        d = dict(out[layer])
        d[sub] = entry
        out[layer] = d

    for i, kind in _GHIASI_TORCH_LAYERS.items():
        layer = f"layer{i}"
        p = f"layers.{i}."
        if kind == "convinrelu":
            put(layer, "Conv_0",
                kernel=_t_conv(sd[p + "conv.weight"]),
                bias=np.asarray(sd[p + "conv.bias"]))
        elif kind == "res":
            for j in (1, 2):
                put(layer, f"conv{j}",
                    kernel=_t_conv(sd[p + f"conv{j}.weight"]),
                    bias=np.asarray(sd[p + f"conv{j}.bias"]))
                put(layer, f"fc_gamma{j}",
                    kernel=_t_lin(sd[p + f"fc_gamma{j}.weight"]),
                    bias=np.asarray(sd[p + f"fc_gamma{j}.bias"]))
                put(layer, f"fc_beta{j}",
                    kernel=_t_lin(sd[p + f"fc_beta{j}.weight"]),
                    bias=np.asarray(sd[p + f"fc_beta{j}.bias"]))
        else:  # upsample
            put(layer, "Conv_0",
                kernel=_t_conv(sd[p + "conv.weight"]),
                bias=np.asarray(sd[p + "conv.bias"]))
            put(layer, "fc_gamma",
                kernel=_t_lin(sd[p + "fc_gamma.weight"]),
                bias=np.asarray(sd[p + "fc_gamma.bias"]))
            put(layer, "fc_beta",
                kernel=_t_lin(sd[p + "fc_beta.weight"]),
                bias=np.asarray(sd[p + "fc_beta.bias"]))
    return out


def convert_style_predictor(sd: Dict[str, Any], variables):
    """checkpoint_stylepredictor.pth state dict -> flax StylePredictor
    variables ({"params", "batch_stats"}).

    The flax module names (models/style_predictor.py) mirror the reference's
    attribute names exactly (stylePredictor.py:6-243: Conv2d_1a_3x3 ...
    Mixed_6e, branch*, conv/bn inside BasicConv2d, fc head), so the mapping
    is a generic key-path walk plus the standard layout transposes."""
    from flax import serialization

    params = serialization.to_state_dict(variables["params"])
    stats = serialization.to_state_dict(variables["batch_stats"])

    def walk(tree, path):
        for k in path:
            tree = tree[k]  # KeyError = structural mismatch, fail loudly
        return tree

    for key, val in sd.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        val = np.asarray(val)
        if parts[0] == "fc":
            if leaf == "weight":
                params["fc"]["kernel"] = _t_lin(val)
            else:
                params["fc"]["bias"] = val.astype(np.float32)
            continue
        mod = parts[:-1]  # e.g. [Mixed_5b, branch1x1, conv] / [..., bn]
        if mod[-1] == "conv":
            assert leaf == "weight", key  # BasicConv2d convs have no bias
            walk(params, mod[:-1])["conv"]["kernel"] = _t_conv(val)
        elif mod[-1] == "bn":
            if leaf == "weight":
                walk(params, mod[:-1])["bn"]["scale"] = val.astype(np.float32)
            elif leaf == "bias":
                walk(params, mod[:-1])["bn"]["bias"] = val.astype(np.float32)
            elif leaf == "running_mean":
                walk(stats, mod[:-1])["bn"]["mean"] = val.astype(np.float32)
            elif leaf == "running_var":
                walk(stats, mod[:-1])["bn"]["var"] = val.astype(np.float32)
            else:
                raise KeyError(f"unexpected BN leaf: {key}")
        else:
            raise KeyError(f"unmapped torch key: {key}")
    return {"params": params, "batch_stats": stats}
