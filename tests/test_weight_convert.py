"""Weight-converter tests on synthetically generated torch-layout state
dicts (the real binaries are absent from this environment)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speedplusbaseline_tpu.models import Ghiasi, KeypointRegressionNet, SpacecraftPoseNet
from speedplusbaseline_tpu.models.weight_convert import (
    convert_bvlc_alexnet,
    convert_ghiasi,
    convert_mobilenet_v2,
)


def fake_torchvision_mobilenet_sd(rng):
    """Random state dict with torchvision mobilenet_v2 key names/shapes."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.01

    def bn(name, c):
        sd[name + ".weight"] = np.abs(rng.randn(c)).astype(np.float32)
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.01
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.01
        sd[name + ".running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 1.0

    conv("features.0.0", 32, 3, 3)
    bn("features.0.1", 32)

    settings = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
    in_ch = 32
    idx = 1
    for (t, c, n, s) in settings:
        for i in range(n):
            hidden = in_ch * t
            base = f"features.{idx}.conv"
            if t != 1:
                conv(f"{base}.0.0", hidden, in_ch, 1)
                bn(f"{base}.0.1", hidden)
                dw, pc, pb = 1, 2, 3
            else:
                dw, pc, pb = 0, 1, 2
            sd[f"{base}.{dw}.0.weight"] = (
                rng.randn(hidden, 1, 3, 3).astype(np.float32) * 0.01)
            bn(f"{base}.{dw}.1", hidden)
            conv(f"{base}.{pc}", c, hidden, 1)
            bn(f"{base}.{pb}", c)
            in_ch = c
            idx += 1
    return sd


class TestMobileNetConversion:
    def test_tree_matches_model_init(self, rng):
        sd = fake_torchvision_mobilenet_sd(rng)
        params, stats = convert_mobilenet_v2(sd)

        model = KeypointRegressionNet(11)
        v = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 224, 224, 3)), train=False)
        base_p = v["params"]["base"]
        base_s = v["batch_stats"]["base"]

        def shapes(tree):
            return jax.tree_util.tree_map(lambda x: np.asarray(x).shape, tree)

        assert shapes(jax.tree_util.tree_map(jnp.asarray, params)) == shapes(base_p)
        assert shapes(jax.tree_util.tree_map(jnp.asarray, stats)) == shapes(base_s)

    def test_converted_weights_flow_through_forward(self, rng):
        sd = fake_torchvision_mobilenet_sd(rng)
        params, stats = convert_mobilenet_v2(sd)
        model = KeypointRegressionNet(11)
        v = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 96, 96, 3)), train=False)
        v2 = {
            "params": {**v["params"], "base": jax.tree_util.tree_map(jnp.asarray, params)},
            "batch_stats": {**v["batch_stats"], "base": jax.tree_util.tree_map(jnp.asarray, stats)},
        }
        x = jnp.asarray(rng.rand(1, 96, 96, 3).astype(np.float32))
        a = model.apply(v, x, train=False)
        b = model.apply(v2, x, train=False)
        assert float(jnp.abs(a[0] - b[0]).max()) > 0  # weights actually used


class TestBvlcConversion:
    def test_conv_layers_replaced(self, rng):
        model = SpacecraftPoseNet(50)
        v = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 227, 227, 3)), train=False)
        shapes = {
            "conv1": (11, 11, 3, 96), "conv2": (5, 5, 128, 256),
            "conv3": (3, 3, 256, 384), "conv4": (3, 3, 192, 384),
            "conv5": (3, 3, 192, 256),
        }
        weights = {
            name: [rng.randn(*shape).astype(np.float32),
                   rng.randn(shape[-1]).astype(np.float32)]
            for name, shape in shapes.items()
        }
        out = convert_bvlc_alexnet(weights, v["params"])
        for name, shape in shapes.items():
            np.testing.assert_array_equal(np.asarray(out[name]["kernel"]),
                                          weights[name][0])
        # untouched layers keep their init
        np.testing.assert_array_equal(np.asarray(out["fc6"]["kernel"]),
                                      np.asarray(v["params"]["fc6"]["kernel"]))

    def test_dump_spn_convs_roundtrip(self, tmp_path):
        """scripts/dump_spn_convs.py closes the bvlc transfer loop: a trained
        flax checkpoint's conv1-5 must survive dump -> bvlc_alexnet.npy ->
        convert_bvlc_alexnet into a model with a DIFFERENT head width (the
        reference arc: 500-class-trained trunk bootstraps the 5000-class
        task, mirroring spn.py:101-123's caffe init)."""
        import sys

        sys.path.insert(0, "scripts")
        from dump_spn_convs import dump

        from flax import serialization

        src = SpacecraftPoseNet(50)
        v = src.init({"params": jax.random.PRNGKey(1)},
                     jnp.zeros((1, 227, 227, 3)), train=False)
        ckpt = tmp_path / "model_best.msgpack"
        ckpt.write_bytes(serialization.msgpack_serialize(
            serialization.to_state_dict(v)))

        out_npy = tmp_path / "bvlc_alexnet.npy"
        dump(str(ckpt), str(out_npy))

        dst = SpacecraftPoseNet(120)  # different class count than the donor
        v2 = dst.init({"params": jax.random.PRNGKey(2)},
                      jnp.zeros((1, 227, 227, 3)), train=False)
        loaded = np.load(out_npy, allow_pickle=True).item()
        out = convert_bvlc_alexnet(loaded, v2["params"])
        for name in ["conv1", "conv2", "conv3", "conv4", "conv5"]:
            np.testing.assert_array_equal(
                np.asarray(out[name]["kernel"]),
                np.asarray(v["params"][name]["kernel"]))
        # the new head keeps its fresh init (its shape differs from the donor)
        np.testing.assert_array_equal(np.asarray(out["fc8"]["kernel"]),
                                      np.asarray(v2["params"]["fc8"]["kernel"]))


def fake_ghiasi_sd(rng):
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05
        sd[name + ".bias"] = rng.randn(o).astype(np.float32) * 0.01

    def lin(name, o, i=100):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32) * 0.05
        sd[name + ".bias"] = rng.randn(o).astype(np.float32) * 0.01

    conv("layers.0.conv", 32, 3, 9)
    conv("layers.1.conv", 64, 32, 3)
    conv("layers.2.conv", 128, 64, 3)
    for i in range(3, 8):
        conv(f"layers.{i}.conv1", 128, 128, 3)
        conv(f"layers.{i}.conv2", 128, 128, 3)
        for j in (1, 2):
            lin(f"layers.{i}.fc_gamma{j}", 128)
            lin(f"layers.{i}.fc_beta{j}", 128)
    for i, (o, inp, k) in zip((8, 9, 10), ((64, 128, 3), (32, 64, 3), (3, 32, 9))):
        conv(f"layers.{i}.conv", o, inp, k)
        lin(f"layers.{i}.fc_gamma", o)
        lin(f"layers.{i}.fc_beta", o)
    return sd


class TestGhiasiConversion:
    def test_roundtrip_shapes_and_forward(self, rng):
        model = Ghiasi()
        v = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 100)))
        sd = fake_ghiasi_sd(rng)
        params = convert_ghiasi(sd, v["params"])

        def shapes(tree):
            return jax.tree_util.tree_map(lambda x: np.asarray(x).shape, tree)

        assert shapes(jax.tree_util.tree_map(jnp.asarray, params)) == \
            shapes(v["params"])

        x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        s = jnp.asarray(rng.randn(1, 100).astype(np.float32))
        out = model.apply({"params": params}, x, s)
        assert out.shape == (1, 32, 32, 3)
        # converted kernel actually used
        np.testing.assert_array_equal(
            np.asarray(params["layer0"]["Conv_0"]["kernel"]),
            sd["layers.0.conv.weight"].transpose(2, 3, 1, 0))
