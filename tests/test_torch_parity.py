"""Whole-model numerical parity: flax models + weight converters vs the
reference's torch modules computed on the same random weights.

The reference's ghiasi.py and spn.py are pure torch (no torchvision) and
import cleanly, so we instantiate them with random weights, convert the state
dict through models/weight_convert.py, and assert the flax forward matches
the torch forward. For MobileNetV2 (reference park2019.py:107 uses
torchvision, which is absent here) we rebuild the torchvision module layout
in-test — same state-dict key names — and compare against our flax backbone.

These tests prove the converters are output-correct, so real checkpoint
files (torchvision mobilenet_v2, bvlc_alexnet.npy, checkpoint_transformer.pth)
will reproduce the reference's numerics when supplied by a user.
"""
import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speedplusbaseline_tpu.models import Ghiasi, SpacecraftPoseNet
from speedplusbaseline_tpu.models.mobilenetv2 import MobileNetV2Features
from speedplusbaseline_tpu.models.weight_convert import (
    convert_bvlc_alexnet,
    convert_ghiasi,
    convert_mobilenet_v2,
    convert_spn_torch,
)

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


def load_reference_module(relpath, name):
    path = os.path.join(REFERENCE, relpath)
    if not os.path.exists(path):
        pytest.skip(f"reference module {relpath} unavailable")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def to_nhwc(x_t: "torch.Tensor") -> jnp.ndarray:
    return jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())


class TestGhiasiParity:
    def test_forward_matches_reference_torch(self):
        ref_mod = load_reference_module("src/styleaug/ghiasi.py", "ref_ghiasi")
        tnet = ref_mod.Ghiasi()
        tnet.eval()
        sd = {k: v.numpy() for k, v in tnet.state_dict().items()}

        model = Ghiasi()
        v = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 100)))
        params = convert_ghiasi(sd, v["params"])

        g = torch.Generator().manual_seed(3)
        x_t = torch.rand(2, 3, 64, 64, generator=g)
        s_t = torch.randn(2, 100, generator=g) * 0.3
        with torch.no_grad():
            ref = tnet(x_t, s_t).numpy()

        with jax.default_matmul_precision("float32"):
            ours = model.apply({"params": params}, to_nhwc(x_t),
                               jnp.asarray(s_t.numpy()))
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.transpose(0, 2, 3, 1), atol=1e-4)


class TestSPNParity:
    def _models(self, num_classes=37):
        ref_mod = load_reference_module("src/nets/spn.py", "ref_spn")
        tnet = ref_mod.SpacecraftPoseNet(num_classes, pretrain=False)
        tnet.eval()
        model = SpacecraftPoseNet(num_classes)
        v = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 227, 227, 3)), train=False)
        return tnet, model, v["params"]

    def test_forward_matches_reference_torch(self):
        tnet, model, init_params = self._models()
        sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
        params = convert_spn_torch(sd, init_params)

        g = torch.Generator().manual_seed(5)
        x_t = torch.rand(2, 3, 227, 227, generator=g)
        with torch.no_grad():
            ref_c, ref_r = tnet(x_t)

        with jax.default_matmul_precision("float32"):
            ours_c, ours_r = model.apply({"params": params}, to_nhwc(x_t),
                                         train=False)
        np.testing.assert_allclose(np.asarray(ours_c), ref_c.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours_r), ref_r.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_bvlc_loader_matches_reference_load_weights(self, tmp_path):
        """Same fake bvlc_alexnet.npy through the reference's load_weights
        (spn.py:104-123, HWIO->OIHW transpose) and through our
        convert_bvlc_alexnet (HWIO kept, flax-native): forwards must agree."""
        tnet, model, init_params = self._models()

        rs = np.random.RandomState(11)
        shapes = {"conv1": (11, 11, 3, 96), "conv2": (5, 5, 48, 256),
                  "conv3": (3, 3, 256, 384), "conv4": (3, 3, 192, 384),
                  "conv5": (3, 3, 192, 256)}
        weights = {name: [rs.randn(*shape).astype(np.float32) * 0.05,
                          rs.randn(shape[-1]).astype(np.float32) * 0.01]
                   for name, shape in shapes.items()}
        npy = tmp_path / "bvlc_alexnet.npy"
        np.save(npy, np.array(weights, dtype=object), allow_pickle=True)

        tnet.load_weights(str(npy))
        # fcs from torch so the whole forward is comparable
        sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
        params = convert_spn_torch(sd, init_params)
        params = convert_bvlc_alexnet(weights, params)

        g = torch.Generator().manual_seed(7)
        x_t = torch.rand(1, 3, 227, 227, generator=g)
        with torch.no_grad():
            ref_c, ref_r = tnet(x_t)
        with jax.default_matmul_precision("float32"):
            ours_c, ours_r = model.apply({"params": params}, to_nhwc(x_t),
                                         train=False)
        np.testing.assert_allclose(np.asarray(ours_c), ref_c.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours_r), ref_r.numpy(),
                                   rtol=1e-4, atol=1e-4)


# --- torchvision mobilenet_v2 layout rebuilt in torch (torchvision itself is
# absent from this environment), same state-dict key names ---

class _TVConvBNReLU(torch.nn.Sequential):
    def __init__(self, inp, oup, k=3, s=1, groups=1):
        super().__init__(
            torch.nn.Conv2d(inp, oup, k, s, (k - 1) // 2, groups=groups,
                            bias=False),
            torch.nn.BatchNorm2d(oup),
            torch.nn.ReLU6(inplace=True))


class _TVInvertedResidual(torch.nn.Module):
    def __init__(self, inp, oup, stride, t):
        super().__init__()
        hidden = inp * t
        self.use_res = stride == 1 and inp == oup
        layers = []
        if t != 1:
            layers.append(_TVConvBNReLU(inp, hidden, k=1))
        layers += [_TVConvBNReLU(hidden, hidden, s=stride, groups=hidden),
                   torch.nn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
                   torch.nn.BatchNorm2d(oup)]
        self.conv = torch.nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


def build_tv_mobilenet_features():
    settings = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
    feats = [_TVConvBNReLU(3, 32, s=2)]
    in_ch = 32
    for (t, c, n, s) in settings:
        for i in range(n):
            feats.append(_TVInvertedResidual(in_ch, c, s if i == 0 else 1, t))
            in_ch = c
    model = torch.nn.Module()
    model.features = torch.nn.Sequential(*feats)
    return model


class TestMobileNetV2Parity:
    def test_backbone_matches_torchvision_layout_torch(self):
        torch.manual_seed(13)
        tnet = build_tv_mobilenet_features()
        # Populate BatchNorm running stats with real statistics (fresh stats
        # are mean=0/var=1, which would make BN near-identity and mask
        # conversion mistakes in running_mean/var handling).
        tnet.train()
        with torch.no_grad():
            for _ in range(3):
                tnet.features(torch.rand(4, 3, 96, 96))
        tnet.eval()

        sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
        params, stats = convert_mobilenet_v2(sd)

        model = MobileNetV2Features()
        as_jnp = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
        variables = {"params": as_jnp(params), "batch_stats": as_jnp(stats)}

        g = torch.Generator().manual_seed(17)
        x_t = torch.rand(2, 3, 224, 224, generator=g)
        with torch.no_grad():
            y = x_t
            tap_ref = None
            for i, m in enumerate(tnet.features):
                y = m(y)
                if i == 13:
                    tap_ref = y.numpy()
            final_ref = y.numpy()

        with jax.default_matmul_precision("float32"):
            final, tap = model.apply(variables, to_nhwc(x_t), train=False)

        np.testing.assert_allclose(np.asarray(tap).transpose(0, 3, 1, 2),
                                   tap_ref, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(final).transpose(0, 3, 1, 2),
                                   final_ref, rtol=1e-3, atol=1e-3)
