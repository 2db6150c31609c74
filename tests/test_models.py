"""Model tests: shapes, torch-parity of primitive layers, loss oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speedplusbaseline_tpu.models import (
    Ghiasi,
    KeypointRegressionNet,
    RevGrad,
    SpacecraftPoseNet,
    grad_reverse,
    softmax_cross_entropy_with_logits,
)
from speedplusbaseline_tpu.models.krn import krn_loss
from speedplusbaseline_tpu.models.layers import LocalResponseNorm, space_to_depth
from speedplusbaseline_tpu.models.spn import spn_loss


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


class TestKRN:
    def test_output_shapes_224(self, key):
        model = KeypointRegressionNet(11)
        v = model.init({"params": key}, jnp.zeros((1, 224, 224, 3)), train=False)
        xc, yc = model.apply(v, jnp.ones((2, 224, 224, 3)), train=False)
        assert xc.shape == (2, 11) and yc.shape == (2, 11)

    def test_backbone_tap_and_feature_shapes(self, key):
        model = KeypointRegressionNet(11)
        v = model.init({"params": key}, jnp.zeros((1, 224, 224, 3)), train=False)
        xc, yc, feat = model.apply(v, jnp.ones((1, 224, 224, 3)), train=False,
                                   return_features=True)
        # 320ch @ 7x7 backbone output (reference park2019.py RevGrad hook)
        assert feat.shape == (1, 7, 7, 320)

    def test_train_mode_updates_batch_stats(self, key):
        model = KeypointRegressionNet(11)
        v = model.init({"params": key}, jnp.zeros((1, 96, 96, 3)), train=False)
        _, mutated = model.apply(v, jnp.ones((2, 96, 96, 3)), train=True,
                                 mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(v["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))

    def test_loss_oracle(self, rng):
        """krn_loss == sum over keypoints of per-keypoint batch-mean MSE
        (park2019.py:152-156)."""
        B, K = 4, 11
        xc = jnp.asarray(rng.randn(B, K).astype(np.float32))
        yc = jnp.asarray(rng.randn(B, K).astype(np.float32))
        target = jnp.asarray(rng.randn(B, 2, K).astype(np.float32))
        loss, sm = krn_loss(xc, yc, target)
        ref_x = sum(np.mean((np.asarray(xc)[:, i] - np.asarray(target)[:, 0, i]) ** 2)
                    for i in range(K))
        ref_y = sum(np.mean((np.asarray(yc)[:, i] - np.asarray(target)[:, 1, i]) ** 2)
                    for i in range(K))
        assert abs(float(sm["loss_x"]) - ref_x) < 1e-4
        assert abs(float(sm["loss_y"]) - ref_y) < 1e-4
        assert abs(float(loss) - (ref_x + ref_y)) < 1e-4


class TestSPN:
    def test_output_shapes_227(self, key):
        model = SpacecraftPoseNet(100)
        v = model.init({"params": key}, jnp.zeros((1, 227, 227, 3)), train=False)
        c, r = model.apply(v, jnp.ones((2, 227, 227, 3)), train=False)
        assert c.shape == (2, 100) and r.shape == (2, 100)

    def test_softmax_ce_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        logits = rng.randn(4, 10).astype(np.float32)
        target = rng.rand(4, 10).astype(np.float32)
        target /= target.sum(1, keepdims=True)
        ours = float(softmax_cross_entropy_with_logits(
            jnp.asarray(logits), jnp.asarray(target), "mean"))
        tl = torch.from_numpy(logits)
        tt = torch.from_numpy(target)
        ref = float((-(tt * torch.log_softmax(tl, dim=1)).sum(1)).mean())
        assert abs(ours - ref) < 1e-5

    def test_spn_loss_weighting(self, rng):
        c = jnp.asarray(rng.randn(2, 8).astype(np.float32))
        w = jnp.asarray(rng.randn(2, 8).astype(np.float32))
        yc = jax.nn.softmax(jnp.asarray(rng.randn(2, 8)), axis=1)
        yw = jax.nn.softmax(jnp.asarray(rng.randn(2, 8)), axis=1)
        loss, sm = spn_loss(c, w, yc, yw)
        assert abs(float(loss) - (float(sm["loss_c"]) + 10.0 * float(sm["loss_r"]))) < 1e-5


class TestLayerParity:
    def test_lrn_matches_torch(self, rng):
        """LocalResponseNorm(2, 2e-5, 0.75, 1.0) parity (spn.py:63,68)."""
        torch = pytest.importorskip("torch")
        x = rng.randn(2, 8, 8, 16).astype(np.float32)
        ours = np.asarray(LocalResponseNorm(size=2).apply({}, jnp.asarray(x)))
        t = torch.nn.LocalResponseNorm(2, alpha=2e-5, beta=0.75, k=1.0)
        ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_conv_padding_matches_torch(self, rng):
        """Our explicit torch-style padding must equal torch Conv2d for
        stride-2 3x3 convs on even inputs (where XLA SAME differs)."""
        torch = pytest.importorskip("torch")
        from flax import linen as nn

        x = rng.randn(1, 8, 8, 3).astype(np.float32)
        w = rng.randn(4, 3, 3, 3).astype(np.float32)  # torch OIHW

        conv = nn.Conv(4, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       use_bias=False)
        params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
        ours = np.asarray(conv.apply(params, jnp.asarray(x)))

        tconv = torch.nn.Conv2d(3, 4, 3, stride=2, padding=1, bias=False)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w))
        ref = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-4)

    def test_grouped_conv_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        from flax import linen as nn

        x = rng.randn(1, 6, 6, 8).astype(np.float32)
        w = rng.randn(12, 4, 3, 3).astype(np.float32)  # groups=2: I/g=4

        conv = nn.Conv(12, (3, 3), padding=((1, 1), (1, 1)),
                       feature_group_count=2, use_bias=False)
        params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
        ours = np.asarray(conv.apply(params, jnp.asarray(x)))

        tconv = torch.nn.Conv2d(8, 12, 3, padding=1, groups=2, bias=False)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w))
        ref = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-4)

    def test_space_to_depth_matches_reference_reorg(self, rng):
        """Replicates the RouterV2 view/transpose gymnastics
        (park2019.py:74-79) in numpy NCHW and compares."""
        B, C, H, W, s = 2, 3, 4, 4, 2
        x_nchw = rng.randn(B, C, H, W).astype(np.float32)

        x2 = x_nchw.reshape(B, C, H // s, s, W // s, s).transpose(0, 1, 2, 4, 3, 5)
        x2 = x2.reshape(B, C, H // s * W // s, s * s).transpose(0, 1, 3, 2)
        x2 = x2.reshape(B, C, s * s, H // s, W // s).transpose(0, 2, 1, 3, 4)
        ref_nchw = x2.reshape(B, s * s * C, H // s, W // s)

        ours_nhwc = np.asarray(
            space_to_depth(jnp.asarray(x_nchw.transpose(0, 2, 3, 1)), s))
        np.testing.assert_allclose(
            ours_nhwc.transpose(0, 3, 1, 2), ref_nchw, atol=1e-6)


class TestRevGrad:
    def test_grl_gradient(self):
        f = lambda x, lam: jnp.sum(grad_reverse(x, lam) * 3.0)
        g = jax.grad(f)(jnp.ones((4,)), jnp.float32(0.7))
        np.testing.assert_allclose(np.asarray(g), -0.7 * 3.0 * np.ones(4), atol=1e-6)

    def test_forward_is_identity(self, rng):
        x = jnp.asarray(rng.randn(3, 2).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(grad_reverse(x, jnp.float32(2.0))),
                                      np.asarray(x))

    def test_revgrad_outputs(self, key):
        model = RevGrad(11)
        v = model.init({"params": key}, jnp.zeros((1, 96, 96, 3)), train=False,
                       alpha=0.0)
        (xc, yc), dom = model.apply(v, jnp.ones((2, 96, 96, 3)), train=False,
                                    alpha=0.5)
        assert xc.shape == (2, 11) and dom.shape == (2,)
        # Without alpha: plain KRN output
        xc2, yc2 = model.apply(v, jnp.ones((2, 96, 96, 3)), train=False)
        np.testing.assert_allclose(np.asarray(xc), np.asarray(xc2), atol=1e-6)


class TestGhiasi:
    def test_output_shape_and_range(self, key):
        model = Ghiasi()
        v = model.init({"params": key}, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 100)))
        out = model.apply(v, jnp.ones((2, 64, 64, 3)) * 0.5,
                          jnp.ones((2, 100)) * 0.1)
        assert out.shape == (2, 64, 64, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_style_conditioning_changes_output(self, key, rng):
        model = Ghiasi()
        x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        v = model.init({"params": key}, x, jnp.zeros((1, 100)))
        s1 = jnp.asarray(rng.randn(1, 100).astype(np.float32))
        s2 = jnp.asarray(rng.randn(1, 100).astype(np.float32))
        o1 = model.apply(v, x, s1)
        o2 = model.apply(v, x, s2)
        assert float(jnp.abs(o1 - o2).max()) > 1e-4

    def test_tpu_opt_odd_size(self, key, rng):
        """Odd / non-multiple-of-4 inputs (SPN's 227^2) route through the
        phase path by reflect-padding to the next multiple of 4. Contract:
        (a) output shape equals the plain lowering's 4*ceil(H/4) (the
        reference ghiasi.py emits 228^2 from 227^2 too), (b) the padded
        phase forward is EXACTLY the phase forward of the padded input
        (which itself equals the plain lowering on that input — covered by
        test_tpu_opt_phase_path_matches_plain). Pixel parity with plain-227
        is NOT part of the contract: instance-norm statistics couple the
        border band to every pixel, so different boundary handling diverges
        under random weights."""
        plain = Ghiasi()
        opt = Ghiasi(tpu_opt=True)
        x = jnp.asarray(rng.rand(2, 27, 31, 3).astype(np.float32))
        s = jnp.asarray(rng.randn(2, 100).astype(np.float32) * 0.3)
        v = plain.init({"params": key}, x[:1], s[:1])
        with jax.default_matmul_precision("float32"):
            ref_shape = plain.apply(v, x, s).shape
            out = opt.apply(v, x, s)
            xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="reflect")
            ref = plain.apply(v, xp, s)
        assert out.shape == ref_shape == (2, 28, 32, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_upto_prefix_hook(self, key, rng):
        """Ghiasi(upto=k) returns stage k's activation in both lowerings —
        the contract scripts/profile_prefix.py relies on to bisect the
        PRODUCTION program."""
        x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        s = jnp.asarray(rng.randn(1, 100).astype(np.float32) * 0.3)
        v = Ghiasi().init({"params": key}, x, s)
        for opt in (False, True):
            shapes = [Ghiasi(tpu_opt=opt, upto=k).apply(v, x, s).shape
                      for k in (0, 2, 7, 9)]
            # phase path keeps packed layouts: same element counts, half
            # resolution with 4x channels for l0/l9
            if opt:
                assert shapes == [(1, 16, 16, 128), (1, 8, 8, 128),
                                  (1, 8, 8, 128), (1, 16, 16, 128)]
            else:
                assert shapes == [(1, 32, 32, 32), (1, 8, 8, 128),
                                  (1, 8, 8, 128), (1, 32, 32, 32)]

    def test_tpu_opt_phase_path_matches_plain(self, key, rng):
        """The phase-space pipeline (tpu_opt=True, ops/phase_conv.py) is an
        exact algebraic rewrite: same params, same output."""
        plain = Ghiasi()
        opt = Ghiasi(tpu_opt=True)
        x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        s = jnp.asarray(rng.randn(2, 100).astype(np.float32) * 0.3)
        v = plain.init({"params": key}, x[:1], s[:1])
        # identical parameter tree -> checkpoint interchangeable
        v_opt = opt.init({"params": key}, x[:1], s[:1])
        t1 = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
        t2 = jax.tree_util.tree_map(lambda a: a.shape, v_opt["params"])
        assert t1 == t2
        with jax.default_matmul_precision("float32"):
            ref = plain.apply(v, x, s)
            out = opt.apply(v, x, s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_f32_out_flag_only_moves_the_cast(self, key, rng):
        """f32_out=True (round-5 A/B flag) restores the old f32
        materialization; the default stores the sigmoid output in model
        dtype. Contract: with dtype=bfloat16 the two differ only by that
        final cast — bit-identical once the f32 output is cast to bf16 —
        and each reports its declared dtype. Downstream (engine/steps.py)
        consumes the styled image in bf16 either way."""
        x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        s = jnp.asarray(rng.randn(2, 100).astype(np.float32) * 0.3)
        bf16 = Ghiasi(dtype=jnp.bfloat16)
        v = bf16.init({"params": key}, x[:1], s[:1])
        out_bf16 = bf16.apply(v, x, s)
        out_f32 = Ghiasi(dtype=jnp.bfloat16, f32_out=True).apply(v, x, s)
        assert out_bf16.dtype == jnp.bfloat16
        assert out_f32.dtype == jnp.float32
        np.testing.assert_array_equal(
            np.asarray(out_f32.astype(jnp.bfloat16), dtype=np.float32),
            np.asarray(out_bf16, dtype=np.float32))

    def test_tpu_opt_l10_fallback_matches_plain(self, key, rng):
        """The single-packed l10 form (l10_dp=False — the odd-size fallback
        inside the dp gate) is an exact rewrite with the same tree."""
        plain = Ghiasi()
        x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        s = jnp.asarray(rng.randn(2, 100).astype(np.float32) * 0.3)
        v = plain.init({"params": key}, x[:1], s[:1])
        with jax.default_matmul_precision("float32"):
            ref = plain.apply(v, x, s)
            out = Ghiasi(tpu_opt=True, l10_dp=False).apply(v, x, s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
