"""Fused inverted-residual kernel (ops/fused_ir.py) and its model routing.

Verifies, in interpret mode on CPU: (1) the op's forward and every gradient
against the plain XLA chain it replaces; (2) the flax InvertedResidual fused
path against the plain path — identical parameter/batch_stats trees, same
outputs, same running-stats updates, same parameter gradients (reference
semantics: park2019.py MobileNetV2 features / torchvision InvertedResidual).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

import speedplusbaseline_tpu.models.mobilenetv2 as mnv2
from speedplusbaseline_tpu.models.mobilenetv2 import InvertedResidual
from speedplusbaseline_tpu.ops.fused_ir import (
    expand_stats,
    fused_expand_dw_call,
)


def _ref_chain(x, w_e, gamma, beta, w_dw, stride):
    """Plain lowering: expand 1x1 -> train BN -> relu6 -> depthwise 3x3."""
    z = jnp.einsum("bhwc,ce->bhwe", x, w_e)
    mu = z.mean((0, 1, 2))
    var = jnp.maximum((z ** 2).mean((0, 1, 2)) - mu ** 2, 0.0)
    zh = (z - mu) * lax.rsqrt(var + 1e-5) * gamma + beta
    a = jnp.clip(zh, 0.0, 6.0)
    ce = a.shape[-1]
    return lax.conv_general_dilated(
        a, w_dw.reshape(3, 3, 1, ce), (stride, stride), [(1, 1), (1, 1)],
        feature_group_count=ce, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fused_chain(x, w_e, gamma, beta, w_dw, stride):
    mu, var = expand_stats(x, w_e)
    return fused_expand_dw_call(x, w_e, gamma, beta, w_dw, mu, var,
                                stride=stride, interpret=True)


class TestFusedExpandDw:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_forward_and_grads_match_reference(self, rng, stride):
        B, H, W, Cin, Ce = 3, 8, 8, 5, 7
        x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
        w_e = jnp.asarray(rng.randn(Cin, Ce).astype(np.float32) * 0.3)
        gamma = jnp.asarray(rng.rand(Ce).astype(np.float32) + 0.5)
        beta = jnp.asarray(rng.randn(Ce).astype(np.float32) * 0.2)
        w_dw = jnp.asarray(rng.randn(3, 3, Ce).astype(np.float32) * 0.3)

        y0 = _ref_chain(x, w_e, gamma, beta, w_dw, stride)
        y1 = _fused_chain(x, w_e, gamma, beta, w_dw, stride)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)

        cot = jnp.asarray(rng.randn(*y0.shape).astype(np.float32))
        g0 = jax.grad(lambda *a: jnp.sum(_ref_chain(*a, stride) * cot),
                      argnums=(0, 1, 2, 3, 4))(x, w_e, gamma, beta, w_dw)
        g1 = jax.grad(lambda *a: jnp.sum(_fused_chain(*a, stride) * cot),
                      argnums=(0, 1, 2, 3, 4))(x, w_e, gamma, beta, w_dw)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4, rtol=1e-3)

    @pytest.mark.parametrize("stride", [1, 2])
    def test_row_tiled_path(self, rng, stride, monkeypatch):
        """Force row-by-row tiling (the production kernels tile the 112^2
        slabs) and re-check exactness."""
        import speedplusbaseline_tpu.ops.fused_ir as fi

        monkeypatch.setattr(fi, "_TILE_BYTES", 1)
        B, H, W, Cin, Ce = 2, 8, 8, 4, 6
        x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
        w_e = jnp.asarray(rng.randn(Cin, Ce).astype(np.float32) * 0.3)
        gamma = jnp.asarray(rng.rand(Ce).astype(np.float32) + 0.5)
        beta = jnp.asarray(rng.randn(Ce).astype(np.float32) * 0.2)
        w_dw = jnp.asarray(rng.randn(3, 3, Ce).astype(np.float32) * 0.3)
        y0 = _ref_chain(x, w_e, gamma, beta, w_dw, stride)
        y1 = _fused_chain(x, w_e, gamma, beta, w_dw, stride)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)
        cot = jnp.asarray(rng.randn(*y0.shape).astype(np.float32))
        g0 = jax.grad(lambda a: jnp.sum(_ref_chain(a, w_e, gamma, beta, w_dw,
                                                   stride) * cot))(x)
        g1 = jax.grad(lambda a: jnp.sum(_fused_chain(a, w_e, gamma, beta, w_dw,
                                                     stride) * cot))(x)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   atol=3e-4, rtol=1e-3)


class TestInvertedResidualFused:
    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    @pytest.mark.parametrize("stride", [1, 2])
    def test_fused_block_matches_plain(self, rng, stride, impl, monkeypatch):
        """Whole-block parity: same variable trees, outputs, running-stats
        updates, and parameter gradients as the ConvBN lowering — for both
        the analytic-stats XLA impl and the Pallas kernel impl."""
        monkeypatch.setattr(mnv2, "_FUSE_MIN_H", 8)

        in_ch, out_ch = 6, 6  # stride-1 case exercises the residual add
        x = jnp.asarray(rng.rand(2, 16, 16, in_ch).astype(np.float32))
        key = jax.random.PRNGKey(0)

        plain = InvertedResidual(out_ch, stride, 6)
        fused = InvertedResidual(out_ch, stride, 6, fused=True,
                                 fused_interpret=True, fused_impl=impl)
        v0 = plain.init({"params": key}, jnp.zeros_like(x), train=False)
        v1 = fused.init({"params": key}, jnp.zeros_like(x), train=False)
        assert (jax.tree_util.tree_structure(v0)
                == jax.tree_util.tree_structure(v1))

        # make the BN affine non-trivial before comparing
        v0 = jax.tree_util.tree_map(
            lambda p: p + 0.1 * jnp.arange(p.size, dtype=p.dtype
                                           ).reshape(p.shape) / p.size, v0)

        y0, m0 = plain.apply(v0, x, train=True, mutable=["batch_stats"])
        y1, m1 = fused.apply(v0, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=2e-4, rtol=1e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4),
            m0["batch_stats"], m1["batch_stats"])

        def loss(params, mod):
            out, _ = mod.apply(
                {"params": params, "batch_stats": v0["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        g0 = jax.grad(loss)(v0["params"], plain)
        g1 = jax.grad(loss)(v0["params"], fused)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3),
            g0, g1)

    def test_eval_mode_uses_plain_path(self, rng, monkeypatch):
        """train=False must route the plain lowering (running stats)."""
        monkeypatch.setattr(mnv2, "_FUSE_MIN_H", 8)
        x = jnp.asarray(rng.rand(2, 16, 16, 6).astype(np.float32))
        key = jax.random.PRNGKey(0)
        plain = InvertedResidual(8, 2, 6)
        fused = InvertedResidual(8, 2, 6, fused=True, fused_interpret=True)
        v = plain.init({"params": key}, x, train=False)
        y0 = plain.apply(v, x, train=False)
        y1 = fused.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
