"""MobileNetV2 feature extractor in flax (NHWC), torchvision-compatible.

The KRN backbone (reference park2019.py:107-108) is torchvision's
``mobilenet_v2(pretrained=True).features`` with the final 1280-channel conv
dropped (``children())[:-1]``) and a skip tap at features[13] (96ch @ 14x14,
park2019.py:130-132). This module reproduces that structure block-for-block so
torchvision checkpoints convert directly (see models/weight_convert.py), while
the code itself is an idiomatic flax NHWC implementation.

``fused_ir`` routes the high-resolution inverted-residual blocks' expand ->
train-BN -> relu6 -> depthwise chain through the fused Pallas kernel in
ops/fused_ir.py (the expanded activations never touch HBM); checkpoints stay
interchangeable with the plain path (identical parameter/batch_stats trees,
declared via the containers below).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN

# (expand_ratio t, out_channels c, repeats n, first_stride s) — the standard
# MobileNetV2 inverted-residual schedule (Sandler et al. 2018, Table 2).
_IR_SETTINGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

relu6 = nn.activation.relu6

# Fuse only where the traffic lives: the 112^2/56^2 stages (BASELINE.md
# round-2 bisection puts ~7.5 of the 8.5 ms backbone fwd+bwd there). The
# low-res blocks cost ~0.9 ms total and stay on the XLA path.
_FUSE_MIN_H = 56


class _ConvKernelParams(nn.Module):
    """nn.Conv-compatible bare kernel (Conv_0/kernel), declared not applied."""

    features: int
    kernel_size: int
    groups: int = 1

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size,
             in_features // self.groups, self.features), jnp.float32)


class _BNParams(nn.Module):
    """nn.BatchNorm-compatible parameters + running stats (BatchNorm_0)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (self.features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (self.features,))
        return scale, bias, ra_mean, ra_var


class _ConvBNParams(nn.Module):
    """Parameter container matching ConvBN's tree (Conv_0 + BatchNorm_0),
    for paths that consume the raw weights (ops/fused_ir.py)."""

    features: int
    kernel_size: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, in_features: int):
        k = _ConvKernelParams(self.features, self.kernel_size, self.groups,
                              name="Conv_0")(in_features)
        scale, bias, ra_mean, ra_var = _BNParams(self.features,
                                                 name="BatchNorm_0")()
        return k, scale, bias, ra_mean, ra_var


def _bn_train_apply(y, scale, bias, ra_mean, ra_var, update: bool,
                    dtype, momentum: float = 0.9, eps: float = 1e-5):
    """flax-parity train-mode BatchNorm: f32 stats (fast variance, clamped),
    f32 normalize, cast to compute dtype at the end; running stats updated
    with ``ra = momentum * ra + (1 - momentum) * batch``."""
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(yf * yf, axis=(0, 1, 2)) - mean * mean, 0.0)
    if update:
        ra_mean.value = momentum * ra_mean.value + (1 - momentum) * mean
        ra_var.value = momentum * ra_var.value + (1 - momentum) * var
    out = (yf - mean) * (jax.lax.rsqrt(var + eps) * scale) + bias
    return out.astype(dtype)


class InvertedResidual(nn.Module):
    features: int
    strides: int
    expand_ratio: int
    dtype: Any = jnp.float32
    fused: bool = False
    fused_interpret: bool = False
    # "xla": analytic expand-BN stats (ops/fused_ir.expand_stats — the
    # train-BN stats pass over the huge expanded tensor becomes a folded
    # Gram matmul on the block INPUT) + plain XLA convs. "pallas": the fully
    # fused VMEM kernel — measured SLOWER than XLA's lowering on v5e
    # (bwd 2.74 vs 1.82 ms at block2 shapes: the backward is VPU-bound, not
    # HBM-bound, so fusing buys nothing; kept for the record).
    fused_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_res = self.strides == 1 and in_ch == self.features

        # The fused kernel covers the train-mode hot path only: eval and
        # init route through the plain lowering (identical param trees).
        fuse = (self.fused and train and not self.is_initializing()
                and self.expand_ratio != 1
                and x.shape[1] >= _FUSE_MIN_H
                and (self.strides == 1
                     or (x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)))
        if fuse:
            y = self._fused_expand_dw(x, hidden, train)
        else:
            y = x
            if self.expand_ratio != 1:
                y = ConvBN(hidden, 1, 1, act=relu6, dtype=self.dtype,
                           name="expand")(y, train)
            y = ConvBN(hidden, 3, self.strides, groups=hidden, act=relu6,
                       dtype=self.dtype, name="depthwise")(y, train)
        y = ConvBN(self.features, 1, 1, act=None, dtype=self.dtype,
                   name="project")(y, train)
        return x + y if use_res else y

    def _fused_expand_dw(self, x, hidden: int, train: bool):
        """expand conv + BN + relu6 + depthwise conv in one Pallas kernel
        (ops/fused_ir.py); the depthwise BN + relu6 run in XLA on the
        (small) strided output. Reference chain: park2019.py MobileNetV2
        features, torchvision InvertedResidual ordering."""
        from ..ops.fused_ir import expand_stats, fused_expand_dw_call

        in_ch = x.shape[-1]
        w_e, sc_e, bi_e, rm_e, rv_e = _ConvBNParams(
            hidden, 1, name="expand")(in_ch)
        w_dw, sc_d, bi_d, rm_d, rv_d = _ConvBNParams(
            hidden, 3, groups=hidden, name="depthwise")(hidden)

        we_mat = w_e.reshape(in_ch, hidden)
        wdw3 = w_dw.reshape(3, 3, hidden)
        x = x.astype(self.dtype)

        mu, var = expand_stats(x, we_mat)
        rm_e.value = 0.9 * rm_e.value + 0.1 * mu
        rv_e.value = 0.9 * rv_e.value + 0.1 * var

        if self.fused_impl == "pallas":
            y = fused_expand_dw_call(x, we_mat, sc_e, bi_e, wdw3, mu, var,
                                     stride=self.strides,
                                     interpret=self.fused_interpret)
        else:
            # Same chain in plain XLA, with mu/var as explicit inputs: the
            # expanded tensor's stats pass disappears (analytic), the BN
            # backward's batch reductions become autodiff of expand_stats
            # (full-width matmuls on the SMALL input), and XLA keeps its
            # roofline-level conv lowerings.
            gr = (sc_e * jax.lax.rsqrt(var + 1e-5)).astype(self.dtype)
            sh = (bi_e - mu * sc_e * jax.lax.rsqrt(var + 1e-5)).astype(
                self.dtype)
            z = jax.lax.conv_general_dilated(
                x, w_e.astype(self.dtype), (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            a = relu6(z * gr + sh)
            y = jax.lax.conv_general_dilated(
                a, w_dw.astype(self.dtype),
                (self.strides, self.strides), [(1, 1), (1, 1)],
                feature_group_count=hidden,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _bn_train_apply(y, sc_d, bi_d, rm_d, rv_d, update=True,
                            dtype=self.dtype)
        return relu6(y)


class MobileNetV2Features(nn.Module):
    """features[0:18] of torchvision MobileNetV2 (stem + 17 IR blocks).

    Returns (final_320ch_map, tap96ch_map): the 320ch 7x7 output consumed by
    the KRN extras and the 96ch 14x14 features[13] output consumed by RouterV2.
    """

    dtype: Any = jnp.float32
    tap_index: int = 13  # torchvision features[] index of the skip tap
    fused_ir: bool = False
    fused_interpret: bool = False
    fused_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = ConvBN(32, 3, 2, act=relu6, dtype=self.dtype, name="stem")(x, train)

        tap = None
        idx = 1
        for (t, c, n, s) in _IR_SETTINGS:
            for i in range(n):
                stride = s if i == 0 else 1
                x = InvertedResidual(c, stride, t, dtype=self.dtype,
                                     fused=self.fused_ir,
                                     fused_interpret=self.fused_interpret,
                                     fused_impl=self.fused_impl,
                                     name=f"block{idx}")(x, train)
                if idx == self.tap_index:
                    tap = x
                idx += 1
        return x, tap
