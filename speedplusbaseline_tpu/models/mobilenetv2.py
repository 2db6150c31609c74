"""MobileNetV2 feature extractor in flax (NHWC), torchvision-compatible.

The KRN backbone (reference park2019.py:107-108) is torchvision's
``mobilenet_v2(pretrained=True).features`` with the final 1280-channel conv
dropped (``children())[:-1]``) and a skip tap at features[13] (96ch @ 14x14,
park2019.py:130-132). This module reproduces that structure block-for-block so
torchvision checkpoints convert directly (see models/weight_convert.py), while
the code itself is an idiomatic flax NHWC implementation.

A fused inverted-residual rewrite of the high-resolution blocks (Pallas VMEM
kernel + analytic expand-BN-stats XLA variant) was built, parity-tested and
measured in round 3 — it LOSES to XLA's own lowering (12.2 ms plain vs
13.9/15.7; the backward is depthwise VPU-bound, not HBM-bound). The
experiment was pruned; the record lives in BASELINE.md ("Round-3
optimization record") and at git tag of commit 8be5e21.
"""
from __future__ import annotations

from typing import Any, Tuple

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


class InvertedResidual(nn.Module):
    features: int
    strides: int
    expand_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_res = self.strides == 1 and in_ch == self.features

        y = x
        if self.expand_ratio != 1:
            y = ConvBN(hidden, 1, 1, act=relu6, dtype=self.dtype,
                       name="expand")(y, train)
        y = ConvBN(hidden, 3, self.strides, groups=hidden, act=relu6,
                   dtype=self.dtype, name="depthwise")(y, train)
        y = ConvBN(self.features, 1, 1, act=None, dtype=self.dtype,
                   name="project")(y, train)
        return x + y if use_res else y


class MobileNetV2Features(nn.Module):
    """features[0:18] of torchvision MobileNetV2 (stem + 17 IR blocks).

    Returns (final_320ch_map, tap96ch_map): the 320ch 7x7 output consumed by
    the KRN extras and the 96ch 14x14 features[13] output consumed by RouterV2.
    """

    dtype: Any = jnp.float32
    tap_index: int = 13  # torchvision features[] index of the skip tap

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = ConvBN(32, 3, 2, act=relu6, dtype=self.dtype, name="stem")(x, train)

        tap = None
        idx = 1
        for (t, c, n, s) in _IR_SETTINGS:
            for i in range(n):
                stride = s if i == 0 else 1
                x = InvertedResidual(c, stride, t, dtype=self.dtype,
                                     name=f"block{idx}")(x, train)
                if idx == self.tap_index:
                    tap = x
                idx += 1
        return x, tap
