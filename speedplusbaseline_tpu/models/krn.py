"""Keypoint Regression Network (KRN) in flax — reference park2019.py:101-165.

MobileNetV2 backbone (final 1280 conv dropped) + depthwise-separable extras +
RouterV2 space-to-depth skip + 7x7 valid conv head producing 2K scalars =
normalized (x, y) of K keypoints. The loss (per-keypoint MSE, batch-mean then
summed over keypoints and over x/y, park2019.py:152-156) lives in
``krn_loss`` so the jitted train step composes it functionally.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvDw, RouterV2
from .mobilenetv2 import MobileNetV2Features


class KeypointRegressionNet(nn.Module):
    num_keypoints: int = 11
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        """NHWC image batch -> (xc, yc) normalized keypoint coords.

        Args:
            x: (B, H, W, 3) images in [0, 1] (no ImageNet normalization —
               the reference feeds raw [0,1] tensors, transforms.py:192-196).
            return_features: also return the 320ch backbone output map, used
               by the DANN domain classifier (revgrad.py:66-71 captures it via
               a forward hook; we return it explicitly — no hooks needed).
        Returns:
            (xc, yc) each (B, K), plus features (B, 7, 7, 320) if requested.
        """
        x = x.astype(self.dtype)
        feat, tap = MobileNetV2Features(dtype=self.dtype, name="base")(x, train)

        y = ConvDw(1024, 1, dtype=self.dtype, name="extra0")(feat, train)
        y = ConvDw(1024, 1, dtype=self.dtype, name="extra1")(y, train)
        y = RouterV2(64, dtype=self.dtype, name="router")(y, tap, train)
        y = ConvDw(1024, 1, dtype=self.dtype, name="extra3")(y, train)

        # Head: full-map valid conv -> (B, 1, 1, 2K). At the reference's
        # 224x224 input this is exactly the 7x7 conv of park2019.py:121; the
        # kernel tracks the incoming map so smaller (test) inputs also work.
        y = nn.Conv(
            2 * self.num_keypoints, (y.shape[1], y.shape[2]), padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="head",
        )(y)
        y = y.reshape(y.shape[0], 2 * self.num_keypoints).astype(jnp.float32)
        xc = y[:, 0::2]
        yc = y[:, 1::2]
        if return_features:
            return xc, yc, feat
        return xc, yc


def krn_loss(xc, yc, target):
    """KRN training loss (park2019.py:146-162).

    Args:
        xc, yc: (B, K) predicted normalized coords.
        target: (B, 2, K) ground-truth normalized keypoints [x; y].
    Returns:
        (loss, {'loss_x', 'loss_y'}) — per-keypoint MSE means summed over
        keypoints, matching the reference's loop of nn.MSELoss per keypoint.
    """
    txc = target[:, 0, :]
    tyc = target[:, 1, :]
    loss_x = jnp.sum(jnp.mean((xc - txc) ** 2, axis=0))
    loss_y = jnp.sum(jnp.mean((yc - tyc) ** 2, axis=0))
    loss = loss_x + loss_y
    return loss, {"loss_x": loss_x, "loss_y": loss_y}
