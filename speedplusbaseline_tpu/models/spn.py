"""Spacecraft Pose Network (SPN) in flax — reference spn.py:50-143.

AlexNet-style trunk (grouped convs + LocalResponseNorm) with two FC branches
off the flattened pool5 tensor: attitude classification (fc6-7-8, num_classes
logits) and attitude regression "weights" (fc9-10-11). Input must be 227x227
for the 9216-dim flatten to hold (spn.py:80). Pretrained bvlc_alexnet conv1-5
weights load through models/weight_convert.py when the .npy file exists
(reference spn.py:101-123; the asset is absent from this mount).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LocalResponseNorm


def softmax_cross_entropy_with_logits(logits, target, reduction: str = "mean"):
    """TF-semantics soft-label cross-entropy (reference spn.py:37-48).

    loss_i = -sum_c target[i,c] * log_softmax(logits)[i,c]
    """
    target = jax.lax.stop_gradient(target)
    loss = -jnp.sum(target * jax.nn.log_softmax(logits, axis=1), axis=1)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def _maxpool(x, window=3, stride=2):
    """Valid 3x3/2 max pool (torch MaxPool2d(3, 2, 0))."""
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding="VALID")


class SpacecraftPoseNet(nn.Module):
    num_classes: int = 5000
    keep_prob: float = 0.5  # reference naming; torch Dropout(p=0.5) drop prob
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        conv = lambda f, k, s, p, g, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=((p, p), (p, p)),
            feature_group_count=g, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )

        x = nn.relu(conv(96, 11, 4, 0, 1, "conv1")(x))
        x = LocalResponseNorm(name="norm1")(_maxpool(x))
        x = nn.relu(conv(256, 5, 1, 2, 2, "conv2")(x))
        x = LocalResponseNorm(name="norm2")(_maxpool(x))
        x = nn.relu(conv(384, 3, 1, 1, 1, "conv3")(x))
        x = nn.relu(conv(384, 3, 1, 1, 2, "conv4")(x))
        x = nn.relu(conv(256, 3, 1, 1, 2, "conv5")(x))
        x = _maxpool(x)  # (B, 6, 6, 256)
        x = x.reshape(x.shape[0], -1)  # 9216 (HWC order; see weight_convert)

        dense = lambda f, name: nn.Dense(f, dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)
        drop = lambda y, name: nn.Dropout(
            rate=self.keep_prob, deterministic=not train, name=name)(y)

        # Attitude classification branch (fc6-7-8)
        c = drop(nn.relu(dense(4096, "fc6")(x)), "dropout6")
        c = drop(nn.relu(dense(4096, "fc7")(c)), "dropout7")
        c = dense(self.num_classes, "fc8")(c).astype(jnp.float32)

        # Attitude regression branch (fc9-10-11)
        r = drop(nn.relu(dense(4096, "fc9")(x)), "dropout9")
        r = drop(nn.relu(dense(4096, "fc10")(r)), "dropout10")
        r = dense(self.num_classes, "fc11")(r).astype(jnp.float32)

        return c, r


def spn_loss(classes, weights, y_classes, y_weights):
    """SPN training loss (reference trainer.py:152-165):
    loss_class + 10 * loss_regress, both TF-style soft-label CE."""
    loss_class = softmax_cross_entropy_with_logits(classes, y_classes, "mean")
    loss_regress = softmax_cross_entropy_with_logits(weights, y_weights, "mean")
    loss = loss_class + 10.0 * loss_regress
    return loss, {"loss_c": loss_class, "loss_r": loss_regress}
