"""DANN model: KRN + gradient-reversal domain classifier — reference
revgrad.py:36-96.

The reference captures the 320ch backbone feature with a forward hook
(revgrad.py:66-71); flax returns it explicitly via
``KeypointRegressionNet(return_features=True)``. The GradientReversalFunction
(identity forward, -lambda * grad backward, revgrad.py:36-56) becomes a
``jax.custom_vjp``.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .krn import KeypointRegressionNet


@jax.custom_vjp
def grad_reverse(x, lam):
    """Identity forward; backward multiplies the cotangent by -lam."""
    return x


def _grad_reverse_fwd(x, lam):
    return x, lam


def _grad_reverse_bwd(lam, g):
    return (-lam * g, jnp.zeros_like(lam))


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)


class DomainClassifier(nn.Module):
    """Conv1x1(320->1280) -> ReLU -> AvgPool7 -> Conv1x1(1280->1)
    (revgrad.py:75-80)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        x = nn.Conv(1280, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv0")(feat.astype(self.dtype))
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # AvgPool2d(7) on 7x7 map
        x = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        return x.reshape(x.shape[0]).astype(jnp.float32)  # (B,) logits


class RevGrad(nn.Module):
    """KRN with an adversarial domain head (revgrad.py:58-96).

    __call__ returns ((xc, yc), domain_logits) when ``alpha`` is given, else
    (xc, yc). Pose loss composition happens in the DANN train step.
    """

    num_keypoints: int = 11
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, alpha=None):
        xc, yc, feat = KeypointRegressionNet(
            self.num_keypoints, dtype=self.dtype, name="net"
        )(x, train=train, return_features=True)

        if alpha is None:
            return xc, yc

        lam = jnp.asarray(alpha, dtype=jnp.float32)
        reversed_feat = grad_reverse(feat.astype(jnp.float32), lam)
        domain = DomainClassifier(dtype=self.dtype, name="domain_classifier")(
            reversed_feat
        )
        return (xc, yc), domain


def bce_with_logits(logits, targets):
    """torch BCEWithLogitsLoss(reduction='mean') parity (dann.py:85-92)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_not_p)
