"""Fused InstanceNorm + FiLM for NHWC tensors.

This is the per-layer normalization of the Ghiasi style transformer
(reference ghiasi.py: InstanceNorm2d followed by gamma*x+beta FiLM scaling).
Two implementations:

  * ``instance_norm_film`` — XLA lowering. XLA already fuses the mean/var
    reductions with the scale/shift elementwise ops; this is the default and
    the autodiff path.
  * ``instance_norm_film_pallas`` (ops/pallas_instancenorm.py) — hand-fused
    Pallas TPU kernel for the inference-only style-augmentation pass (one HBM
    read + one write per activation). Opt-in via ``use_pallas=True`` on TPU.

torch InstanceNorm2d default: eps=1e-5, affine=False, biased variance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm_film(x, gamma=None, beta=None, eps: float = 1e-5,
                       use_pallas: bool = False):
    """Instance norm over H, W per (sample, channel), optional FiLM.

    Args:
        x: (B, H, W, C).
        gamma, beta: optional (B, C) FiLM parameters (from style embedding).
    Returns:
        same shape/dtype as x.
    """
    if use_pallas:
        from .pallas_instancenorm import instance_norm_film_pallas

        return instance_norm_film_pallas(x, gamma, beta, eps)

    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma[:, None, None, :].astype(jnp.float32)
    if beta is not None:
        y = y + beta[:, None, None, :].astype(jnp.float32)
    return y.astype(orig_dtype)
