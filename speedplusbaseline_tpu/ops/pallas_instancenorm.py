"""Pallas TPU kernel: fused InstanceNorm + FiLM (+ optional ReLU).

The Ghiasi style transformer normalizes every conv output over (H, W) per
(sample, channel) and immediately rescales with style-conditioned gamma/beta
(reference ghiasi.py:50-59, 83-103). Lowered naively that is a reduce pass
plus an elementwise pass over the activation in HBM; this kernel keeps the
whole (H*W, C) slab of one sample resident in VMEM and does
mean/var/normalize/FiLM/ReLU in a single HBM read + write.

Used on the inference-only style-augmentation path (the output is
stop_gradient'ed, styleAugmentor.py:68), so no custom VJP is required. The
XLA fallback in ops/instancenorm.py is the autodiff-capable reference.

VMEM budget: largest Ghiasi slab at 224^2 input is 224*224*32 f32 = 6.4 MB
(layer0/layer9); 112^2 x 64 = 3.2 MB; 56^2 x 128 = 1.6 MB — all fit the
~16 MB/core VMEM with double buffering disabled on the big layer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fits_vmem(h: int, w: int, c: int, budget_bytes: int = 4 * 2**20) -> bool:
    """Whether one sample's (H*W, C) slab fits VMEM for the single-pass
    kernel (double-buffered bf16 in/out + one f32 temporary), and the channel
    count is wide enough to use the lanes. 224^2 x 32 slabs (Ghiasi layers
    0/9) do NOT fit — those fall back to the XLA lowering. Odd spatial sizes
    (SPN's 227^2 pipeline) are excluded: odd-HW Pallas kernels hang the
    remote Mosaic compile on this toolchain (measured round 2)."""
    return (c >= 16 and h % 2 == 0 and w % 2 == 0
            and h * w * c * 8 <= budget_bytes)


def _inf_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float, relu: bool):
    # Sum/sum-of-squares form: no centered f32 copy of the slab is needed,
    # only per-channel vectors — keeps the VMEM footprint ~2 slabs.
    x = x_ref[0]  # (HW, C), input dtype
    n = x.shape[0]
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=0, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    scale = jax.lax.rsqrt(var + eps) * g_ref[0].astype(jnp.float32)
    shift = b_ref[0].astype(jnp.float32) - mean * scale
    y = xf * scale + shift
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "relu", "interpret"))
def instance_norm_film_pallas(x, gamma=None, beta=None, eps: float = 1e-5,
                              relu: bool = False, interpret: bool = False):
    """x: (B, H, W, C); gamma/beta: (B, C) or None. Returns same shape as x."""
    B, H, W, C = x.shape
    if gamma is None:
        gamma = jnp.ones((B, C), x.dtype)
    if beta is None:
        beta = jnp.zeros((B, C), x.dtype)

    x3 = x.reshape(B, H * W, C)
    g3 = gamma.reshape(B, 1, C)
    b3 = beta.reshape(B, 1, C)

    out = pl.pallas_call(
        functools.partial(_inf_kernel, eps=eps, relu=relu),
        out_shape=jax.ShapeDtypeStruct((B, H * W, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H * W, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H * W, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x3, g3, b3)
    return out.reshape(B, H, W, C)
