"""Pallas TPU kernel: fully-fused Ghiasi residual block.

One kernel invocation computes an entire style-transfer residual block
(reference ghiasi.py:65-103) for one sample:

    y = reflect_pad(x); y = conv3x3(y, W1) + b1_conv
    y = relu(FiLM(instance_norm(y), g1, f1))
    y = reflect_pad(y); y = conv3x3(y, W2) + b2_conv
    y = FiLM(instance_norm(y), g2, f2)
    out = x + y

entirely in VMEM: the (56, 56, 128) activation slab (0.8 MB bf16), both
3x3x128x128 weight tensors (0.6 MB) and the padded scratch stay on-chip, so
each block costs ONE activation read + ONE write to HBM instead of the ~6
separate pad/conv/norm round trips of the unfused lowering — and the 3x3
convs become nine (HW, C) x (C, C) MXU matmuls over aligned shapes (the
unfused path convolves over awkward 58x58 padded maps).

Used for the inference-only style augmentation pass (stop_gradient'ed), so no
custom VJP is needed. Interpret-mode tested against the XLA reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reflect_pad_hw(x):
    """Reflect-pad a (H, W, C) array by 1 in VMEM. For pad=1 the reflected
    borders are single rows/columns (x[1], x[-2]) — no `rev` needed, which
    Pallas TPU cannot lower."""
    x = jnp.concatenate([x[1:2], x, x[-2:-1]], axis=0)
    return jnp.concatenate([x[:, 1:2], x, x[:, -2:-1]], axis=1)


def _conv3x3(xpad, w, h: int, wd: int):
    """3x3 VALID conv via 9 shifted (H*W, C) x (C, C) matmuls.

    xpad: (H+2, W+2, C) f32; w: (3, 3, C, C) f32. Returns (H, W, Cout) f32.
    """
    c_out = w.shape[-1]
    acc = jnp.zeros((h * wd, c_out), jnp.float32)
    for di in range(3):
        for dj in range(3):
            window = xpad[di:di + h, dj:dj + wd, :].reshape(h * wd, -1)
            acc = acc + jnp.dot(window, w[di, dj],
                                preferred_element_type=jnp.float32)
    return acc.reshape(h, wd, c_out)


def _in_film(y, gamma, beta, relu: bool, eps: float = 1e-5):
    """Instance norm over (H, W) per channel + FiLM (+ ReLU), f32 in VMEM."""
    h, wd, c = y.shape
    flat = y.reshape(h * wd, c)
    n = flat.shape[0]
    s1 = jnp.sum(flat, axis=0, keepdims=True)
    s2 = jnp.sum(flat * flat, axis=0, keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    scale = jax.lax.rsqrt(var + eps) * gamma
    shift = beta - mean * scale
    out = flat * scale + shift
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.reshape(h, wd, c)


def _resblock_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     g1_ref, f1_ref, g2_ref, f2_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    h, wd, _ = x.shape

    y = _reflect_pad_hw(x)
    y = _conv3x3(y, w1_ref[...].astype(jnp.float32), h, wd) + b1_ref[...].astype(jnp.float32)
    y = _in_film(y, g1_ref[0, 0].astype(jnp.float32), f1_ref[0, 0].astype(jnp.float32),
                 relu=True)
    y = _reflect_pad_hw(y)
    y = _conv3x3(y, w2_ref[...].astype(jnp.float32), h, wd) + b2_ref[...].astype(jnp.float32)
    y = _in_film(y, g2_ref[0, 0].astype(jnp.float32), f2_ref[0, 0].astype(jnp.float32),
                 relu=False)
    o_ref[0] = (x + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ghiasi_resblock_pallas(x, w1, b1, w2, b2, gamma1, beta1, gamma2, beta2,
                           interpret: bool = False):
    """Fused residual block.

    Args:
        x: (B, H, W, C) activations.
        w1, w2: (3, 3, C, C) conv kernels (HWIO); b1, b2: (C,) biases.
        gamma1/beta1/gamma2/beta2: (B, C) FiLM parameters.
    Returns:
        (B, H, W, C), same dtype as x.
    """
    B, H, W, C = x.shape
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    per_b = lambda shape: pl.BlockSpec(shape, lambda b: (b,) + (0,) * (len(shape) - 1),
                                       memory_space=pltpu.VMEM)
    # FiLM vectors as (B, 1, C): the (1, 1, C) block satisfies the TPU tile
    # rule (last-two dims equal to the array's), unlike a (1, C) block.
    g1 = gamma1.reshape(B, 1, C)
    f1 = beta1.reshape(B, 1, C)
    g2 = gamma2.reshape(B, 1, C)
    f2 = beta2.reshape(B, 1, C)
    return pl.pallas_call(
        _resblock_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B,),
        in_specs=[
            per_b((1, H, W, C)),
            full(), full(), full(), full(),
            per_b((1, 1, C)), per_b((1, 1, C)), per_b((1, 1, C)), per_b((1, 1, C)),
        ],
        out_specs=per_b((1, H, W, C)),
        interpret=interpret,
    )(x, w1, b1, w2, b2, g1, f1, g2, f2)
