"""Shared flax building blocks (NHWC, bf16-capable, torch-padding parity).

All convs use explicit torch-style symmetric padding rather than XLA 'SAME':
for stride-2 convs on even inputs the two conventions pad differently, and we
need shape/weight-layout parity with the reference models for checkpoint
conversion (SURVEY.md §7 "MobileNetV2 pretrained parity").
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def torch_pad(kernel_size: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    p = kernel_size // 2
    return ((p, p), (p, p))


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm + optional activation — the torch
    Conv2d/BatchNorm2d/act trio used throughout MobileNetV2 and the KRN
    extras (reference park2019.py:43-56)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    padding: Optional[Sequence[Tuple[int, int]]] = None
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.padding if self.padding is not None else torch_pad(self.kernel_size)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        # Statistics (and running stats) are always computed/stored in f32 —
        # flax promotes reductions to float32 internally — but the normalize
        # APPLY runs in the compute dtype: upcasting the whole activation to
        # f32 here doubled HBM traffic at all 52 BN sites and was the main
        # backward-pass tax (bare step 12.2 ms -> see BASELINE.md round-2).
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=None,
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ConvDw(nn.Module):
    """Depthwise-separable conv block (reference park2019.py:32-58):
    3x3 depthwise + BN + ReLU, then 1x1 pointwise + BN + ReLU."""

    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        x = ConvBN(in_ch, 3, self.strides, groups=in_ch, act=nn.relu,
                   dtype=self.dtype, name="dw")(x, train)
        x = ConvBN(self.features, 1, 1, act=nn.relu, dtype=self.dtype,
                   name="pw")(x, train)
        return x


def space_to_depth(x, block: int = 2):
    """NHWC space-to-depth with the reference's reorg channel ordering
    (park2019.py:74-79): out channel = (s_h*block + s_w)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h', w', s_h, s_w, c)
    return x.reshape(b, h // block, w // block, block * block * c)


class RouterV2(nn.Module):
    """Skip-connection router (reference park2019.py:60-80): 1x1 conv + BN +
    LeakyReLU(0.2) on the high-res tap, space-to-depth reorg, concat with the
    low-res stream (reorg first, matching torch.cat order)."""

    features: int
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        x2 = ConvBN(self.features, 1, 1,
                    act=lambda v: nn.leaky_relu(v, negative_slope=0.2),
                    dtype=self.dtype, name="conv")(x2, train)
        x2 = space_to_depth(x2, self.stride)
        return jnp.concatenate([x2, x1], axis=-1)


class RouterV3(nn.Module):
    """Upsampling router (reference park2019.py:82-97): 1x1 conv + BN +
    LeakyReLU(0.1) on the low-res stream, bilinear 2x upsample, concat with
    the high-res stream. Unused by KRN (kept for inventory parity). Note:
    uses half-pixel bilinear sampling (jax.image.resize) rather than torch's
    align_corners=True — the reference never invokes this module."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        import jax

        x1 = ConvBN(self.features, 1, 1,
                    act=lambda v: nn.leaky_relu(v, negative_slope=0.1),
                    dtype=self.dtype, name="conv")(x1, train)
        b, h, w, c = x1.shape
        x1 = jax.image.resize(x1, (b, 2 * h, 2 * w, c), method="bilinear")
        return jnp.concatenate([x1, x2], axis=-1)


class LocalResponseNorm(nn.Module):
    """torch.nn.LocalResponseNorm parity for NHWC tensors (spn.py:63,68).

    torch pads the channel axis with size//2 leading and (size-1)//2 trailing
    zeros and takes a windowed MEAN of x^2, so the denominator is
    (k + alpha * mean_window(x^2)) ** beta.
    """

    size: int = 2
    alpha: float = 2e-5
    beta: float = 0.75
    k: float = 1.0

    @nn.compact
    def __call__(self, x):
        sq = jnp.square(x.astype(jnp.float32))
        lead, trail = self.size // 2, (self.size - 1) // 2
        sq = jnp.pad(sq, ((0, 0), (0, 0), (0, 0), (lead, trail)))
        windows = [sq[..., i : i + x.shape[-1]] for i in range(self.size)]
        mean = sum(windows) / self.size
        div = jnp.power(self.k + self.alpha * mean, self.beta)
        return (x.astype(jnp.float32) / div).astype(x.dtype)
