"""Ghiasi arbitrary-style-transfer generator in flax — reference ghiasi.py.

The style augmentor's transformer (Ghiasi et al. 2017): 3 unconditioned
downsampling ConvInRelu layers, 5 FiLM-conditioned residual blocks, 2
FiLM-conditioned upsample layers and a 9x9 output conv + sigmoid
(ghiasi.py:106-136). Style conditioning is per-layer FiLM: gamma/beta =
Linear(100 -> C) applied after InstanceNorm (ghiasi.py:50-59, 83-103).

Runs INSIDE the jitted train step on TPU (the reference runs it per-batch
under no_grad on GPU, styleAugmentor.py:51-68 — the single most expensive
non-backbone compute, SURVEY.md §3.1). Instance norm + FiLM + ReLU chains can
optionally route through the fused Pallas kernel in ops/pallas_instancenorm.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.instancenorm import instance_norm_film


def reflect_pad(x, pad: int):
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def upsample_nearest(x, factor: int = 2):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class ConvInRelu(nn.Module):
    """ReflectionPad + Conv + InstanceNorm + ReLU (ghiasi.py:6-23)."""

    features: int
    kernel_size: int
    strides: int = 1
    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x):
        x = reflect_pad(x, self.kernel_size // 2)
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.use_pallas:
            from ..ops.pallas_instancenorm import fits_vmem, instance_norm_film_pallas

            if fits_vmem(x.shape[1], x.shape[2], x.shape[3]):
                return instance_norm_film_pallas(
                    x, relu=True, interpret=self.pallas_interpret)
        x = instance_norm_film(x)  # no FiLM -> plain instance norm
        return nn.relu(x)


class UpsampleConvInRelu(nn.Module):
    """Optional upsample + ReflectionPad + Conv + IN + FiLM (+ ReLU)
    (ghiasi.py:26-62). ``activation=None`` for the output layer."""

    features: int
    kernel_size: int
    upsample: Optional[int] = None
    use_relu: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x, style):
        gamma = nn.Dense(self.features, param_dtype=jnp.float32,
                         dtype=jnp.float32, name="fc_gamma")(style)
        beta = nn.Dense(self.features, param_dtype=jnp.float32,
                        dtype=jnp.float32, name="fc_beta")(style)
        if self.upsample:
            x = upsample_nearest(x, self.upsample)
        x = reflect_pad(x, self.kernel_size // 2)
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        if self.use_pallas:
            from ..ops.pallas_instancenorm import fits_vmem, instance_norm_film_pallas

            if fits_vmem(x.shape[1], x.shape[2], x.shape[3]):
                return instance_norm_film_pallas(
                    x, gamma, beta, relu=self.use_relu,
                    interpret=self.pallas_interpret)
        x = instance_norm_film(x, gamma, beta)
        if self.use_relu:
            x = nn.relu(x)
        return x


class _ConvParams(nn.Module):
    """Bare conv parameters with nn.Conv's tree layout and inits — declared
    (not applied) so fused kernels / the phase-space path can consume the raw
    HWIO weights while checkpoints stay interchangeable with the plain path."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel_size, self.kernel_size, in_features,
                        self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


def _Conv3x3Params(features, name=None):
    return _ConvParams(features, 3, name=name)


class _PhaseLayerParams(nn.Module):
    """Parameter container matching ConvInRelu / UpsampleConvInRelu trees
    (Conv_0 + optional fc_gamma/fc_beta), for the phase-space pipeline."""

    features: int
    kernel_size: int
    film: bool = False

    @nn.compact
    def __call__(self, in_features: int, style=None):
        w, b = _ConvParams(self.features, self.kernel_size,
                           name="Conv_0")(in_features)
        if not self.film:
            return w, b, None, None
        gamma = nn.Dense(self.features, param_dtype=jnp.float32,
                         dtype=jnp.float32, name="fc_gamma")(style)
        beta = nn.Dense(self.features, param_dtype=jnp.float32,
                        dtype=jnp.float32, name="fc_beta")(style)
        return w, b, gamma, beta


class ResidualBlock(nn.Module):
    """Johnson-style residual block with two FiLM-conditioned convs
    (ghiasi.py:65-103). With ``use_pallas`` (and a VMEM-sized slab) the whole
    block — both convs, instance norms, FiLM, ReLU, residual add — runs as
    ONE fused Pallas kernel (ops/pallas_resblock.py)."""

    features: int
    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x, style):
        film = lambda name: (
            nn.Dense(self.features, param_dtype=jnp.float32, dtype=jnp.float32,
                     name=f"fc_gamma{name}")(style),
            nn.Dense(self.features, param_dtype=jnp.float32, dtype=jnp.float32,
                     name=f"fc_beta{name}")(style),
        )
        g1, b1 = film("1")
        g2, b2 = film("2")

        h, w = x.shape[1], x.shape[2]
        # Fused-kernel VMEM budget: ~5 f32 copies of the slab. Odd spatial
        # sizes (SPN's 227^2 input reaches here as 57^2) hang the remote
        # Mosaic compile on this toolchain — measured round 2, 5/5 attempts —
        # so the kernel also requires even H/W; odd shapes use XLA's lowering.
        fused_ok = (self.use_pallas and h % 2 == 0 and w % 2 == 0
                    and h * w * self.features * 4 * 5 <= 10 * 2**20)

        if fused_ok:
            from ..ops.pallas_resblock import ghiasi_resblock_pallas

            w1, c1 = _Conv3x3Params(self.features, name="conv1")(x.shape[-1])
            w2, c2 = _Conv3x3Params(self.features, name="conv2")(x.shape[-1])
            return ghiasi_resblock_pallas(x, w1, c1, w2, c2, g1, b1, g2, b2,
                                          interpret=self.pallas_interpret)

        norm1 = lambda v: nn.relu(instance_norm_film(v, g1, b1))
        norm2 = lambda v: instance_norm_film(v, g2, b2)
        y = reflect_pad(x, 1)
        y = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(y)
        y = norm1(y)
        y = reflect_pad(y, 1)
        y = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(y)
        y = norm2(y)
        return x + y


class Ghiasi(nn.Module):
    """Full generator (ghiasi.py:106-136): sigmoid(conv_stack(x, style)).

    ``tpu_opt`` routes the full-resolution layers through the phase-space
    (space-to-depth) rewrites in ops/phase_conv.py: every conv runs at half
    resolution with 4x channels, reflect pads happen in phase space, and the
    nearest-upsamples fold into 2x2 subpixel convs (2.25x fewer FLOPs). The
    network never materializes a full-resolution intermediate — the s2d of
    one layer cancels the d2s of the previous. Numerically identical to the
    plain path (tests/test_phase_conv.py, test_models.py) and checkpoint-
    compatible (same parameter tree).

    ``use_pallas`` routes every InstanceNorm+FiLM(+ReLU) through the fused
    Pallas TPU kernel (ops/pallas_instancenorm.py) — one HBM read+write per
    normalization instead of separate reduce/apply passes. TPU-only; the XLA
    path is numerically identical (tested) and autodiff-capable.
    """

    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False
    tpu_opt: bool = False
    # l10_dp: emit l10 double-packed (N=48 lanes instead of 12) — the
    # measured winner of the round-3 lowering A/Bs (12.84 vs 12.94 ms; the
    # losing alternatives l10_border/l0_qp/up2x2 were pruned after
    # measurement — record in BASELINE.md "Round-3 Ghiasi endgame").
    l10_dp: bool = True
    # Output storage dtype: the styled image is consumed by a bf16 KRN/SPN
    # forward (engine/steps.py casts it right after stop_gradient), so
    # materializing the sigmoid output in self.dtype halves the
    # full-resolution output traffic BASELINE.md's round-3 endgame named as
    # part of the residual Ghiasi cost — with bit-identical downstream
    # values (the later cast just moves into the generator). f32_out=True
    # restores the old f32 materialization (round-5 A/B flag).
    f32_out: bool = False
    # Profiling hook: return the activation after stage k (0=layer0 ..
    # 7=layer7, 8=layer8, 9=layer9, 10=full incl. sigmoid). Guarantees
    # prefix-bisection measurements (scripts/profile_prefix.py) time the
    # PRODUCTION lowering, not a reimplementation.
    upto: Optional[int] = None

    def _cut(self, k: int) -> bool:
        return self.upto is not None and self.upto == k

    def _out(self, z):
        return z if self.f32_out else z.astype(self.dtype)

    @nn.compact
    def __call__(self, x, styles):
        """x: (B, H, W, 3) in [0,1]; styles: (B, 100). H, W divisible by 4."""
        x = x.astype(self.dtype)
        styles = styles.astype(jnp.float32)
        if self.tpu_opt:
            # Shape is static at trace time. Non-multiple-of-4 sizes (e.g.
            # SPN's 227^2, trainer.py:68-69 applies the augmentor
            # model-agnostically) reflect-pad up to the next multiple of 4
            # first: the plain lowering's own conv arithmetic emits
            # 4*ceil(H/4) rows for odd inputs anyway (227 -> 228, exactly
            # like the reference ghiasi.py), so the output shape contract is
            # unchanged and only a border band inside the pad region differs
            # from the plain lowering (immaterial for a style randomizer).
            ph = -x.shape[1] % 4
            pw = -x.shape[2] % 4
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                            mode="reflect")
            return self._phase_forward(x, styles)
        up = self.use_pallas
        pi = self.pallas_interpret

        x = ConvInRelu(32, 9, 1, dtype=self.dtype, use_pallas=up,
                       pallas_interpret=pi, name="layer0")(x)
        if self._cut(0):
            return x
        x = ConvInRelu(64, 3, 2, dtype=self.dtype, use_pallas=up,
                       pallas_interpret=pi, name="layer1")(x)
        if self._cut(1):
            return x
        x = ConvInRelu(128, 3, 2, dtype=self.dtype, use_pallas=up,
                       pallas_interpret=pi, name="layer2")(x)
        if self._cut(2):
            return x
        for i in range(5):
            x = ResidualBlock(128, dtype=self.dtype, use_pallas=up,
                              pallas_interpret=pi, name=f"layer{3 + i}")(x, styles)
            if self._cut(3 + i):
                return x
        x = UpsampleConvInRelu(64, 3, upsample=2, dtype=self.dtype, use_pallas=up,
                               pallas_interpret=pi, name="layer8")(x, styles)
        if self._cut(8):
            return x
        x = UpsampleConvInRelu(32, 3, upsample=2, dtype=self.dtype, use_pallas=up,
                               pallas_interpret=pi, name="layer9")(x, styles)
        if self._cut(9):
            return x
        x = UpsampleConvInRelu(3, 9, upsample=None, use_relu=False,
                               dtype=self.dtype, use_pallas=up,
                               pallas_interpret=pi, name="layer10")(x, styles)
        return self._out(nn.sigmoid(x.astype(jnp.float32)))

    def _phase_forward(self, x, styles):
        """Space-to-depth pipeline (see class docstring). Parameter trees are
        declared through _PhaseLayerParams so checkpoints interchange with
        the plain path."""
        from ..ops.phase_conv import (
            conv3x3_s2_phase_aligned,
            conv9x9_phase,
            conv9x9_phase_dp,
            depth_to_space2,
            phase_instance_norm_packed,
            space_to_depth2,
            upconv3x3_phase_packed,
        )

        # layer0: 9x9 3->32 @ full res -> phase output (B, H/2, W/2, 4*32)
        w, b, _, _ = _PhaseLayerParams(32, 9, name="layer0")(3)
        x4 = space_to_depth2(x)
        a = conv9x9_phase(x4, w, b)
        a = nn.relu(phase_instance_norm_packed(a)).astype(self.dtype)
        if self._cut(0):
            return a

        # layer1: 3x3 s2 32->64; its s2d input IS layer0's phase output
        w, b, _, _ = _PhaseLayerParams(64, 3, name="layer1")(32)
        y = conv3x3_s2_phase_aligned(a, w, b)
        y = nn.relu(instance_norm_film(y)).astype(self.dtype)
        if self._cut(1):
            return y

        # layer2: 3x3 s2 64->128 @ 112 -> 56
        w, b, _, _ = _PhaseLayerParams(128, 3, name="layer2")(64)
        y = conv3x3_s2_phase_aligned(space_to_depth2(y), w, b)
        y = nn.relu(instance_norm_film(y)).astype(self.dtype)
        if self._cut(2):
            return y

        # residual blocks (56^2 x 128): the fused Pallas kernel beats XLA's
        # lowering by ~13% here (3.08 vs 3.53 ms for the 5-block chain,
        # fetch-synced A/B in scripts/probe_resblock.py)
        for i in range(5):
            y = ResidualBlock(128, dtype=self.dtype,
                              use_pallas=self.use_pallas,
                              pallas_interpret=self.pallas_interpret,
                              name=f"layer{3 + i}")(y, styles)
            if self._cut(3 + i):
                return y

        # layer8: up2 + 3x3 128->64 as aligned subpixel conv (packed phase
        # output, full-lane 4O channels, no shifted-window stack)
        w, b, g, be = _PhaseLayerParams(64, 3, film=True,
                                        name="layer8")(128, styles)
        z = upconv3x3_phase_packed(y, w, b)  # (B, 56, 56, 256)
        z = nn.relu(phase_instance_norm_packed(z, g, be))
        y = depth_to_space2(z).astype(self.dtype)  # (B, 112, 112, 64)
        if self._cut(8):
            return y

        # layer9: up2 + 3x3 64->32; its packed output IS layer10's s2d input
        w, b, g, be = _PhaseLayerParams(32, 3, film=True,
                                        name="layer9")(64, styles)
        z = upconv3x3_phase_packed(y, w, b)  # (B, 112, 112, 128)
        a = nn.relu(phase_instance_norm_packed(z, g, be)).astype(self.dtype)
        if self._cut(9):
            return a

        # layer10: 9x9 32->3 + IN + FiLM (no relu). ``l10_dp`` emits the
        # conv DOUBLE-packed: (B, 56, 56, 48) — N=48 output lanes instead of
        # 12 (2.8x less MXU padding tax) and the IN/FiLM/sigmoid tail runs at
        # 48/128 instead of 12/128 lane occupancy.
        w, b, g, be = _PhaseLayerParams(3, 9, film=True,
                                        name="layer10")(32, styles)
        if self.l10_dp and a.shape[1] % 2 == 0 and a.shape[2] % 2 == 0:
            z = conv9x9_phase_dp(a, w, b)  # (B, 56, 56, 48)
            z = phase_instance_norm_packed(z, g, be, phases=16)
            # Cast before the d2s pair so the full-res shuffles move bf16.
            z = self._out(nn.sigmoid(z.astype(jnp.float32)))
            return depth_to_space2(depth_to_space2(z))
        z = conv9x9_phase(a, w, b)  # (B, 112, 112, 12)
        z = phase_instance_norm_packed(z, g, be)
        z = self._out(nn.sigmoid(z.astype(jnp.float32)))
        return depth_to_space2(z)
