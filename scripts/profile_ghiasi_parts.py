"""Per-layer cost bisection of the Ghiasi style transformer on TPU.

Times ONE stage of the generator per process (remote-compile tunnel is more
reliable with a single program). Stages (B=48, bf16, styleaug shapes):

  l0   ConvInRelu(32, 9x9, s1)        @ (48, 224, 224, 3)
  l1   ConvInRelu(64, 3x3, s2)        @ (48, 224, 224, 32)
  l2   ConvInRelu(128, 3x3, s2)       @ (48, 112, 112, 64)
  res  5x ResidualBlock(128)          @ (48, 56, 56, 128)
  l8   UpsampleConvInRelu(64, up2)    @ (48, 56, 56, 128)
  l9   UpsampleConvInRelu(32, up2)    @ (48, 112, 112, 64)
  l10  UpsampleConvInRelu(3, 9x9)+sig @ (48, 224, 224, 32)
  all  full Ghiasi                    @ (48, 224, 224, 3)

Usage: python scripts/profile_ghiasi_parts.py {l0|l1|l2|res|l8|l9|l10|all}
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import speedplusbaseline_tpu  # noqa: F401

B = 48
DTYPE = jnp.bfloat16


def main():
    part = sys.argv[1]
    from flax import linen as nn

    from speedplusbaseline_tpu.models.ghiasi import (
        ConvInRelu,
        Ghiasi,
        ResidualBlock,
        UpsampleConvInRelu,
    )

    key = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    emb = jnp.asarray(rs.randn(B, 100).astype(np.float32))

    class Res5(nn.Module):
        @nn.compact
        def __call__(self, x, s):
            for i in range(5):
                x = ResidualBlock(128, dtype=DTYPE, name=f"layer{3 + i}")(x, s)
            return x

    class Out10(nn.Module):
        @nn.compact
        def __call__(self, x, s):
            x = UpsampleConvInRelu(3, 9, upsample=None, use_relu=False,
                                   dtype=DTYPE, name="layer10")(x, s)
            return nn.sigmoid(x.astype(jnp.float32))

    # Micro-variants: "<part>:zeropad" (SAME conv, no explicit pad),
    # "<part>:noin" (skip instance norm), "<part>:convonly" (bare SAME conv).
    variant = ""
    if ":" in part:
        part, variant = part.split(":")
    if variant:
        import speedplusbaseline_tpu.models.ghiasi as gmod
        import speedplusbaseline_tpu.ops.instancenorm as inorm

        if variant in ("zeropad", "convonly"):
            # SAME padding folded into the conv op itself
            gmod.reflect_pad = lambda x, pad: x
            _orig_conv = nn.Conv

            class SameConv(nn.Conv):
                def __init__(self, *a, **kw):
                    kw["padding"] = "SAME"
                    super().__init__(*a, **kw)
            gmod.nn = type(sys)("nn_shim")
            gmod.nn.__dict__.update(nn.__dict__)
            gmod.nn.Conv = lambda feat, ks, **kw: _orig_conv(
                feat, ks, **{**kw, "padding": "SAME"})
        if variant in ("noin", "convonly"):
            gmod.instance_norm_film = lambda x, g=None, b=None, **kw: x

    # Direct phase-primitive timings (no flax): pconv9_s, pconv9_l, ppad9,
    # ps2_small, ps2_big, pup_small, pup_big, ps2d, pin
    if part.startswith("p"):
        from speedplusbaseline_tpu.ops import phase_conv as pc

        rs2 = np.random.RandomState(1)

        def arr(*shape):
            return jnp.asarray(rs2.rand(*shape).astype(np.float32)).astype(DTYPE)

        if part == "pconv9_s":  # layer0 phase conv: (48,112,112,12) w(9,9,3,32)
            x = arr(B, 112, 112, 12)
            w = jnp.asarray(rs2.randn(9, 9, 3, 32).astype(np.float32) * 0.05)
            bb = jnp.zeros((32,))
            fn = jax.jit(lambda x: pc.conv9x9_phase(x, w, bb))
        elif part == "pconv9_l":  # layer10: (48,112,112,128) w(9,9,32,3)
            x = arr(B, 112, 112, 128)
            w = jnp.asarray(rs2.randn(9, 9, 32, 3).astype(np.float32) * 0.05)
            bb = jnp.zeros((3,))
            fn = jax.jit(lambda x: pc.conv9x9_phase(x, w, bb))
        elif part == "ppad9":
            x = arr(B, 112, 112, 128)
            fn = jax.jit(lambda x: pc.phase_pad_9x9(x))
        elif part == "ps2_small":  # layer1: in (48,112,112,128) w(3,3,32,64)
            x = arr(B, 112, 112, 128)
            w = jnp.asarray(rs2.randn(3, 3, 32, 64).astype(np.float32) * 0.05)
            fn = jax.jit(lambda x: pc.conv3x3_s2_phase(x, w, jnp.zeros((64,))))
        elif part == "ps2_big":  # layer2: in (48,56,56,256) w(3,3,64,128)
            x = arr(B, 56, 56, 256)
            w = jnp.asarray(rs2.randn(3, 3, 64, 128).astype(np.float32) * 0.05)
            fn = jax.jit(lambda x: pc.conv3x3_s2_phase(x, w, jnp.zeros((128,))))
        elif part == "pup_small":  # layer9: (48,112,112,64) w(3,3,64,32)
            x = arr(B, 112, 112, 64)
            w = jnp.asarray(rs2.randn(3, 3, 64, 32).astype(np.float32) * 0.05)
            fn = jax.jit(lambda x: pc.upconv3x3_phase_packed(
                x, w, jnp.zeros((32,))))
        elif part == "pup_big":  # layer8: (48,56,56,128) w(3,3,128,64)
            x = arr(B, 56, 56, 128)
            w = jnp.asarray(rs2.randn(3, 3, 128, 64).astype(np.float32) * 0.05)
            fn = jax.jit(lambda x: pc.upconv3x3_phase_packed(
                x, w, jnp.zeros((64,))))
        elif part == "pconv1x1":  # calibration floor: 1x1 conv, same M/K/N
            x = arr(B, 113, 113, 128)
            w = jnp.asarray(rs2.randn(1, 1, 128, 64).astype(np.float32) * 0.05)
            fn = jax.jit(lambda x: pc._conv(x, w))
        elif part == "ps2mm_small":  # layer1 as 4 shifted matmuls
            x = arr(B, 112, 112, 128)
            w = jnp.asarray(rs2.randn(3, 3, 32, 64).astype(np.float32) * 0.05)
            w2 = pc.phase_weights_s2(w)

            def s2mm(x):
                xp = pc.phase_pad_s2(x)
                h, wd = x.shape[1], x.shape[2]
                y = None
                for kh in range(2):
                    for kw in range(2):
                        t = jnp.einsum(
                            "bhwc,co->bhwo",
                            xp[:, kh:kh + h, kw:kw + wd],
                            w2[kh, kw].astype(xp.dtype))
                        y = t if y is None else y + t
                return y
            fn = jax.jit(s2mm)
        elif part == "p9mm_l":  # layer10 as 25 shifted matmuls
            x = arr(B, 112, 112, 128)
            w = jnp.asarray(rs2.randn(9, 9, 32, 3).astype(np.float32) * 0.05)
            w9 = pc.phase_weights_9x9(w)

            def mm9(x):
                xp = pc.phase_pad_9x9(x)
                h, wd = x.shape[1], x.shape[2]
                y = None
                for kh in range(5):
                    for kw in range(5):
                        t = jnp.einsum(
                            "bhwc,co->bhwo",
                            xp[:, kh:kh + h, kw:kw + wd],
                            w9[kh, kw].astype(xp.dtype))
                        y = t if y is None else y + t
                return y
            fn = jax.jit(mm9)
        elif part == "ps2d":  # s2d of the input image + final d2s
            x = arr(B, 224, 224, 3)
            fn = jax.jit(lambda x: pc.space_to_depth2(x))
        elif part == "pin":  # phase IN on (48,112,112,4,32)
            x = arr(B, 112, 112, 4, 32)
            g = arr(B, 32)
            be = arr(B, 32)
            fn = jax.jit(lambda x: pc.phase_instance_norm(x, g, be, phase_axis=3))
        else:
            raise SystemExit(f"unknown phase part {part}")

        t0 = time.perf_counter()
        out = fn(x)
        jax.block_until_ready(out)
        print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
        for _ in range(4):
            out = fn(x)
        jax.block_until_ready(out)
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"ghiasi[{part}]: {dt*1e3:.2f} ms  ({B/dt:.0f} img/s)", flush=True)
        return

    styled = True
    if part == "l0":
        mod, shape, styled = ConvInRelu(32, 9, 1, dtype=DTYPE), (B, 224, 224, 3), False
    elif part == "l1":
        mod, shape, styled = ConvInRelu(64, 3, 2, dtype=DTYPE), (B, 224, 224, 32), False
    elif part == "l2":
        mod, shape, styled = ConvInRelu(128, 3, 2, dtype=DTYPE), (B, 112, 112, 64), False
    elif part == "res":
        mod, shape = Res5(), (B, 56, 56, 128)
    elif part == "l8":
        mod, shape = UpsampleConvInRelu(64, 3, upsample=2, dtype=DTYPE), (B, 56, 56, 128)
    elif part == "l9":
        mod, shape = UpsampleConvInRelu(32, 3, upsample=2, dtype=DTYPE), (B, 112, 112, 64)
    elif part == "l10":
        mod, shape = Out10(), (B, 224, 224, 32)
    elif part == "all":
        mod, shape = Ghiasi(dtype=DTYPE), (B, 224, 224, 3)
    elif part == "all_opt":
        mod, shape = Ghiasi(dtype=DTYPE, tpu_opt=True), (B, 224, 224, 3)
    else:
        raise SystemExit(f"unknown part {part}")

    x = jnp.asarray(rs.rand(*shape).astype(np.float32)).astype(DTYPE)
    if styled:
        v = mod.init({"params": key}, jnp.zeros((1, *shape[1:])), emb[:1])
        fn = jax.jit(lambda x: mod.apply(v, x, emb))
    else:
        v = mod.init({"params": key}, jnp.zeros((1, *shape[1:])))
        fn = jax.jit(lambda x: mod.apply(v, x))

    t0 = time.perf_counter()
    out = fn(x)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    for _ in range(4):
        out = fn(x)
    jax.block_until_ready(out)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    tag = f"{part}:{variant}" if variant else part
    print(f"ghiasi[{tag}]: {dt*1e3:.2f} ms  ({B/dt:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
