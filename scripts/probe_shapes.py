"""Raw-speed probes for the Ghiasi hot shapes on TPU.

Each part runs one compiled program (remote-compile hazard). Parts:
  addc    y = x + 1                      (48,112,112,128) bf16   BW floor
  mm2d    (48*112*112,128)@(128,64)      pure matmul, same M/K/N as pconv1x1
  mm2d_n128  (48*112*112,128)@(128,128)  full-lane variant
  mm2d_f32   f32 accumulate variant
  conv1x1_even  (48,112,112,128)->64 1x1 conv (even spatial)
  conv2x2_pack  2x2 s1 VALID conv (48,113,113,128)->128

Usage: python scripts/probe_shapes.py <part>
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


def main():
    part = sys.argv[1]
    rs = np.random.RandomState(0)

    def arr(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rs.rand(*shape).astype(np.float32)).astype(dtype)

    flops = None
    nbytes = None
    if part == "addc":
        x = arr(48, 112, 112, 128)
        fn = jax.jit(lambda x: x + 1)
        nbytes = x.size * 2 * 2
    elif part == "mm2d":
        x = arr(48 * 112 * 112, 128)
        w = arr(128, 64)
        fn = jax.jit(lambda x: x @ w)
        flops = 2 * x.shape[0] * 128 * 64
    elif part == "mm2d_n128":
        x = arr(48 * 112 * 112, 128)
        w = arr(128, 128)
        fn = jax.jit(lambda x: x @ w)
        flops = 2 * x.shape[0] * 128 * 128
    elif part == "mm2d_f32":
        x = arr(48 * 112 * 112, 128)
        w = arr(128, 64)
        fn = jax.jit(lambda x: jax.lax.dot(x, w, precision=None,
                                           preferred_element_type=jnp.float32))
        flops = 2 * x.shape[0] * 128 * 64
    elif part == "conv1x1_even":
        x = arr(48, 112, 112, 128)
        w = arr(1, 1, 128, 64)
        fn = jax.jit(lambda x: jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        flops = 2 * 48 * 112 * 112 * 128 * 64
    elif part == "conv2x2_pack":
        x = arr(48, 113, 113, 128)
        w = arr(2, 2, 128, 128)
        fn = jax.jit(lambda x: jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        flops = 2 * 48 * 112 * 112 * 4 * 128 * 128
    elif part == "pad_s2":
        from speedplusbaseline_tpu.ops.phase_conv import phase_pad_s2
        x = arr(48, 112, 112, 128)
        fn = jax.jit(phase_pad_s2)
    elif part == "pad_edge":
        x = arr(48, 112, 112, 128)
        fn = jax.jit(lambda x: jnp.pad(
            x, ((0, 0), (1, 0), (1, 0), (0, 0)), mode="edge"))
    elif part == "conv2x2_n64":
        x = arr(48, 113, 113, 128)
        w = arr(2, 2, 128, 64)
        fn = jax.jit(lambda x: jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        flops = 2 * 48 * 112 * 112 * 4 * 128 * 64
    elif part == "conv5x5_n12":
        x = arr(48, 116, 116, 128)
        w = arr(5, 5, 128, 12)
        fn = jax.jit(lambda x: jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        flops = 2 * 48 * 112 * 112 * 25 * 128 * 12
    elif part == "conv5x5_n128":
        x = arr(48, 116, 116, 12)
        w = arr(5, 5, 12, 128)
        fn = jax.jit(lambda x: jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        flops = 2 * 48 * 112 * 112 * 25 * 12 * 128
    elif part == "up9_aligned":
        # layer9 as aligned subpixel: edge-pad-1 + 3x3 VALID 64->128 @112^2
        x = arr(48, 112, 112, 64)
        w = arr(3, 3, 64, 128)
        fn = jax.jit(lambda x: jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
            w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        flops = 2 * 48 * 112 * 112 * 9 * 64 * 128
    elif part == "up8_aligned":
        # layer8 as aligned subpixel: edge-pad-1 + 3x3 VALID 128->256 @56^2
        x = arr(48, 56, 56, 128)
        w = arr(3, 3, 128, 256)
        fn = jax.jit(lambda x: jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
            w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        flops = 2 * 48 * 56 * 56 * 9 * 128 * 256
    elif part == "s2_aligned":
        # layer1 as single-edge-pad 2x2 conv with masked weights @112^2
        x = arr(48, 112, 112, 128)
        w = arr(2, 2, 128, 64)
        fn = jax.jit(lambda x: jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)), mode="edge"),
            w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        flops = 2 * 48 * 112 * 112 * 4 * 128 * 64
    elif part == "s2_barrier":
        # layer1 phase conv with the pad materialized via optimization_barrier
        x = arr(48, 112, 112, 128)
        w = arr(2, 2, 128, 64)

        def f(x):
            xp = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)), mode="edge")
            xp = jax.lax.optimization_barrier(xp)
            return jax.lax.conv_general_dilated(
                xp, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fn = jax.jit(f)
        flops = 2 * 48 * 112 * 112 * 4 * 128 * 64
    elif part == "up9_barrier":
        x = arr(48, 112, 112, 64)
        w = arr(3, 3, 64, 128)

        def f(x):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            xp = jax.lax.optimization_barrier(xp)
            return jax.lax.conv_general_dilated(
                xp, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fn = jax.jit(f)
        flops = 2 * 48 * 112 * 112 * 9 * 64 * 128
    elif part == "p9l_barrier":
        # layer10 phase conv: phase_pad_9x9 -> barrier -> 5x5 N=12
        from speedplusbaseline_tpu.ops.phase_conv import phase_pad_9x9
        x = arr(48, 112, 112, 128)
        w = arr(5, 5, 128, 12)

        def f(x):
            xp = jax.lax.optimization_barrier(phase_pad_9x9(x))
            return jax.lax.conv_general_dilated(
                xp, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fn = jax.jit(f)
        flops = 2 * 48 * 112 * 112 * 25 * 128 * 12
    elif part == "in_plain":
        from speedplusbaseline_tpu.ops.instancenorm import instance_norm_film
        x = arr(48, 112, 112, 128)
        fn = jax.jit(lambda x: instance_norm_film(x))
    elif part == "in_relu_barrier":
        from speedplusbaseline_tpu.ops.instancenorm import instance_norm_film
        x = arr(48, 112, 112, 128)

        def f(x):
            x = jax.lax.optimization_barrier(x)
            return jax.nn.relu(instance_norm_film(x))
        fn = jax.jit(f)
    elif part == "mean_only":
        x = arr(48, 112, 112, 128)
        fn = jax.jit(lambda x: jnp.mean(
            x.astype(jnp.float32), axis=(1, 2)))
    elif part in ("in64_xla", "in64_pallas"):
        # l1's IN site in the phase path: (48, 112, 112, 64)
        x = arr(48, 112, 112, 64)
        if part == "in64_xla":
            from speedplusbaseline_tpu.ops.instancenorm import instance_norm_film
            fn = jax.jit(lambda x: jax.nn.relu(instance_norm_film(x)))
        else:
            from speedplusbaseline_tpu.ops.pallas_instancenorm import (
                instance_norm_film_pallas,
            )
            fn = jax.jit(lambda x: instance_norm_film_pallas(x, relu=True))
    elif part in ("inpk_xla",):
        from speedplusbaseline_tpu.ops.phase_conv import phase_instance_norm_packed
        x = arr(48, 112, 112, 128)
        g = arr(48, 32, dtype=jnp.float32)
        be = arr(48, 32, dtype=jnp.float32)
        fn = jax.jit(lambda x: jax.nn.relu(phase_instance_norm_packed(x, g, be)))
    else:
        raise SystemExit(f"unknown part {part}")

    # Fetch-synced protocol (CLAUDE.md): per-call = (t(N)-t(1))/(N-1), each
    # run ending in a 1-element host fetch that syncs the device queue.
    t0 = time.perf_counter()
    out = fn(x)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    grab = jax.jit(lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[0])
    _ = np.array(grab(out))

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(x)
        _ = np.array(grab(o))
        return time.perf_counter() - t0

    run(1)
    t1 = run(1)
    n = 100
    tn = run(n)
    dt = (tn - t1) / (n - 1)
    extra = ""
    if flops:
        extra = f"  {flops/dt/1e12:.1f} TFLOP/s"
    if nbytes:
        extra += f"  {nbytes/dt/1e9:.0f} GB/s"
    print(f"probe[{part}]: {dt*1e3:.3f} ms{extra}", flush=True)


if __name__ == "__main__":
    main()
