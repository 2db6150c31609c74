"""Depthwise-conv backward cost on TPU (fetch-synced protocol).

The bare KRN step is 12.2 ms with fwd only 1.24 ms — backward is ~8x
forward. MobileNetV2 is depthwise-separable; XLA's filter gradient for a
feature_group_count=C conv lowers to a batch_group_count=C conv that TPUs
handle poorly. These probes quantify fwd vs bwd per op class at a
representative hot shape (48, 112, 112, 96).

Parts: dw_fwd dw_bwd dw_bwd_x dw_bwd_w pw_fwd pw_bwd relu6_bwd
Usage: python scripts/probe_dw.py <part>
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

B, H, W, C = 48, 112, 112, 96


def dw(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)


def pw(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    part = sys.argv[1]
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    wd = jnp.asarray((rs.randn(3, 3, 1, C) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
    wp = jnp.asarray((rs.randn(1, 1, C, C) * 0.1).astype(np.float32)).astype(jnp.bfloat16)

    if part == "dw_fwd":
        fn = jax.jit(lambda x: dw(x, wd))
    elif part == "dw_bwd":
        fn = jax.jit(jax.grad(
            lambda xw: jnp.sum(dw(xw[0], xw[1]).astype(jnp.float32))))
        x = (x, wd)
    elif part == "dw_bwd_x":
        fn = jax.jit(jax.grad(lambda x: jnp.sum(dw(x, wd).astype(jnp.float32))))
    elif part == "dw_bwd_w":
        fn = jax.jit(jax.grad(lambda w: jnp.sum(dw(x, w).astype(jnp.float32))))
        x = wd
    elif part == "pw_fwd":
        fn = jax.jit(lambda x: pw(x, wp))
    elif part == "pw_bwd":
        fn = jax.jit(jax.grad(
            lambda xw: jnp.sum(pw(xw[0], xw[1]).astype(jnp.float32))))
        x = (x, wp)
    elif part == "relu6_bwd":
        fn = jax.jit(jax.grad(
            lambda x: jnp.sum(jnp.clip(x, 0, 6).astype(jnp.float32))))
    elif part in ("dw_s2_fwd", "dw_s2_bwd_x", "dw_s2_bwd_w"):
        def dws2(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
        if part == "dw_s2_fwd":
            fn = jax.jit(lambda x: dws2(x, wd))
        elif part == "dw_s2_bwd_x":
            fn = jax.jit(jax.grad(
                lambda x: jnp.sum(dws2(x, wd).astype(jnp.float32))))
        else:
            fn = jax.jit(jax.grad(
                lambda w: jnp.sum(dws2(x, w).astype(jnp.float32))))
            x = wd
    else:
        raise SystemExit(part)

    out = fn(x)
    jax.block_until_ready(out)
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
    print(f"dwprobe[{part}]: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
