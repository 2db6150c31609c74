"""Fetch-synced timing of ONE fused-IR piece on TPU (one compile/process).

Usage: python scripts/profile_fused.py {stats2|fwd2|bwd2|xfwd2|xbwd2|
                                        stats3|fwd3|bwd3|xfwd3|xbwd3|
                                        fwd4|bwd4|xfwd4|xbwd4} [N]

Pieces: block2 = (112^2, Cin16 -> Ce96, s2); block3 = (56^2, 24 -> 144, s1);
block4 = (56^2, 24 -> 144, s2). 'x' prefix = the plain XLA chain it replaces.
statsK = the analytic expand_stats Gram pass for that block.
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
SHAPES = {
    "2": (112, 16, 96, 2),
    "3": (56, 24, 144, 1),
    "4": (56, 24, 144, 2),
}


def main():
    which = sys.argv[1]
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from jax import lax

    from speedplusbaseline_tpu.ops.fused_ir import (
        expand_stats,
        fused_expand_dw_call,
    )

    kind, blk = which[:-1], which[-1]
    h, cin, ce, stride = SHAPES[blk]

    rs = np.random.RandomState(0)
    # pool of distinct inputs (avoid result caching through the tunnel)
    xs = [jnp.asarray(rs.randn(B, h, h, cin).astype(np.float32),
                      dtype=jnp.bfloat16) for _ in range(4)]
    w_e = jnp.asarray(rs.randn(cin, ce).astype(np.float32) * 0.2)
    gamma = jnp.asarray(rs.rand(ce).astype(np.float32) + 0.5)
    beta = jnp.asarray(rs.randn(ce).astype(np.float32) * 0.2)
    w_dw = jnp.asarray(rs.randn(3, 3, ce).astype(np.float32) * 0.2)
    mu = jnp.asarray(rs.randn(ce).astype(np.float32) * 0.1)
    var = jnp.asarray(rs.rand(ce).astype(np.float32) + 0.5)
    dy = jnp.asarray(rs.randn(B, h // stride, h // stride, ce)
                     .astype(np.float32), dtype=jnp.bfloat16)

    def xla_chain(x):
        z = jnp.einsum("bhwc,ce->bhwe", x,
                       w_e.astype(jnp.bfloat16))
        zh = (z.astype(jnp.float32) - mu) * lax.rsqrt(var + 1e-5) * gamma + beta
        a = jnp.clip(zh, 0.0, 6.0).astype(jnp.bfloat16)
        return lax.conv_general_dilated(
            a, w_dw.astype(jnp.bfloat16).reshape(3, 3, 1, ce),
            (stride, stride), [(1, 1), (1, 1)], feature_group_count=ce,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def fused(x):
        return fused_expand_dw_call(x, w_e, gamma, beta, w_dw, mu, var,
                                    stride=stride)

    if kind == "stats":
        fn = jax.jit(lambda x: expand_stats(x, w_e)[1])
    elif kind == "fwd":
        fn = jax.jit(lambda x: fused(x))
    elif kind == "xfwd":
        fn = jax.jit(lambda x: xla_chain(x))
    elif kind == "bwd":
        fn = jax.jit(lambda x: jax.vjp(fused, x)[1](dy)[0])
    elif kind == "xbwd":
        fn = jax.jit(lambda x: jax.vjp(xla_chain, x)[1](dy)[0])
    else:
        raise SystemExit(f"unknown piece {which}")

    out = fn(xs[0])
    jax.block_until_ready(out)
    grab = jax.jit(lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[0])
    _ = np.array(grab(out))

    def run(n):
        t0 = time.perf_counter()
        o = None
        for i in range(n):
            o = fn(xs[i % len(xs)])
        _ = np.array(grab(o))
        return time.perf_counter() - t0

    run(1)
    t1 = run(1)
    tn = run(N)
    dt = (tn - t1) / (N - 1)
    print(f"fused[{which}]: {dt*1e3:.3f} ms  (N={N})", flush=True)


if __name__ == "__main__":
    main()
