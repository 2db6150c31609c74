"""Grad-prefix bisection of the KRN backbone on TPU (fetch-synced).

Times jax.grad of sum(prefix_k(x)) for increasing MobileNetV2 depth —
prefix differences give the true in-context fwd+bwd cost per block group
(the bare step's backward is ~7.5 ms vs 1.24 ms forward; isolated per-op
probes show no single hog, so this localizes it in-network).

Usage: python scripts/profile_krn_prefix.py <k> [N]
  k = number of IR blocks after the stem (0..17); -1 = stem only.
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

B, H, W = 48, 224, 224


def main():
    k = int(sys.argv[1])
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from flax import linen as nn

    from speedplusbaseline_tpu.models.layers import ConvBN
    from speedplusbaseline_tpu.models.mobilenetv2 import (
        _IR_SETTINGS,
        InvertedResidual,
        relu6,
    )

    class Prefix(nn.Module):
        upto: int

        @nn.compact
        def __call__(self, x, train: bool = True):
            x = ConvBN(32, 3, 2, act=relu6, dtype=jnp.bfloat16,
                       name="stem")(x, train)
            idx = 1
            for (t, c, n, s) in _IR_SETTINGS:
                for i in range(n):
                    if idx > self.upto:
                        return x
                    stride = s if i == 0 else 1
                    x = InvertedResidual(c, stride, t, dtype=jnp.bfloat16,
                                         name=f"block{idx}")(x, train)
                    idx += 1
            return x

    mod = Prefix(upto=k)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(B, H, W, 3).astype(np.float32))
    variables = mod.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, H, W, 3)), train=False)

    def loss_fn(params):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    fn = jax.jit(lambda: jax.grad(loss_fn)(variables["params"]))

    out = fn()
    jax.block_until_ready(out)
    grab = jax.jit(lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[0])
    _ = np.array(grab(out))

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn()
        _ = np.array(grab(o))
        return time.perf_counter() - t0

    run(1)
    t1 = run(1)
    tn = run(N)
    dt = (tn - t1) / (N - 1)
    print(f"krnprefix[{k}]: {dt*1e3:.3f} ms  (N={N})", flush=True)


if __name__ == "__main__":
    main()
