"""A/B the fused Pallas residual block vs XLA's lowering (fetch-synced).

Round 1 concluded "Pallas resblock ~= XLA" from the unreliable loop
protocol; this re-measures both with the trustworthy protocol at the Ghiasi
shape (48, 56, 56, 128), 5 chained blocks like the real generator.

Usage: python scripts/probe_resblock.py {xla|pallas}
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

B, H, W, C = 48, 56, 56, 128


def main():
    mode = sys.argv[1]
    from flax import linen as nn

    from speedplusbaseline_tpu.models.ghiasi import ResidualBlock

    class Res5(nn.Module):
        pallas: bool

        @nn.compact
        def __call__(self, x, s):
            for i in range(5):
                x = ResidualBlock(C, dtype=jnp.bfloat16,
                                  use_pallas=self.pallas,
                                  name=f"layer{3 + i}")(x, s)
            return x

    rs = np.random.RandomState(0)
    emb = jnp.asarray(rs.randn(B, 100).astype(np.float32))
    x = jnp.asarray(rs.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)

    mod = Res5(pallas=(mode == "pallas"))
    v = mod.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, H, W, C)), emb[:1])
    fn = jax.jit(lambda x: mod.apply(v, x, emb))

    out = fn(x)
    jax.block_until_ready(out)
    grab = jax.jit(lambda o: o.ravel()[0])
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
    print(f"res5[{mode}]: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
