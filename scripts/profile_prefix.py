"""Cumulative-prefix bisection of the Ghiasi forward on TPU.

The per-op loop+block_until_ready protocol is unreliable through the axon
tunnel (block_until_ready returns early for some programs; dispatch
backpressure inflates others — measured both directions). This uses the
fetch-synced protocol: per-call = (t(N) - t(1)) / (N - 1) where each t ends
with a 1-element device-side slice fetched to host (device execution is
serial, so the fetch syncs everything enqueued before it).

Prefix k runs stages [0..k] of the generator; differences between successive
prefixes give the true in-context cost of each stage.

Drives the REAL models.Ghiasi module via its ``upto`` field (a round-3 fix:
the original script re-implemented the stage stack and silently measured a
stale lowering — no Pallas resblocks, no l10 variants).

Usage: python scripts/profile_prefix.py <mode> <k> [N] [H]
  stages: 0=l0 1=l1 2=l2 3..7=res1..5 8=l8 9=l9 10=l10(+sigmoid)
  opt    = production phase path (tpu_opt + Pallas resblocks + dp l10)
  opt_nodp = same with l10_dp=False (the round-2 l10 lowering)
  plain  = the direct flax lowering (no tpu_opt, no Pallas)
  (the losing round-3 lowerings opt_border/opt_qp/opt_2x2 were pruned after
  measurement — BASELINE.md "Round-3 Ghiasi endgame")
  H      = input height/width (default 224; odd sizes exercise the pad path)
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
POOL = 4


def main():
    mode, k = sys.argv[1], int(sys.argv[2])
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    H = int(sys.argv[4]) if len(sys.argv) > 4 else 224

    from speedplusbaseline_tpu.models.ghiasi import Ghiasi

    rs = np.random.RandomState(0)
    emb = jnp.asarray(rs.randn(B, 100).astype(np.float32))

    upto = None if k >= 10 else k
    mod = Ghiasi(dtype=DTYPE, tpu_opt=(mode.startswith("opt")),
                 use_pallas=(mode.startswith("opt")),
                 l10_dp=(mode != "opt_nodp"), upto=upto)
    v = mod.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, H, H, 3)), emb[:1])
    fn = jax.jit(lambda x: mod.apply(v, x, emb))

    base = jnp.asarray(rs.rand(B, H, H, 3).astype(np.float32))
    xs = [base + i * 1e-3 for i in range(POOL)]
    jax.block_until_ready(xs)
    grab = jax.jit(lambda o: o.ravel()[0])
    _ = np.array(grab(jax.block_until_ready(fn(xs[0]))))

    def run(n):
        t0 = time.perf_counter()
        o = None
        for i in range(n):
            o = fn(xs[i % POOL])
        _ = np.array(grab(o))
        return time.perf_counter() - t0

    run(1)
    t1 = run(1)
    tN = run(N)
    per = (tN - t1) / (N - 1)
    print(f"prefix[{mode}:{k}]: {per*1e3:.3f} ms/call  (N={N}, H={H})",
          flush=True)


if __name__ == "__main__":
    main()
