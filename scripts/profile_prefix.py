"""Cumulative-prefix bisection of the Ghiasi forward on TPU.

The per-op loop+block_until_ready protocol is unreliable through the axon
tunnel (block_until_ready returns early for some programs; dispatch
backpressure inflates others — measured both directions). This uses the
fetch-synced protocol: per-call = (t(N) - t(1)) / (N - 1) where each t ends
with a 1-element device-side slice fetched to host (device execution is
serial, so the fetch syncs everything enqueued before it).

Prefix k runs stages [0..k] of the generator; differences between successive
prefixes give the true in-context cost of each stage.

Usage: python scripts/profile_prefix.py {plain|opt} <k> [N]
  stages: 0=l0 1=l1 2=l2 3..7=res1..5 8=l8 9=l9 10=l10(+sigmoid)
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

    from flax import linen as nn

    from speedplusbaseline_tpu.models import ghiasi as G

    rs = np.random.RandomState(0)
    emb = jnp.asarray(rs.randn(B, 100).astype(np.float32))

    class Prefix(nn.Module):
        upto: int
        opt: bool

        @nn.compact
        def __call__(self, x, styles):
            x = x.astype(DTYPE)
            styles = styles.astype(jnp.float32)
            if self.opt:
                return self._opt(x, styles)
            stages = []
            stages.append(lambda x: G.ConvInRelu(32, 9, 1, dtype=DTYPE, name="layer0")(x))
            stages.append(lambda x: G.ConvInRelu(64, 3, 2, dtype=DTYPE, name="layer1")(x))
            stages.append(lambda x: G.ConvInRelu(128, 3, 2, dtype=DTYPE, name="layer2")(x))
            for i in range(5):
                stages.append(lambda x, i=i: G.ResidualBlock(
                    128, dtype=DTYPE, name=f"layer{3 + i}")(x, styles))
            stages.append(lambda x: G.UpsampleConvInRelu(
                64, 3, upsample=2, dtype=DTYPE, name="layer8")(x, styles))
            stages.append(lambda x: G.UpsampleConvInRelu(
                32, 3, upsample=2, dtype=DTYPE, name="layer9")(x, styles))
            stages.append(lambda x: nn.sigmoid(G.UpsampleConvInRelu(
                3, 9, upsample=None, use_relu=False, dtype=DTYPE,
                name="layer10")(x, styles).astype(jnp.float32)))
            for s in stages[: self.upto + 1]:
                x = s(x)
            return x

        def _opt(self, x, styles):
            from speedplusbaseline_tpu.ops.phase_conv import (
                conv3x3_s2_phase_aligned, conv9x9_phase, depth_to_space2,
                phase_instance_norm_packed, space_to_depth2,
                upconv3x3_phase_packed,
            )
            u = self.upto
            w, b, _, _ = G._PhaseLayerParams(32, 9, name="layer0")(3)
            a = conv9x9_phase(space_to_depth2(x), w, b)
            a = nn.relu(phase_instance_norm_packed(a)).astype(DTYPE)
            if u == 0:
                return a
            w, b, _, _ = G._PhaseLayerParams(64, 3, name="layer1")(32)
            y = nn.relu(G.instance_norm_film(
                conv3x3_s2_phase_aligned(a, w, b))).astype(DTYPE)
            if u == 1:
                return y
            w, b, _, _ = G._PhaseLayerParams(128, 3, name="layer2")(64)
            y = nn.relu(G.instance_norm_film(
                conv3x3_s2_phase_aligned(space_to_depth2(y), w, b))).astype(DTYPE)
            if u == 2:
                return y
            for i in range(min(u - 2, 5)):
                y = G.ResidualBlock(128, dtype=DTYPE, name=f"layer{3 + i}")(y, styles)
            if u <= 7:
                return y
            w, b, g, be = G._PhaseLayerParams(64, 3, film=True, name="layer8")(128, styles)
            z = upconv3x3_phase_packed(y, w, b)
            z = nn.relu(phase_instance_norm_packed(z, g, be))
            y = depth_to_space2(z).astype(DTYPE)
            if u == 8:
                return y
            w, b, g, be = G._PhaseLayerParams(32, 3, film=True, name="layer9")(64, styles)
            z = upconv3x3_phase_packed(y, w, b)
            a = nn.relu(phase_instance_norm_packed(z, g, be)).astype(DTYPE)
            if u == 9:
                return a
            w, b, g, be = G._PhaseLayerParams(3, 9, film=True, name="layer10")(32, styles)
            z = phase_instance_norm_packed(conv9x9_phase(a, w, b), g, be)
            return nn.sigmoid(depth_to_space2(z).astype(jnp.float32))

    mod = Prefix(upto=k, opt=(mode == "opt"))
    v = mod.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, 224, 224, 3)), emb[:1])
    fn = jax.jit(lambda x: mod.apply(v, x, emb))

    base = jnp.asarray(rs.rand(B, 224, 224, 3).astype(np.float32))
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
    print(f"prefix[{mode}:{k}]: {per*1e3:.3f} ms/call  (N={N})", flush=True)


if __name__ == "__main__":
    main()
