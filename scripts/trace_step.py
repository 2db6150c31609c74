"""Capture a jax.profiler trace of the full KRN train step (styleaug on) and
print the top TPU ops by total duration.

Usage: python scripts/trace_step.py [variant]   (default full1)
"""
from __future__ import annotations

import glob
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import collections
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

import speedplusbaseline_tpu  # noqa: F401

B, H, W = 48, 224, 224
OUT = "/tmp/jax_trace"


def build_step(bare=False):
    from speedplusbaseline_tpu.augment.styleaug import StyleAugmentor, random_style_stats
    from speedplusbaseline_tpu.config import default_cfg
    from speedplusbaseline_tpu.engine import (
        build_optimizer,
        create_train_state,
        make_krn_train_step,
    )
    from speedplusbaseline_tpu.models import KeypointRegressionNet

    cfg = default_cfg(batch_size=B, input_shape=(H, W), optimizer="adamw",
                      randomize_texture=not bare, texture_ratio=1.0, fp16=True)
    model = KeypointRegressionNet(11, dtype=jnp.bfloat16)
    tx = build_optimizer(cfg, 100)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, tx, key, jnp.zeros((1, H, W, 3)))
    if bare:
        sp = None
        step = make_krn_train_step(model, tx, cfg, style_aug=None)
    else:
        aug = StyleAugmentor(0.5, random_style_stats(0), dtype=jnp.bfloat16)
        sp = aug.init_params(jax.random.PRNGKey(1), (1, H, W, 3))
        step = make_krn_train_step(model, tx, cfg, style_aug=aug)
    rs = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rs.rand(B, H, W, 3).astype(np.float32)),
             "keypts": jnp.asarray(rs.rand(B, 2, 11).astype(np.float32))}
    return step, state, batch, sp, key


def main():
    bare = len(sys.argv) > 1 and sys.argv[1] == "bare"
    step, state, batch, sp, key = build_step(bare=bare)
    # warm up / compile outside the trace
    for _ in range(3):
        state, sm = step(state, batch, key, sp)
    jax.block_until_ready(state.params)

    os.makedirs(OUT, exist_ok=True)
    with jax.profiler.trace(OUT):
        for _ in range(5):
            state, sm = step(state, batch, key, sp)
        jax.block_until_ready(state.params)
    print("trace captured", flush=True)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(OUT, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        print("no xplane files found")
        return
    totals = collections.Counter()
    for f in files[-1:]:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(f, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    totals[name] += ev.duration_ps / 1e9  # ms
    print(f"planes parsed from {files[-1]}")
    for name, ms in totals.most_common(30):
        print(f"{ms/5:9.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
