"""Measure the styled<->plain program-switch cost (CLAUDE.md lead (b)).

The KRN train step is two specialized XLA programs (host-side bernoulli gate,
engine/steps.py). Bench @ratio 0.5 measured ~26.4 ms/step vs 24.0 expected
from (40.6 styled + 7.4 plain)/2 — this script isolates where the extra
~2.4-3 ms/step goes by timing four schedules over the same two executables:

  styled   : S S S S ...
  plain    : P P P P ...
  grouped  : S*15 then P*15   (one switch)
  alternate: S P S P ...      (switch every step)

and dumping the compiled input/output layouts of the donated train state for
both programs (layout mismatch forces a relayout copy at every switch).

Usage: python scripts/profile_switch.py [nodonate]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import speedplusbaseline_tpu  # noqa: F401

B, H, W = 48, 224, 224


def main():
    donate = "nodonate" not in sys.argv[1:]

    from speedplusbaseline_tpu.augment.styleaug import StyleAugmentor, random_style_stats
    from speedplusbaseline_tpu.config import default_cfg
    from speedplusbaseline_tpu.engine import build_optimizer, create_train_state
    from speedplusbaseline_tpu.engine.steps import make_krn_train_step
    from speedplusbaseline_tpu.models import KeypointRegressionNet

    dtype = jnp.bfloat16
    cfg = default_cfg(batch_size=B, input_shape=(H, W), optimizer="adamw",
                      randomize_texture=True, texture_ratio=0.5, fp16=True)
    model = KeypointRegressionNet(11, dtype=dtype)
    tx = build_optimizer(cfg, 100)
    key = jax.random.PRNGKey(0)
    state0 = create_train_state(model, tx, key, jnp.zeros((1, H, W, 3)))
    style_aug = StyleAugmentor(0.5, random_style_stats(0), dtype=dtype)
    sp = style_aug.init_params(jax.random.PRNGKey(1), (1, H, W, 3))

    rs = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rs.rand(B, H, W, 3).astype(np.float32)),
             "keypts": jnp.asarray(rs.rand(B, 2, 11).astype(np.float32))}

    if not donate:
        # drop donation by patching jax.jit's donate_argnums for this build
        import speedplusbaseline_tpu.engine.steps as steps_mod

        orig_jit = steps_mod.jax.jit
        steps_mod.jax = type(sys)("jax_shim")
        steps_mod.jax.__dict__.update(jax.__dict__)
        steps_mod.jax.jit = lambda f, **kw: orig_jit(
            f, **{k: v for k, v in kw.items() if k != "donate_argnums"})
    step = make_krn_train_step(model, tx, cfg, style_aug=style_aug)

    def run(schedule, n, state):
        # warmup both programs
        state, _ = step(state, batch, key, sp)
        state, _ = step(state, batch, key, None)
        for _ in range(3):
            state, _ = step(state, batch, key, sp)
            state, _ = step(state, batch, key, None)
        jax.block_until_ready(jax.tree_util.tree_leaves(state.params)[0])
        t0 = time.perf_counter()
        for i in range(n):
            use = sp if schedule(i) else None
            state, _ = step(state, batch, key, use)
        jax.block_until_ready(jax.tree_util.tree_leaves(state.params)[0])
        dt = (time.perf_counter() - t0) / n
        return dt, state

    state = state0
    for name, sched in [
        ("styled   ", lambda i: True),
        ("plain    ", lambda i: False),
        ("grouped  ", lambda i: i < 15),
        ("alternate", lambda i: i % 2 == 0),
    ]:
        dt, state = run(sched, 30, state)
        print(f"{name}: {dt*1e3:6.2f} ms/step  ({B/dt:6.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
