"""Decompose KRN train-step cost on the real TPU: model-only vs +augs vs
+styleaug, f32 vs bf16, and Ghiasi forward alone."""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

import speedplusbaseline_tpu  # noqa: F401
from speedplusbaseline_tpu.augment.photometric import augment_batch
from speedplusbaseline_tpu.augment.styleaug import StyleAugmentor, random_style_stats
from speedplusbaseline_tpu.config import default_cfg
from speedplusbaseline_tpu.engine import (
    build_optimizer,
    create_train_state,
    make_krn_train_step,
)
from speedplusbaseline_tpu.models import Ghiasi, KeypointRegressionNet

B, H, W = 48, 224, 224


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(B, H, W, 3).astype(np.float32))
    keypts = jnp.asarray(rs.rand(B, 2, 11).astype(np.float32))
    key = jax.random.PRNGKey(0)

    for dtype, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        cfg = default_cfg(batch_size=B, input_shape=(H, W), optimizer="adamw",
                          fp16=(dtype == jnp.bfloat16))
        model = KeypointRegressionNet(11, dtype=dtype)
        tx = build_optimizer(cfg, 100)
        state = create_train_state(model, tx, key, jnp.zeros((1, H, W, 3)))

        # model fwd+bwd+update only (no augs)
        import optax
        from speedplusbaseline_tpu.models.krn import krn_loss

        @jax.jit
        def bare_step(state, images, keypts):
            def loss_fn(p):
                (xc, yc), mut = model.apply(
                    {"params": p, "batch_stats": state.batch_stats}, images,
                    train=True, mutable=["batch_stats"])
                loss, sm = krn_loss(xc, yc, keypts)
                return loss, (sm, mut["batch_stats"])

            grads, (sm, bs) = jax.grad(loss_fn, has_aux=True)(state.params)
            upd, opt = tx.update(grads, state.opt_state, state.params)
            return state.replace(params=optax.apply_updates(state.params, upd),
                                 batch_stats=bs, opt_state=opt,
                                 step=state.step + 1), sm

        dt = timeit(lambda: bare_step(state, images, keypts)[1])
        print(f"[{name}] bare train step: {dt*1e3:7.2f} ms  "
              f"({B/dt:7.0f} img/s)")

        # augs alone
        dt = timeit(lambda: augment_batch(key, images, keypts))
        print(f"[{name}] augment_batch:   {dt*1e3:7.2f} ms")

        # ghiasi forward alone
        gh = Ghiasi(dtype=dtype)
        vg = gh.init({"params": key}, jnp.zeros((1, H, W, 3)), jnp.zeros((1, 100)))
        emb = jnp.zeros((B, 100))
        gfwd = jax.jit(lambda x: gh.apply(vg, x, emb))
        dt = timeit(lambda: gfwd(images))
        print(f"[{name}] ghiasi forward:  {dt*1e3:7.2f} ms")

        # full fused step, styleaug ratio=1 (always on) and 0.5
        for ratio in (1.0, 0.5):
            cfg2 = default_cfg(batch_size=B, input_shape=(H, W),
                               optimizer="adamw", randomize_texture=True,
                               texture_ratio=ratio,
                               fp16=(dtype == jnp.bfloat16))
            aug = StyleAugmentor(0.5, random_style_stats(0), dtype=dtype)
            sp = aug.init_params(jax.random.PRNGKey(1), (1, H, W, 3))
            step = make_krn_train_step(model, tx, cfg2, style_aug=aug)
            st = create_train_state(model, tx, key, jnp.zeros((1, H, W, 3)))

            def run(st):
                st, sm = step(st, {"image": images, "keypts": keypts}, key, sp)
                return st

            # keep threading state so bernoulli gate varies per step
            for _ in range(3):
                st = run(st)
            jax.block_until_ready(st.params)
            t0 = time.perf_counter()
            n = 20
            for _ in range(n):
                st = run(st)
            jax.block_until_ready(st.params)
            dt = (time.perf_counter() - t0) / n
            print(f"[{name}] full step r={ratio}: {dt*1e3:7.2f} ms  "
                  f"({B/dt:7.0f} img/s)")


if __name__ == "__main__":
    main()
