"""Time ONE variant of the KRN train step on the TPU (single compile per
process — the remote-compile tunnel is more reliable with few programs).

Usage: python scripts/profile_one.py {bare|augs|ghiasi|full1|full05} [f32]
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
    variant = sys.argv[1]
    dtype = jnp.float32 if (len(sys.argv) > 2 and sys.argv[2] == "f32") else jnp.bfloat16

    from speedplusbaseline_tpu.augment.photometric import augment_batch
    from speedplusbaseline_tpu.augment.styleaug import StyleAugmentor, random_style_stats
    from speedplusbaseline_tpu.config import default_cfg
    from speedplusbaseline_tpu.engine import (
        build_optimizer,
        create_train_state,
        make_krn_train_step,
    )
    from speedplusbaseline_tpu.models import Ghiasi, KeypointRegressionNet

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(B, H, W, 3).astype(np.float32))
    keypts = jnp.asarray(rs.rand(B, 2, 11).astype(np.float32))
    key = jax.random.PRNGKey(0)

    if variant in ("ghiasi_padconcat", "ghiasi_padgather"):
        import speedplusbaseline_tpu.models.ghiasi as gmod
        if variant == "ghiasi_padconcat":
            def rp(x, pad):
                if pad == 0:
                    return x
                x = jnp.concatenate(
                    [x[:, pad:0:-1], x, x[:, -2:-2 - pad:-1]], axis=1)
                x = jnp.concatenate(
                    [x[:, :, pad:0:-1], x, x[:, :, -2:-2 - pad:-1]], axis=2)
                return x
        else:
            def rp(x, pad):
                if pad == 0:
                    return x
                h, w = x.shape[1], x.shape[2]
                ih = np.concatenate([np.arange(pad, 0, -1),
                                     np.arange(h),
                                     np.arange(h - 2, h - 2 - pad, -1)])
                iw = np.concatenate([np.arange(pad, 0, -1),
                                     np.arange(w),
                                     np.arange(w - 2, w - 2 - pad, -1)])
                return x[:, ih][:, :, iw]
        gmod.reflect_pad = rp
        gh = gmod.Ghiasi(dtype=dtype)
        vg = gh.init({"params": key}, jnp.zeros((1, H, W, 3)), jnp.zeros((1, 100)))
        emb = jnp.zeros((B, 100))
        fn = jax.jit(lambda: gh.apply(vg, images, emb))
    elif variant in ("ghiasi_nopad", "ghiasi_noin"):
        import speedplusbaseline_tpu.models.ghiasi as gmod
        if variant == "ghiasi_nopad":
            gmod.reflect_pad = lambda x, pad: jnp.pad(
                x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        else:
            import speedplusbaseline_tpu.ops.instancenorm as inorm
            orig = inorm.instance_norm_film
            gmod.instance_norm_film = lambda x, g=None, b=None, **kw: x
        gh = gmod.Ghiasi(dtype=dtype)
        vg = gh.init({"params": key}, jnp.zeros((1, H, W, 3)), jnp.zeros((1, 100)))
        emb = jnp.zeros((B, 100))
        fn = jax.jit(lambda: gh.apply(vg, images, emb))
    elif variant == "ghiasi_pallas":
        gh = Ghiasi(dtype=dtype, use_pallas=True)
        vg = gh.init({"params": key}, jnp.zeros((1, H, W, 3)), jnp.zeros((1, 100)))
        emb = jnp.zeros((B, 100))
        fn = jax.jit(lambda: gh.apply(vg, images, emb))
    elif variant == "augs":
        fn = jax.jit(lambda: augment_batch(key, images, keypts))
    elif variant in ("krn_fwd", "krn_fwd_train", "krn_fwdbwd"):
        model = KeypointRegressionNet(11, dtype=dtype)
        cfgf = default_cfg(batch_size=B, input_shape=(H, W))
        from speedplusbaseline_tpu.engine import create_train_state as _cts
        import optax as _optax
        st = _cts(model, _optax.identity(), key, jnp.zeros((1, H, W, 3)))
        variables = {"params": st.params, "batch_stats": st.batch_stats}
        if variant == "krn_fwd":
            fn = jax.jit(lambda: model.apply(variables, images, train=False))
        elif variant == "krn_fwd_train":
            fn = jax.jit(lambda: model.apply(
                variables, images, train=True, mutable=["batch_stats"]))
        else:
            from speedplusbaseline_tpu.models.krn import krn_loss

            def loss_fn(params):
                (xc, yc), mut = model.apply(
                    {"params": params, "batch_stats": st.batch_stats},
                    images, train=True, mutable=["batch_stats"])
                loss, _ = krn_loss(xc, yc, keypts)
                return loss
            fn = jax.jit(lambda: jax.grad(loss_fn)(st.params))
    elif variant == "krn_fwdbwd_frozenbn":
        # DIAGNOSTIC ONLY (not parity): grads through eval-mode BN, to
        # quantify what train-mode batch statistics cost in the backward.
        model = KeypointRegressionNet(11, dtype=dtype)
        from speedplusbaseline_tpu.engine import create_train_state as _cts
        from speedplusbaseline_tpu.models.krn import krn_loss
        import optax as _optax
        st = _cts(model, _optax.identity(), key, jnp.zeros((1, H, W, 3)))

        def loss_fn(params):
            xc, yc = model.apply(
                {"params": params, "batch_stats": st.batch_stats},
                images, train=False)
            loss, _ = krn_loss(xc, yc, keypts)
            return loss
        fn = jax.jit(lambda: jax.grad(loss_fn)(st.params))
    elif variant == "ghiasi":
        gh = Ghiasi(dtype=dtype)
        vg = gh.init({"params": key}, jnp.zeros((1, H, W, 3)), jnp.zeros((1, 100)))
        emb = jnp.zeros((B, 100))
        fn = jax.jit(lambda: gh.apply(vg, images, emb))
    else:
        ratio = {"bare": 0.0, "full1": 1.0, "full05": 0.5,
                 "noaug_full1": 1.0, "bare_augs": 0.0}[variant]
        cfg = default_cfg(batch_size=B, input_shape=(H, W), optimizer="adamw",
                          randomize_texture=(ratio > 0), texture_ratio=ratio,
                          fp16=(dtype == jnp.bfloat16))
        model = KeypointRegressionNet(11, dtype=dtype)
        tx = build_optimizer(cfg, 100)
        state = create_train_state(model, tx, key, jnp.zeros((1, H, W, 3)))
        style_aug = None
        sp = None
        if ratio > 0:
            style_aug = StyleAugmentor(0.5, random_style_stats(0), dtype=dtype)
            sp = style_aug.init_params(jax.random.PRNGKey(1), (1, H, W, 3))
        if variant == "noaug_full1":
            # disable the photometric/geometric augs inside the step
            import speedplusbaseline_tpu.engine.steps as steps_mod
            steps_mod.augment_sample = lambda key, img, kp, p=0.5: (img, kp)
        if variant == "bare_augs":
            cfg = default_cfg(batch_size=B, input_shape=(H, W),
                              optimizer="adamw", fp16=(dtype == jnp.bfloat16))
        step = make_krn_train_step(model, tx, cfg, style_aug=style_aug)
        batch = {"image": images, "keypts": keypts}
        holder = {"state": state}

        gate = np.random.RandomState(7)

        def fn():
            use_sp = sp if (ratio >= 1.0 or (sp is not None and gate.rand() < ratio)) else None
            holder["state"], sm = step(holder["state"], batch, key, use_sp)
            return sm

    # Fetch-synced protocol (CLAUDE.md): block_until_ready is unreliable
    # through the tunnel; end each timed run with a 1-element host fetch of
    # the last output (device execution is serial, so it syncs the queue).
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    leaf = lambda o: jax.tree_util.tree_leaves(o)[0]
    grab = jax.jit(lambda o: leaf(o).ravel()[0])
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
    n = 100
    tn = run(n)
    dt = (tn - t1) / (n - 1)
    name = "bf16" if dtype == jnp.bfloat16 else "f32"
    print(f"[{name}] {variant}: {dt*1e3:.2f} ms  ({B/dt:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
