"""Benchmark: KRN training throughput (images/sec/chip), styleaug enabled.

Prints ONE JSON line:
  {"metric": "krn_train_images_per_sec_per_chip", "value": N,
   "unit": "img/s", "vs_baseline": R}

Protocol (BASELINE.md): the reference publishes no numbers, so the baseline is
a derived estimate of the PyTorch reference on its documented hardware (RTX
2080 Ti, README.md:25) running the README KRN recipe (224x224, batch 48) with
styleaug at texture_ratio=0.5:
  - KRN fwd+bwd ~ 1.9 GFLOP/img, Ghiasi forward ~ 11.4 GFLOP/img applied to
    half the batches -> ~7.6 GFLOP/img effective
  - 2080 Ti sustained fp32 conv throughput ~4.5 TFLOP/s (13.4 peak x ~35%
    achievable on small-channel depthwise-heavy nets)
  => ~590 img/s upper bound, and the reference's Python DataLoader (8 PIL
     workers) + per-step host syncs cap measured throughput well below that.
  Baseline used: 450 img/s (optimistic toward the reference).

The measurement here times the full jitted train step (augs + bernoulli-gated
Ghiasi + fwd/bwd + optimizer update) with device-resident batches — the same
steady state the reference's pipelined DataLoader aims for.

Measured decomposition on TPU v5e (bf16, batch 48, 224^2; scripts/profile_one.py):
  bare KRN fwd+bwd+update   5.6 ms  (8592 img/s)
  on-device augmentations   1.8 ms
  Ghiasi forward           27.6 ms  (reflect-pad ~8 ms: XLA can't fold it
                                     into convs the way zero-pad folds)
  full step, styleaug @1.0 42.5 ms; @0.5 the host-side gate alternates
  styled/plain programs -> ~26 ms average -> ~1820 img/s/chip (4.0x).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_IMG_PER_SEC = 450.0
BATCH = 48
SHAPE = (224, 224)
WARMUP_STEPS = 5
MEASURE_STEPS = 30

# This machine's TPU compiles go through a remote-compile tunnel that
# occasionally stalls indefinitely. The top-level entry runs the actual
# benchmark in a child process with a timeout and retries, so one stalled
# compile doesn't swallow the whole bench run.
_CHILD_ENV_FLAG = "SPEEDPLUS_BENCH_CHILD"
_ATTEMPT_TIMEOUT_S = 900  # two fresh compiles (plain+styled phase path) can
                          # take ~7-8 min through the remote-compile tunnel
_ATTEMPTS = 3


def main():
    if os.environ.get(_CHILD_ENV_FLAG) != "1":
        env = dict(os.environ, **{_CHILD_ENV_FLAG: "1"})
        for attempt in range(_ATTEMPTS):
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)], env=env,
                    capture_output=True, text=True, timeout=_ATTEMPT_TIMEOUT_S)
            except subprocess.TimeoutExpired:
                print(f"bench attempt {attempt + 1} stalled (remote-compile "
                      f"tunnel); retrying", file=sys.stderr)
                time.sleep(30)
                continue
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(line)
                    return
            print(f"bench attempt {attempt + 1} failed:\n{out.stderr[-2000:]}",
                  file=sys.stderr)
            time.sleep(30)
        sys.exit(1)

    _bench()


def _bench():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speedplusbaseline_tpu.augment.styleaug import (
        StyleAugmentor,
        load_style_stats,
        random_style_stats,
    )
    from speedplusbaseline_tpu.config import default_cfg
    from speedplusbaseline_tpu.engine import (
        build_optimizer,
        create_train_state,
        make_krn_train_step,
    )
    from speedplusbaseline_tpu.io_utils.assets import default_assets_dir
    from speedplusbaseline_tpu.models import KeypointRegressionNet
    from speedplusbaseline_tpu.parallel import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )

    n_chips = len(jax.devices())
    cfg = default_cfg(batch_size=BATCH * n_chips, input_shape=SHAPE,
                      randomize_texture=True, texture_ratio=0.5,
                      optimizer="adamw", lr=1e-3, weight_decay=0.01,
                      fp16=True)  # bf16 compute — the TPU-native precision

    mesh = make_mesh()
    data_sh = batch_sharding(mesh)
    rep_sh = replicated_sharding(mesh)

    model = KeypointRegressionNet(cfg.num_keypoints, dtype=jnp.bfloat16)
    tx = build_optimizer(cfg, steps_per_epoch=100)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, tx, rng, jnp.zeros((1, *SHAPE, 3)))
    state = jax.device_put(state, rep_sh)

    try:
        stats = load_style_stats(default_assets_dir())
    except FileNotFoundError:
        stats = random_style_stats(0)
    style_aug = StyleAugmentor(cfg.texture_alpha, stats, dtype=jnp.bfloat16)
    style_params = jax.device_put(
        style_aug.init_params(jax.random.PRNGKey(1), (1, *SHAPE, 3)), rep_sh)

    step = make_krn_train_step(model, tx, cfg, style_aug=style_aug)

    rs = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rs.rand(cfg.batch_size, *SHAPE, 3).astype(np.float32), data_sh),
        "keypts": jax.device_put(
            rs.rand(cfg.batch_size, 2, cfg.num_keypoints).astype(np.float32),
            data_sh),
    }

    # Host-side bernoulli(texture_ratio) per batch, like the reference's
    # trainer loop — styled and unstyled steps are separate XLA programs.
    gate = np.random.RandomState(7)
    draw = lambda: style_params if gate.rand() < cfg.texture_ratio else None

    for _ in range(WARMUP_STEPS):
        state, sm = step(state, batch, rng, style_params)
    state, sm = step(state, batch, rng, None)  # compile the unstyled program
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, sm = step(state, batch, rng, draw())
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    imgs_per_sec = MEASURE_STEPS * cfg.batch_size / dt
    per_chip = imgs_per_sec / n_chips
    print(json.dumps({
        "metric": "krn_train_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "img/s",
        "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
