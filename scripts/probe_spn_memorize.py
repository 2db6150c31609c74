"""SPN single-batch memorization probe (diagnosis for VERDICT r3 missing #2).

The convergence run plateaued at loss_c ~8.32 (random ~ ln(5000)=8.52) after
27 epochs. Before blaming task difficulty, verify the training path can
OVERFIT one fixed batch: real dataset (runs/spn_conv), real SPNDataset crop,
real make_spn_train_step + build_optimizer. If loss collapses, the pipeline
learns and the full run needs schedule/steps; if it stays ~8.3, bisect.

Usage: python scripts/probe_spn_memorize.py [--steps N] [--n_batches B]
       [--lr L] [--optimizer adamw] [--no_clip] [train.py flags...]
Single TPU process, ONE compiled program (CLAUDE.md tunnel protocol).

Result (recorded): 1 batch collapses 8.52 -> 1.61 entropy floor in <100
steps (dropout active, rng folded per step) — the train path learns.
--n_batches 64 (= the whole 3072-image set, deterministic SPN crops,
held lr) answers whether the full-dataset plateau is schedule or task.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

import speedplusbaseline_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from speedplusbaseline_tpu.config import parse_cfg
from speedplusbaseline_tpu.data.csv_dataset import SPNDataset
from speedplusbaseline_tpu.engine import build_optimizer, create_train_state
from speedplusbaseline_tpu.engine.steps import make_spn_train_step
from speedplusbaseline_tpu.models import get_model


def main():
    argv = _sys.argv[1:]
    steps = 1500
    if "--steps" in argv:
        i = argv.index("--steps")
        steps = int(argv[i + 1])
        del argv[i:i + 2]
    n_batches = 1
    if "--n_batches" in argv:
        i = argv.index("--n_batches")
        n_batches = int(argv[i + 1])
        del argv[i:i + 2]
    no_clip = "--no_clip" in argv
    if no_clip:
        argv.remove("--no_clip")

    _sys.argv = [_sys.argv[0],
                 "--model_name", "spn", "--input_shape", "227", "227",
                 "--dataroot", "runs/spn_conv", "--train_csv", "train.csv",
                 "--cache_dir", "runs/spn_conv/cache",
                 "--lr_decay_step", "10000",  # hold lr flat for the probe
                 ] + argv
    cfg = parse_cfg()

    ds = SPNDataset(cfg, is_train=True, is_source=True)
    batches = []
    for b in range(n_batches):
        items = [ds[b * cfg.batch_size + i] for i in range(cfg.batch_size)]
        batches.append({k: jnp.asarray(np.stack([it[k] for it in items]))
                        for k in items[0]})
        if b % 8 == 0:
            print(f"loaded batch {b}/{n_batches}", flush=True)
    batch = batches[0]
    print("batch:", {k: (v.shape, str(v.dtype)) for k, v in batch.items()},
          flush=True)

    model = get_model(cfg)
    tx = build_optimizer(cfg, steps_per_epoch=10**9)
    if no_clip:
        import optax
        from speedplusbaseline_tpu.engine.optim import step_lr_schedule
        sched = step_lr_schedule(cfg.lr, 1.0, 1, 10**9)
        core = [optax.scale_by_adam(b1=cfg.momentum, b2=0.999, eps=1e-8),
                optax.add_decayed_weights(cfg.weight_decay)]
        tx = optax.chain(*core, optax.scale_by_learning_rate(sched))
    rng = jax.random.PRNGKey(cfg.seed)
    state = create_train_state(model, tx, rng,
                               jnp.zeros((1, *cfg.input_shape, 3)))
    step = make_spn_train_step(model, tx, cfg)

    t0 = time.time()
    win = []
    for i in range(steps):
        state, sm = step(state, batches[i % n_batches], rng)
        win.append(sm["loss_c"])
        if i % 100 == 99 or i == steps - 1:
            lc = float(sm["loss_c"])
            avg = float(np.mean([float(x) for x in win[-min(len(win), n_batches):]]))
            lr_ = float(sm["loss_r"])
            print(f"step {i:5d}  loss_c {lc:.4f} (cyc-avg {avg:.4f})  "
                  f"loss_r {lr_:.4f}  ({time.time()-t0:.1f}s)", flush=True)
            win = win[-n_batches:]
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
