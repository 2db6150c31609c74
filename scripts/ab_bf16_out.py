"""A/B: bf16 vs f32 styled-image materialization (VERDICT r4 weak #3).

BASELINE.md's round-3 Ghiasi endgame attributes the residual ~12.8 ms phase
forward to "f32 output traffic + pad strips" — yet the sigmoid output was
still materialized in f32 (models/ghiasi.py l10 tails) and only cast to
bf16 afterwards in the train step (engine/steps.py). Storing it in the
model dtype at the source is bit-identical downstream (the cast just moves
into the generator, before the full-res depth-to-space shuffles) and halves
exactly the traffic named as the bottleneck. Ghiasi.f32_out=True restores
the old behavior; this script measures both on the styled KRN and SPN
train steps.

Each arm runs in its own process (tunnel hygiene) with bench.py's
fetch-synced chained-state protocol:

    python scripts/ab_bf16_out.py                  # driver: all four arms
    python scripts/ab_bf16_out.py --arm krn_bf16   # single arm (child)
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import subprocess
import sys

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def run_arm(arm: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import WARMUP_STEPS, _timed_chain
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
        make_spn_train_step,
    )
    from speedplusbaseline_tpu.io_utils.assets import default_assets_dir
    from speedplusbaseline_tpu.models import (
        KeypointRegressionNet,
        SpacecraftPoseNet,
    )

    workload, out_dtype = arm.split("_")
    f32_out = out_dtype == "f32"
    B = 48
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)

    try:
        stats = load_style_stats(default_assets_dir())
    except FileNotFoundError:
        stats = random_style_stats(0)

    if workload == "krn":
        shape = (224, 224)
        cfg = default_cfg(batch_size=B, input_shape=shape, optimizer="adamw",
                          lr=1e-3, weight_decay=0.01, fp16=True)
        model = KeypointRegressionNet(cfg.num_keypoints, dtype=jnp.bfloat16)
        tx = build_optimizer(cfg, steps_per_epoch=100)
        style_aug = StyleAugmentor(cfg.texture_alpha, stats,
                                   dtype=jnp.bfloat16, f32_out=f32_out)
        step = make_krn_train_step(model, tx, cfg, style_aug=style_aug)
        batch = {
            "image": jnp.asarray(rs.rand(B, *shape, 3).astype(np.float32)),
            "keypts": jnp.asarray(rs.rand(B, 2, 11).astype(np.float32)),
        }
    else:
        shape = (227, 227)
        cfg = default_cfg(batch_size=B, input_shape=shape, model_name="spn",
                          optimizer="adamw", lr=1e-3, weight_decay=0.01,
                          fp16=True)
        model = SpacecraftPoseNet(cfg.num_classes, dtype=jnp.bfloat16)
        tx = build_optimizer(cfg, steps_per_epoch=100)
        style_aug = StyleAugmentor(cfg.texture_alpha, stats,
                                   dtype=jnp.bfloat16, f32_out=f32_out)
        step = make_spn_train_step(model, tx, cfg, style_aug=style_aug)
        yc = rs.rand(B, cfg.num_classes).astype(np.float32)
        yw = rs.rand(B, cfg.num_classes).astype(np.float32)
        batch = {
            "image": jnp.asarray(rs.rand(B, *shape, 3).astype(np.float32)),
            "y_classes": jnp.asarray(yc / yc.sum(1, keepdims=True)),
            "y_weights": jnp.asarray(yw / yw.sum(1, keepdims=True)),
        }

    style_params = style_aug.init_params(jax.random.PRNGKey(1),
                                         (1, *shape, 3))
    grab = jax.jit(lambda x: x.ravel()[:1])
    holder = {"st": create_train_state(model, tx, rng,
                                       jnp.zeros((1, *shape, 3)))}

    def once():
        holder["st"], _ = step(holder["st"], batch, rng, style_params)

    def sync():
        np.array(grab(jax.tree_util.tree_leaves(holder["st"].params)[0]))

    for _ in range(WARMUP_STEPS):
        once()
    sync()
    per_step = _timed_chain(once, sync, n=150)
    print(json.dumps({"arm": arm, "styled_step_ms": round(per_step * 1e3, 2)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=["krn_bf16", "krn_f32",
                                      "spn_bf16", "spn_f32"])
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--retries", type=int, default=2)
    args = ap.parse_args()

    if args.arm:
        run_arm(args.arm)
        return

    results = {}
    for arm in ("krn_bf16", "krn_f32", "spn_bf16", "spn_f32"):
        for attempt in range(args.retries + 1):
            try:
                out = subprocess.run(
                    [sys.executable, __file__, "--arm", arm],
                    cwd=REPO, capture_output=True, text=True,
                    timeout=args.timeout)
            except subprocess.TimeoutExpired:
                print(f"[{arm}] attempt {attempt}: timeout (tunnel stall?), "
                      "retrying", file=sys.stderr)
                continue
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if out.returncode == 0 and line:
                results[arm] = json.loads(line[-1])
                print(results[arm], file=sys.stderr)
                break
            print(f"[{arm}] attempt {attempt} failed:\n{out.stdout[-2000:]}"
                  f"\n{out.stderr[-2000:]}", file=sys.stderr)
        else:
            raise SystemExit(f"arm {arm} failed after retries")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
