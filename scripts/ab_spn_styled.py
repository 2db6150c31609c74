"""A/B: styled SPN step — phase path at 228^2 vs plain lowering at 227^2.

VERDICT r3 weak #4: the styled SPN step (23.95 ms, BASELINE.md round-3
table) is the one measured perf line with no optimization attempt behind
it. SPN's 227^2 input is odd, so the production Ghiasi phase path
reflect-pads to 228^2 (models/ghiasi.py:234-248); the untested alternative
is the plain XLA lowering, which handles 227 natively (its conv arithmetic
emits 228 rows for odd inputs anyway, like the reference ghiasi.py).

Each arm runs in its own process (tunnel hygiene: 1-2 compiled programs per
process) with bench.py's fetch-synced chained-state protocol. Run both:

    python scripts/ab_spn_styled.py            # driver: runs both arms
    python scripts/ab_spn_styled.py --arm phase  # single arm (child)

Reference for the workload: src/core/trainer.py:68-69 (model-agnostic
styleAugmentor application), src/nets/spn.py:126-131 (227^2 recipe).
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
        make_spn_train_step,
    )
    from speedplusbaseline_tpu.io_utils.assets import default_assets_dir
    from speedplusbaseline_tpu.models import SpacecraftPoseNet

    B, shape = 48, (227, 227)
    cfg = default_cfg(batch_size=B, input_shape=shape, model_name="spn",
                      optimizer="adamw", lr=1e-3, weight_decay=0.01,
                      fp16=True)
    model = SpacecraftPoseNet(cfg.num_classes, dtype=jnp.bfloat16)
    tx = build_optimizer(cfg, steps_per_epoch=100)
    rng = jax.random.PRNGKey(0)

    try:
        stats = load_style_stats(default_assets_dir())
    except FileNotFoundError:
        stats = random_style_stats(0)
    # arm "phase": production routing (tpu_opt on non-CPU backends).
    # arm "plain": the plain XLA lowering at native 227 (Pallas IN gates
    # fall back on odd H/W by themselves).
    style_aug = StyleAugmentor(cfg.texture_alpha, stats, dtype=jnp.bfloat16,
                               tpu_opt=(arm == "phase"))
    style_params = style_aug.init_params(jax.random.PRNGKey(1), (1, *shape, 3))
    step = make_spn_train_step(model, tx, cfg, style_aug=style_aug)

    rs = np.random.RandomState(0)
    yc = rs.rand(B, cfg.num_classes).astype(np.float32)
    yw = rs.rand(B, cfg.num_classes).astype(np.float32)
    batch = {
        "image": jnp.asarray(rs.rand(B, *shape, 3).astype(np.float32)),
        "y_classes": jnp.asarray(yc / yc.sum(1, keepdims=True)),
        "y_weights": jnp.asarray(yw / yw.sum(1, keepdims=True)),
    }

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
    ap.add_argument("--arm", choices=["phase", "plain"])
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--retries", type=int, default=2)
    args = ap.parse_args()

    if args.arm:
        run_arm(args.arm)
        return

    results = {}
    for arm in ("phase", "plain"):
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
                break
            print(f"[{arm}] attempt {attempt} failed:\n{out.stdout[-2000:]}"
                  f"\n{out.stderr[-2000:]}", file=sys.stderr)
        else:
            raise SystemExit(f"arm {arm} failed after retries")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
