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
steady state the reference's pipelined DataLoader aims for. ALL device
timings use the fetch-synced chained-state protocol (_timed_chain /
CLAUDE.md): block_until_ready alone returns early through this machine's
axon tunnel and has produced 4x-low step times.

Measured decomposition on TPU v5e (bf16, batch 48, 224^2; fetch-synced
protocol, CLAUDE.md; full tables in BASELINE.md):
  bare KRN step (augs+fwd/bwd+adamw)  ~12.2 ms
  Ghiasi forward (phase-space path)   ~12.8 ms  (plain lowering: 27.7)
  plain step 13.4 ms / styled step 26.4 ms; @texture_ratio 0.5 the
  host-side gate alternates programs -> ~2440 img/s/chip (~5.4x).
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

# This machine's TPU compiles go through a remote-compile tunnel that
# occasionally stalls indefinitely. The top-level entry runs the actual
# benchmark in a child process with a timeout and retries, so one stalled
# compile doesn't swallow the whole bench run.
_CHILD_ENV_FLAG = "SPEEDPLUS_BENCH_CHILD"
_ATTEMPT_TIMEOUT_S = 900  # two fresh compiles (plain+styled phase path) can
                          # take ~7-8 min through the remote-compile tunnel
_ATTEMPTS = 3


def _timed_chain(step_once, sync, n):
    """Fetch-synced chained-step timing (CLAUDE.md protocol): per-step =
    (t(n) - t(1)) / (n - 1), where each t(.) ends with a 1-element device
    fetch. ``jax.block_until_ready`` alone is NOT sufficient through this
    machine's axon tunnel — it returns early for some programs (measured:
    a 15 ms DANN step reported as 3.8, a 0.8 ms SPN step as 0.18); an
    actual np.array fetch of a jitted slice drains the serial device queue.
    ``step_once`` must advance a data-dependent state chain; ``sync`` must
    fetch >=1 element of that state to the host."""
    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            step_once()
        sync()
        return time.perf_counter() - t0

    run(1)  # settle the dispatch path
    t1 = run(1)
    tn = run(n)
    return (tn - t1) / (n - 1)


def _run_child(mode, attempts=_ATTEMPTS, timeout_s=_ATTEMPT_TIMEOUT_S):
    """Run one TPU measurement in a child process (timeout+retry against
    remote-compile stalls). Returns the parsed JSON dict or None."""
    env = dict(os.environ, **{_CHILD_ENV_FLAG: mode})
    for attempt in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=timeout_s)
        except subprocess.TimeoutExpired:
            print(f"bench[{mode}] attempt {attempt + 1} stalled "
                  f"(remote-compile tunnel); retrying", file=sys.stderr)
            time.sleep(30)
            continue
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        print(f"bench[{mode}] attempt {attempt + 1} failed:\n"
              f"{out.stderr[-2000:]}", file=sys.stderr)
        time.sleep(30)
    return None


def main():
    mode = os.environ.get(_CHILD_ENV_FLAG)
    if mode == "1":
        _bench()
        return
    if mode == "eval":
        _bench_eval()
        return
    if mode == "dann":
        _bench_dann()
        return
    if mode == "spn":
        _bench_spn()
        return

    result = _run_child("1")
    if result is None:
        sys.exit(1)
    # Secondary metrics — best-effort, omitted on failure. Each TPU
    # measurement runs in its own child (the remote-compile tunnel is more
    # reliable with few programs per process); the host pipeline is CPU-only.
    ev = _run_child("eval", attempts=2)
    if ev:
        result.update(ev)
    dann = _run_child("dann", attempts=2)
    if dann:
        result.update(dann)
    spn = _run_child("spn", attempts=2)
    if spn:
        result.update(spn)
    hl = _host_loader_rates()
    if hl:
        result.update(hl)
    print(json.dumps(result))


def _host_loader_rates(n_images: int = 48, passes: int = 3):
    """Per-worker host decode+crop rates on synthetic SPEED+-sized JPEGs
    (scripts/bench_host_loader.py is the full version).

    Stability protocol (VERDICT r3 weak #1 — a single pass on this shared
    1-core container once reported rates ~2x off BASELINE.md and inverted
    the native-vs-python ordering): one discarded warmup pass, then the
    MEDIAN of ``passes`` timed passes per path, plus the min-max spread so
    a noisy run is visible in the artifact. ``host_native_lt_python`` flags
    the inverted-expectation case explicitly."""
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "bench_host_loader",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "bench_host_loader.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        import statistics
        import tempfile

        import numpy as np
        rs = np.random.RandomState(3)
        with tempfile.TemporaryDirectory() as tmp:
            img_dir = os.path.join(tmp, "speedplus", "synthetic", "images")
            os.makedirs(img_dir, exist_ok=True)
            paths = m.make_jpegs(img_dir, n_images)
            boxes = m.rand_boxes(rs, n_images)

            def median_rate(fn):
                fn()  # warmup pass (page cache, allocator, lazy imports)
                vals = [fn() for _ in range(passes)]
                if any(v is None for v in vals):
                    return None, None
                return statistics.median(vals), (min(vals), max(vals))

            native, native_mm = median_rate(
                lambda: m.bench_native(paths, boxes))
            python, python_mm = median_rate(
                lambda: m.bench_python(paths, boxes))
            cached, cached_mm = median_rate(
                lambda: m.bench_python_cached(tmp, paths, boxes))
        # Build the spread dict skipping None entries BEFORE unpacking:
        # when a path is unavailable (e.g. the native .so isn't built)
        # median_rate returns (None, None) and a tuple-unpacking
        # comprehension would raise, dropping the whole host section.
        spread = {}
        for k, mm in (("native", native_mm), ("python", python_mm),
                      ("cached", cached_mm)):
            if mm is not None and mm[0] is not None:
                spread[k] = [round(mm[0], 1), round(mm[1], 1)]
        out = {
            "host_native_img_s_per_worker":
                round(native, 1) if native is not None else None,
            "host_python_img_s_per_worker":
                round(python, 1) if python is not None else None,
            "host_cached_img_s_per_worker":
                round(cached, 1) if cached is not None else None,
            "host_rate_spread": spread,
            "host_cores": os.cpu_count(),
        }
        if native is not None and native < python:
            out["host_native_lt_python"] = True  # inverted expectation:
            # treat this run's host fields as container noise, see spread
        return out
    except Exception as e:  # pragma: no cover - best effort
        print(f"host-loader bench skipped: {e}", file=sys.stderr)
        return None


def _bench_eval():
    """TPU eval-path throughput: KRN forward + batched on-device EPnP +
    SPEED scoring (engine/steps.py make_krn_eval_step) — the path the
    reference runs per-image on the host through OpenCV
    (src/core/inference.py:63-110)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speedplusbaseline_tpu.config import default_cfg
    from speedplusbaseline_tpu.engine import (
        create_train_state,
        make_krn_eval_step,
    )
    from speedplusbaseline_tpu.models import KeypointRegressionNet

    cfg = default_cfg(batch_size=BATCH, input_shape=SHAPE)
    model = KeypointRegressionNet(cfg.num_keypoints, dtype=jnp.bfloat16)
    import optax
    state = create_train_state(model, optax.identity(), jax.random.PRNGKey(0),
                               jnp.zeros((1, *SHAPE, 3)))

    fx = fy = 0.0176 / 5.86e-6
    K = np.array([[fx, 0, 960.0], [0, fy, 600.0], [0, 0, 1.0]])
    dist = np.array([-0.2238, 0.5141, -6.65e-4, -2.14e-4, -0.1312])
    rs = np.random.RandomState(7)
    pts = rs.uniform(-0.4, 0.4, size=(11, 3))
    ev = make_krn_eval_step(model, pts, K, dist)

    batch = {
        "image": jnp.asarray(rs.rand(BATCH, *SHAPE, 3).astype(np.float32)),
        "bbox": jnp.asarray(np.tile([700.0, 1300, 400, 900], (BATCH, 1))
                            .astype(np.float32)),
        "q_gt": jnp.asarray(np.tile([1.0, 0, 0, 0], (BATCH, 1))
                            .astype(np.float32)),
        "t_gt": jnp.asarray(np.tile([0.0, 0, 8.0], (BATCH, 1))
                            .astype(np.float32)),
    }
    out = ev(state.params, state.batch_stats, batch)
    jax.block_until_ready(out)
    grab = jax.jit(lambda o: o["t_pr"].ravel()[0])
    _ = np.array(grab(out))

    # Fetch-synced protocol (see CLAUDE.md): per-call = (t(N)-t(1))/(N-1).
    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = ev(state.params, state.batch_stats, batch)
        _ = np.array(grab(o))
        return time.perf_counter() - t0

    run(1)
    t1 = run(1)
    n = 100
    tn = run(n)
    per = (tn - t1) / (n - 1)
    print(json.dumps({
        "eval_img_s_per_chip": round(BATCH / per, 1),
        "eval_step_ms": round(per * 1e3, 2),
    }))


def _bench_dann():
    """DANN adaptation step throughput — the reference's heaviest documented
    workflow (README.md:102-111: batch 16, 750 epochs; adapt.py:47-146).
    One joint backward through the source pose loss + both gradient-reversed
    domain heads (engine/steps.py make_dann_train_step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speedplusbaseline_tpu.config import default_cfg
    from speedplusbaseline_tpu.engine import (
        build_optimizer,
        create_train_state,
        make_dann_train_step,
    )
    from speedplusbaseline_tpu.models import RevGrad

    B = 16  # reference DANN recipe batch (README.md:107)
    cfg = default_cfg(batch_size=B, input_shape=SHAPE, optimizer="adamw",
                      lr=1e-3, weight_decay=0.01, fp16=True)
    model = RevGrad(cfg.num_keypoints, dtype=jnp.bfloat16)
    tx = build_optimizer(cfg, steps_per_epoch=100)
    rng = jax.random.PRNGKey(0)
    # alpha=0.0 at init traces the GRL domain-classifier branch so its
    # params exist (same as adapt.py:69-70).
    state = create_train_state(model, tx, rng, jnp.zeros((1, *SHAPE, 3)),
                               alpha=0.0)
    step = make_dann_train_step(model, tx, cfg)

    rs = np.random.RandomState(0)
    source = {
        "image": jnp.asarray(rs.rand(B, *SHAPE, 3).astype(np.float32)),
        "keypts": jnp.asarray(rs.rand(B, 2, cfg.num_keypoints)
                              .astype(np.float32)),
    }
    target = {"image": jnp.asarray(rs.rand(B, *SHAPE, 3).astype(np.float32))}
    alpha = np.float32(0.5)

    holder = {"state": state}
    grab = jax.jit(lambda x: x.ravel()[:1])

    def once():
        holder["state"], _ = step(holder["state"], source, target, rng, alpha)

    def sync():
        np.array(grab(jax.tree_util.tree_leaves(holder["state"].params)[0]))

    for _ in range(WARMUP_STEPS):
        once()
    sync()
    per_step = _timed_chain(once, sync, n=150)
    # Images processed per step: B source + B target (both run the backbone).
    print(json.dumps({
        "dann_img_s_per_chip": round(2 * B / per_step, 1),
        "dann_step_ms": round(per_step * 1e3, 2),
    }))


def _bench_spn():
    """SPN supervised step throughput at the reference's 227x227 recipe
    (src/nets/spn.py:126-131), plain and styled (trainer.py:68-69 applies
    the styleAugmentor model-agnostically). 227 is odd: the styled step
    exercises the phase path's reflect-pad-to-multiple-of-4 routing
    (227 -> 228, the same output contract as the reference Ghiasi)."""
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
        make_spn_train_step,
    )
    from speedplusbaseline_tpu.io_utils.assets import default_assets_dir
    from speedplusbaseline_tpu.models import SpacecraftPoseNet

    B = BATCH
    shape = (227, 227)
    cfg = default_cfg(batch_size=B, input_shape=shape, model_name="spn",
                      optimizer="adamw", lr=1e-3, weight_decay=0.01,
                      fp16=True)
    model = SpacecraftPoseNet(cfg.num_classes, dtype=jnp.bfloat16)
    tx = build_optimizer(cfg, steps_per_epoch=100)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, tx, rng, jnp.zeros((1, *shape, 3)))

    try:
        stats = load_style_stats(default_assets_dir())
    except FileNotFoundError:
        stats = random_style_stats(0)
    style_aug = StyleAugmentor(cfg.texture_alpha, stats, dtype=jnp.bfloat16)
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

    def timed(sp):
        holder = {"st": create_train_state(model, tx, rng,
                                           jnp.zeros((1, *shape, 3)))}

        def once():
            holder["st"], _ = step(holder["st"], batch, rng, sp)

        def sync():
            np.array(grab(jax.tree_util.tree_leaves(holder["st"].params)[0]))

        for _ in range(WARMUP_STEPS):
            once()
        sync()
        # plain SPN is sub-ms: large n amortizes the +-40 ms t(1) jitter
        return _timed_chain(once, sync, n=300)

    plain = timed(None)
    styled = timed(style_params)
    # texture_ratio 0.5 workload: half plain, half styled steps
    avg = 0.5 * (plain + styled)
    print(json.dumps({
        "spn_img_s_per_chip": round(B / avg, 1),
        "spn_plain_step_ms": round(plain * 1e3, 2),
        "spn_styled_step_ms": round(styled * 1e3, 2),
    }))


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

    holder = {"state": state}
    grab = jax.jit(lambda x: x.ravel()[:1])

    def once():
        holder["state"], _ = step(holder["state"], batch, rng, draw())

    def sync():
        np.array(grab(jax.tree_util.tree_leaves(holder["state"].params)[0]))

    for _ in range(WARMUP_STEPS):
        holder["state"], _ = step(holder["state"], batch, rng, style_params)
    holder["state"], _ = step(holder["state"], batch, rng, None)  # compile
    sync()                                           # the unstyled program

    per_step = _timed_chain(once, sync, n=150)
    imgs_per_sec = cfg.batch_size / per_step
    per_chip = imgs_per_sec / n_chips
    print(json.dumps({
        "metric": "krn_train_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "img/s",
        "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC, 2),
        # The reference publishes no throughput numbers and no GPU exists
        # here to measure one: 450 img/s is the derived estimate in this
        # file's docstring (optimistic toward the reference). Every
        # vs_baseline multiple inherits its error bars.
        "baseline_is_estimate": True,
        "baseline_img_per_sec": BASELINE_IMG_PER_SEC,
    }))


if __name__ == "__main__":
    main()
