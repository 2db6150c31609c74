"""End-to-end FROM-DISK training throughput (VERDICT item 7).

Generates a fake SPEED+ dataset at native resolution (1920x1200 JPEGs),
builds the real config/loader/train-step stack (native fused decode+crop
loader, threaded prefetch), and times full epochs — host decode, batch
assembly, H2D transfer and the jitted TPU step together. Epoch 1 warms the
XLA compile and the page cache; epochs 2+ are reported.

On this 1-core container the host pipeline caps throughput near the
bench_host_loader.py per-worker rate (~30 img/s); the TPU step itself
sustains ~2400 img/s (bench.py), so the from-disk number here measures the
host, not the chip — see BASELINE.md for the scaling analysis.

Usage: python scripts/bench_e2e.py [num_images] [epochs] [cache|nocache|both] [root]
``cache`` builds the pre-decoded RoI cache (data/cache.py) first and feeds
the loader through --cache_dir — the shipped cure for the host bottleneck.
``root`` keeps the generated dataset across invocations (generation of the
native-res JPEGs takes minutes on a 1-core host; a remote-compile stall
shouldn't force a re-render).
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import tempfile
import time

import numpy as np

import speedplusbaseline_tpu  # noqa: F401


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mode = sys.argv[3] if len(sys.argv) > 3 else "both"
    root = sys.argv[4] if len(sys.argv) > 4 else ""

    import jax
    import jax.numpy as jnp

    from speedplusbaseline_tpu.config import default_cfg
    from speedplusbaseline_tpu.data import make_dataloader
    from speedplusbaseline_tpu.data.cache import build_cache
    from speedplusbaseline_tpu.engine import (
        build_optimizer,
        create_train_state,
        make_krn_train_step,
    )
    from speedplusbaseline_tpu.models import KeypointRegressionNet

    import contextlib
    if root:
        os.makedirs(root, exist_ok=True)
        ctx = contextlib.nullcontext(root)
    else:
        ctx = tempfile.TemporaryDirectory()
    with ctx as tmp:
        train_csv = os.path.join(tmp, "speedplus", "synthetic",
                                 "splits_krn", "train.csv")
        if not os.path.exists(train_csv):
            print(f"generating {n_images} native-res JPEGs...", flush=True)
            # Render in a CPU subprocess: the generator makes one tiny jax
            # call per image, which crawls/stalls through the axon remote
            # tunnel (CLAUDE.md TPU process hygiene).
            import subprocess
            gen = (
                "import sys\n"
                "from speedplusbaseline_tpu.data import generate_fake_speedplus\n"
                "from speedplusbaseline_tpu.data.preprocess import json2csv\n"
                "tmp, n = sys.argv[1], int(sys.argv[2])\n"
                "generate_fake_speedplus(tmp, num_train=n, num_test=4,\n"
                "                        width=1920, height=1200,\n"
                "                        domains=('synthetic',))\n"
                "json2csv(tmp, 'speedplus', 'synthetic', 'train.json',\n"
                "         'splits_krn/train.csv', model_name='krn')\n"
            )
            subprocess.run(
                [sys.executable, "-c", gen, tmp, str(n_images)], check=True,
                env=dict(os.environ, JAX_PLATFORMS="cpu"),
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

        cache_dir = ""
        cache_build_s = None
        if mode in ("cache", "both"):
            cache_dir = os.path.join(tmp, "roi_cache")
            manifest = os.path.join(cache_dir, "speedplus", "synthetic",
                                    "cache_manifest.csv")
            if not os.path.exists(manifest):
                t0 = time.perf_counter()
                build_cache(tmp, "speedplus", "synthetic", [train_csv],
                            cache_dir, cache_size=512)
                cache_build_s = time.perf_counter() - t0
                print(f"cache built in {cache_build_s:.1f}s (one-time)",
                      flush=True)

        def measure(cdir):
            cfg = default_cfg(
                dataroot=tmp, input_shape=(224, 224), batch_size=48,
                num_workers=max(2, os.cpu_count() or 2), optimizer="adamw",
                fp16=True, use_native_loader=True, cache_dir=cdir)
            loader = make_dataloader(cfg, is_train=True, is_source=True)
            model = KeypointRegressionNet(cfg.num_keypoints,
                                          dtype=jnp.bfloat16)
            tx = build_optimizer(cfg, len(loader))
            rng = jax.random.PRNGKey(0)
            state = create_train_state(model, tx, rng,
                                       jnp.zeros((1, 224, 224, 3)))
            step = make_krn_train_step(model, tx, cfg, style_aug=None)
            rates = []
            for epoch in range(epochs):
                loader.set_epoch(epoch)
                n = 0
                t0 = time.perf_counter()
                for batch in loader:
                    state, sm = step(state, batch, rng, None)
                    n += int(batch["image"].shape[0])
                jax.block_until_ready(
                    jax.tree_util.tree_leaves(state.params)[0])
                dt = time.perf_counter() - t0
                rates.append(n / dt)
                print(f"  epoch {epoch}: {n / dt:.1f} img/s "
                      f"({n} imgs in {dt:.1f}s)", flush=True)
            return max(rates[1:]) if len(rates) > 1 else rates[0]

        out = {"host_cores": os.cpu_count(),
               "num_workers": max(2, os.cpu_count() or 2)}
        if mode in ("nocache", "both"):
            print("from-disk, full-frame decode:", flush=True)
            out["e2e_from_disk_img_s"] = round(measure(""), 1)
        if mode in ("cache", "both"):
            print("from-disk, RoI cache:", flush=True)
            out["e2e_cached_img_s"] = round(measure(cache_dir), 1)
            if cache_build_s is not None:
                out["cache_build_s"] = round(cache_build_s, 1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
