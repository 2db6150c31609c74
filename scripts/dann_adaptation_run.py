"""DANN adaptation-effectiveness A/B on the styled fake dataset.

The round-3 convergence runs proved the supervised loop OPTIMIZES; this
script proves the DANN loop ADAPTS — the remaining training workflow with
TPU perf numbers (BASELINE.md) but no quality evidence. The real SPEED+
HIL imagery is absent from this environment, so the fake dataset now carries
its own source/target domain gap (data/synthetic.py DOMAIN_STYLES:
synthetic = gaussian blobs on dim noise, lightbox = ring markers on a bright
striped background with optical blur — low-level shifts the reference's
photometric augs, transforms.py:71-110, do not cover).

Two arms, both driven through the REAL CLI entry points as subprocesses and
both evaluated on the SAME labeled lightbox test split through the full
forward -> EPnP -> SPEED-score pipeline:

  A (source-only): train.py on synthetic, reference KRN recipe
     (README.md:78-87 — 224^2, batch 48, AdamW lr 1e-3).
  B (DANN):        adapt.py with synthetic labeled + lightbox unlabeled,
     reference DANN recipe (README.md:102-111 — batch 16, AdamW lr 1e-3,
     StepLR step 10 gamma 0.95; reference adapt.py:47-146, dann.py:38-117).

Success = arm B's target-domain eR/speed lands well below arm A's.

Usage: python scripts/dann_adaptation_run.py --root DIR [--n_src 768]
    [--n_tgt 768] [--epochs_src 150] [--epochs_dann 250] [--test_every 25]
    [--render_w 640] [--render_h 400]
With an explicit --root, dataset/cache/checkpoints persist and both arms
auto-resume, so a remote-compile stall costs one retry, not a restart
(arms are retried automatically up to --retries times).
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GEN = """
import sys
from speedplusbaseline_tpu.data import generate_fake_speedplus
from speedplusbaseline_tpu.data.preprocess import json2csv
from speedplusbaseline_tpu.data.cache import build_cache
import os.path as osp
root, n_src, n_tgt, w, h = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                            int(sys.argv[4]), int(sys.argv[5]))
cache_dir = sys.argv[6]
# Source domain: labeled train split (+ a small source val split, unused by
# the arms but handy for debugging). Target domain: one large test split —
# the reference reads {test_domain}/{test_csv} for BOTH the unlabeled DANN
# stream and the labeled eval (Park2019KRNDataset.py:52-66).
generate_fake_speedplus(root, num_train=n_src, num_test=48, width=w, height=h,
                        domains=("synthetic",))
generate_fake_speedplus(root, num_train=0, num_test=n_tgt, width=w, height=h,
                        domains=("lightbox",), seed=1)
json2csv(root, "speedplus", "synthetic", "train.json",
         "splits_krn/train.csv", model_name="krn")
json2csv(root, "speedplus", "synthetic", "test.json",
         "splits_krn/validation.csv", model_name="krn")
json2csv(root, "speedplus", "lightbox", "test.json",
         "splits_krn/test.csv", model_name="krn")
build_cache(root, "speedplus", "synthetic",
            [osp.join(root, "speedplus", "synthetic", "splits_krn", "train.csv")],
            cache_dir)
build_cache(root, "speedplus", "lightbox",
            [osp.join(root, "speedplus", "lightbox", "splits_krn", "test.csv")],
            cache_dir)
"""


def _generate(root, n_src, n_tgt, width, height, cache_dir):
    """Render + preprocess + cache in a CPU subprocess (the generator makes
    one tiny jax call per image — instant on CPU, stalls the axon tunnel)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-c", _GEN, root, str(n_src), str(n_tgt),
         str(width), str(height), cache_dir],
        check=True, env=env, cwd=REPO)


def _run_arm(script, args, retries, timeout_s, env=None):
    """Run a CLI arm as the sole TPU subprocess; auto-resume makes retries
    cheap after a remote-compile stall. ``env`` (default: inherit) lets a
    caller pin arm-specific variables like SPEEDPLUS_ASSETS_DIR."""
    cmd = [sys.executable, os.path.join(REPO, script)] + args
    for attempt in range(retries):
        try:
            subprocess.run(cmd, check=True, cwd=REPO, timeout=timeout_s,
                           env=env)
            return
        except subprocess.TimeoutExpired:
            print(f"[{script}] attempt {attempt + 1} timed out after "
                  f"{timeout_s}s; retrying from checkpoint", flush=True)
        except subprocess.CalledProcessError as e:
            print(f"[{script}] attempt {attempt + 1} failed "
                  f"(rc={e.returncode}); retrying from checkpoint", flush=True)
    raise RuntimeError(f"{script} did not finish in {retries} attempts")


def _curve(logdir):
    curve = {}
    with open(os.path.join(logdir, "scalars.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"].startswith("Valid/"):
                curve.setdefault(rec["step"], {})[rec["tag"]] = rec["value"]
    return curve


def run(root, n_src, n_tgt, epochs_src, epochs_dann, test_every,
        width, height, retries, timeout_s):
    cache_dir = os.path.join(root, "cache")
    if not os.path.exists(os.path.join(
            root, "speedplus", "lightbox", "splits_krn", "test.csv")):
        _generate(root, n_src, n_tgt, width, height, cache_dir)

    workers = str(max(2, os.cpu_count() or 2))
    common = [
        "--dataroot", root,
        "--input_shape", "224", "224",
        "--num_workers", workers,
        "--train_domain", "synthetic", "--train_csv", "train.csv",
        "--test_domain", "lightbox", "--test_csv", "test.csv",
        "--eval_batch_size", "48",
        "--optimizer", "adamw", "--lr", "1e-3", "--weight_decay", "0.01",
        "--test_epoch", str(test_every), "--save_epoch", str(test_every),
        "--cache_dir", cache_dir,
    ]
    # Arm A: reference supervised KRN recipe (README.md:78-87).
    _run_arm("train.py", common + [
        "--savedir", os.path.join(root, "save_src"),
        "--logdir", os.path.join(root, "log_src"),
        "--batch_size", "48", "--max_epochs", str(epochs_src),
    ], retries, timeout_s)
    # Arm B: reference DANN recipe (README.md:102-111).
    _run_arm("adapt.py", common + [
        "--savedir", os.path.join(root, "save_dann"),
        "--logdir", os.path.join(root, "log_dann"),
        "--perform_dann", "--batch_size", "16",
        "--max_epochs", str(epochs_dann),
        "--lr_decay_step", "10", "--lr_decay_alpha", "0.95",
    ], retries, timeout_s)

    return _curve(os.path.join(root, "log_src")), \
        _curve(os.path.join(root, "log_dann"))


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="")
    p.add_argument("--n_src", type=int, default=768)
    p.add_argument("--n_tgt", type=int, default=768)
    p.add_argument("--epochs_src", type=int, default=150)
    p.add_argument("--epochs_dann", type=int, default=250)
    p.add_argument("--test_every", type=int, default=25)
    p.add_argument("--render_w", type=int, default=640)
    p.add_argument("--render_h", type=int, default=400)
    p.add_argument("--retries", type=int, default=4)
    p.add_argument("--timeout_s", type=int, default=3600)
    args = p.parse_args()

    def _go(root):
        return run(root, args.n_src, args.n_tgt, args.epochs_src,
                   args.epochs_dann, args.test_every,
                   args.render_w, args.render_h, args.retries, args.timeout_s)

    if args.root:
        os.makedirs(args.root, exist_ok=True)
        src, dann = _go(args.root)
    else:
        with tempfile.TemporaryDirectory() as tmp:
            src, dann = _go(tmp)

    print("\n       target-domain (lightbox) validation")
    print("arm    epoch  eR[deg]   eT[m]    speed(raw)")
    for name, curve in (("src", src), ("dann", dann)):
        for ep in sorted(curve):
            c = curve[ep]
            print(f"{name:5s} {ep:5d}  "
                  f"{c.get('Valid/err_q [deg]', float('nan')):8.3f} "
                  f"{c.get('Valid/err_t [m]', float('nan')):8.4f} "
                  f"{c.get('Valid/speed (raw) [-]', float('nan')):10.5f}")
    if not src or not dann:
        sys.exit(f"[dann_ab] no validation scalars recorded (src: {len(src)} "
                 f"points, dann: {len(dann)}) — are --epochs_src/--epochs_dann "
                 f"smaller than --test_every ({args.test_every})?")
    a = src[max(src)]
    b = dann[max(dann)]
    print(json.dumps({
        "src_only_final_eR_deg": round(a.get("Valid/err_q [deg]", -1), 3),
        "src_only_final_speed": round(a.get("Valid/speed (raw) [-]", -1), 4),
        "dann_final_eR_deg": round(b.get("Valid/err_q [deg]", -1), 3),
        "dann_final_speed": round(b.get("Valid/speed (raw) [-]", -1), 4),
        "n_src": args.n_src, "n_tgt": args.n_tgt,
        "epochs_src": args.epochs_src, "epochs_dann": args.epochs_dann,
    }))


if __name__ == "__main__":
    main()
