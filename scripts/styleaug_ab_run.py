"""Style-augmentation effectiveness A/B on the domain-gapped fake dataset.

The reference's texture randomization (README.md:20, trainer.py:68-69) exists
to improve synthetic->HIL generalization WITHOUT target-domain data — the
train-time-only counterpart of DANN. Round 4 shipped a behaviorally-testable
Ghiasi asset (assets/ghiasi_params.msgpack, an embedding-conditioned
photometric restyler — scripts/train_toy_ghiasi.py), which makes this A/B
meaningful: does --randomize_texture move target-domain pose error at all?

Arms (same reference KRN recipe README.md:78-87 — 224^2, batch 48, AdamW
lr 1e-3 — same data, both evaluated on the SAME labeled lightbox split
through the full forward -> EPnP -> SPEED-score path):

  A (source-only, no styleaug): reuses scripts/dann_adaptation_run.py's
     arm A when --root points at the same directory (save_src/log_src);
     trains it if absent.
  C (styleaug):  train.py --randomize_texture --texture_ratio 0.5.

Honesty note: the toy Ghiasi randomizes color/brightness/contrast, not
texture structure — with the real public checkpoint_transformer.pth
(convert_ghiasi.py) the same harness measures true texture randomization.
The result is recorded either way (BASELINE.md).

Usage: python scripts/styleaug_ab_run.py --root runs/dann_ab [--epochs 150]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import subprocess
import sys

from scripts.dann_adaptation_run import _curve, _generate, _run_arm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Photometric-only target split: source-style blob markers in the target
# domain's photometric environment (data/synthetic.py "blobs_bright") —
# the gap class style augmentation is designed for, as opposed to the
# structural ring-marker gap only target-data adaptation (DANN) can cross.
_GEN_PHOTO = """
import sys
from speedplusbaseline_tpu.data import generate_fake_speedplus
from speedplusbaseline_tpu.data.preprocess import json2csv
from speedplusbaseline_tpu.data.cache import build_cache
import os.path as osp
root, n, w, h = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
cache_dir = sys.argv[5]
generate_fake_speedplus(root, num_train=0, num_test=n, width=w, height=h,
                        domains=("sunlamp",), seed=2,
                        domain_styles={"sunlamp": "blobs_bright"})
json2csv(root, "speedplus", "sunlamp", "test.json",
         "splits_krn/test.csv", model_name="krn")
build_cache(root, "speedplus", "sunlamp",
            [osp.join(root, "speedplus", "sunlamp", "splits_krn", "test.csv")],
            cache_dir)
"""


def _eval_arm(root, tag, ckpt, retries, timeout_s):
    """Score one trained checkpoint on the photometric-gap sunlamp split
    through the real test.py CLI; returns the parsed results dict."""
    logdir = os.path.join(root, f"log_photo_{tag}")
    _run_arm("test.py", [
        "--dataroot", root,
        "--input_shape", "224", "224",
        "--test_domain", "sunlamp", "--test_csv", "test.csv",
        "--eval_batch_size", "48", "--batch_size", "48",
        "--cache_dir", os.path.join(root, "cache"),
        "--pretrained", ckpt,
        "--logdir", logdir, "--resultfn", "results.txt",
    ], retries, timeout_s)
    out = {}
    with open(os.path.join(logdir, "results.txt")) as f:
        for line in f:
            metric, rest = line.split(":", 1)
            out[metric.strip()] = float(rest.split("[")[0])
    return out


def photometric_eval(root, n_eval, width, height, retries, timeout_s):
    if not os.path.exists(os.path.join(
            root, "speedplus", "sunlamp", "splits_krn", "test.csv")):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, "-c", _GEN_PHOTO, root, str(n_eval),
             str(width), str(height), os.path.join(root, "cache")],
            check=True, env=env, cwd=REPO)
    src = _eval_arm(root, "src",
                    os.path.join(root, "save_src", "model_best.msgpack"),
                    retries, timeout_s)
    style = _eval_arm(root, "style",
                      os.path.join(root, "save_style", "model_best.msgpack"),
                      retries, timeout_s)
    return src, style


def run(root, n_src, n_tgt, epochs, test_every, width, height, retries,
        timeout_s):
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
        "--batch_size", "48", "--max_epochs", str(epochs),
    ]
    # Arm A: plain supervised (shared with the DANN A/B when roots match).
    if not os.path.exists(os.path.join(root, "log_src", "scalars.jsonl")):
        _run_arm("train.py", common + [
            "--savedir", os.path.join(root, "save_src"),
            "--logdir", os.path.join(root, "log_src"),
        ], retries, timeout_s)
    # Arm C: + style augmentation at the reference's default ratio/alpha.
    _run_arm("train.py", common + [
        "--savedir", os.path.join(root, "save_style"),
        "--logdir", os.path.join(root, "log_style"),
        "--randomize_texture", "--texture_ratio", "0.5",
    ], retries, timeout_s)

    return _curve(os.path.join(root, "log_src")), \
        _curve(os.path.join(root, "log_style"))


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--n_src", type=int, default=768)
    p.add_argument("--n_tgt", type=int, default=768)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--test_every", type=int, default=25)
    p.add_argument("--render_w", type=int, default=640)
    p.add_argument("--render_h", type=int, default=400)
    p.add_argument("--retries", type=int, default=4)
    p.add_argument("--timeout_s", type=int, default=3600)
    args = p.parse_args()

    os.makedirs(args.root, exist_ok=True)
    src, style = run(args.root, args.n_src, args.n_tgt, args.epochs,
                     args.test_every, args.render_w, args.render_h,
                     args.retries, args.timeout_s)

    print("\n       target-domain (lightbox) validation")
    print("arm    epoch  eR[deg]   eT[m]    speed(raw)")
    for name, curve in (("src", src), ("style", style)):
        for ep in sorted(curve):
            c = curve[ep]
            print(f"{name:5s} {ep:5d}  "
                  f"{c.get('Valid/err_q [deg]', float('nan')):8.3f} "
                  f"{c.get('Valid/err_t [m]', float('nan')):8.4f} "
                  f"{c.get('Valid/speed (raw) [-]', float('nan')):10.5f}")
    # Photometric-only gap: evaluate both trained checkpoints on the
    # blobs_bright sunlamp split (no retraining — test.py CLI).
    photo_src, photo_style = photometric_eval(
        args.root, 192, args.render_w, args.render_h,
        args.retries, args.timeout_s)
    print("\n       photometric-gap (sunlamp blobs_bright) test")
    print(f"src    eR {photo_src.get('eR', -1):8.3f}  "
          f"speed {photo_src.get('speed (raw)', -1):8.4f}")
    print(f"style  eR {photo_style.get('eR', -1):8.3f}  "
          f"speed {photo_style.get('speed (raw)', -1):8.4f}")

    a = src[max(src)]
    c = style[max(style)]
    print(json.dumps({
        "src_only_final_eR_deg": round(a.get("Valid/err_q [deg]", -1), 3),
        "src_only_final_speed": round(a.get("Valid/speed (raw) [-]", -1), 4),
        "styleaug_final_eR_deg": round(c.get("Valid/err_q [deg]", -1), 3),
        "styleaug_final_speed": round(c.get("Valid/speed (raw) [-]", -1), 4),
        "photo_src_eR_deg": photo_src.get("eR", -1),
        "photo_style_eR_deg": photo_style.get("eR", -1),
        "photo_src_speed": photo_src.get("speed (raw)", -1),
        "photo_style_speed": photo_style.get("speed (raw)", -1),
        "epochs": args.epochs,
    }))


if __name__ == "__main__":
    main()
