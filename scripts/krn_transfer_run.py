"""KRN backbone-transfer proof: boot-vs-scratch on a reduced-data split.

The reference KRN's quality rests on ImageNet-pretrained MobileNetV2
features (/root/reference/src/nets/park2019.py:107, ``pretrained=True``) —
the one pretrained-init dependency without an in-environment leverage proof
(SPN's bvlc arc has one, BASELINE.md round-4). No egress means no ImageNet
weights, so the arc is reproduced the same way the SPN proof was:

  1. Donor: a KRN trained to convergence on a full synthetic split.
     If ``--donor`` (default runs/dann_ab/save_src/model_best.msgpack)
     does not exist, the harness trains one itself under ``{root}/donor``
     (768 images, reference recipe, different render seed than the A/B
     split) — the run is self-contained.
  2. scripts/dump_krn_backbone.py exports its ``base`` trunk in torchvision
     state-dict format; scripts/convert_torchvision_mobilenet.py converts it
     back exactly as it would a real torchvision .pth; maybe_load_pretrained
     picks it up via SPEEDPLUS_ASSETS_DIR — the REAL chain end-to-end.
  3. Both arms run the REAL train.py CLI on a small fresh split (default 96
     images — too few to train a 4.6M-param KRN from scratch) rendered with
     a DIFFERENT generator seed than the donor's data; eval on 48 unseen
     images through forward -> EPnP -> SPEED score every ``--test_every``.

Done = a boot-vs-scratch validation curve showing the transferred backbone
carries the leverage the reference gets from ImageNet init.

Usage: python scripts/krn_transfer_run.py --root runs/krn_boot
           [--donor runs/dann_ab/save_src/model_best.msgpack]
           [--n_train 96] [--epochs 120] [--test_every 10]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import subprocess
import sys

from scripts.dann_adaptation_run import _curve, _run_arm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GEN = """
import sys
import os.path as osp
from speedplusbaseline_tpu.data import generate_fake_speedplus
from speedplusbaseline_tpu.data.preprocess import json2csv
from speedplusbaseline_tpu.data.cache import build_cache
root, n_train, w, h = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
cache_dir = sys.argv[5]
seed = int(sys.argv[6])
generate_fake_speedplus(root, num_train=n_train, num_test=48, width=w,
                        height=h, domains=("synthetic",), seed=seed)
sp = "splits_krn"
json2csv(root, "speedplus", "synthetic", "train.json", sp + "/train.csv",
         model_name="krn")
json2csv(root, "speedplus", "synthetic", "test.json", sp + "/validation.csv",
         model_name="krn")
build_cache(root, "speedplus", "synthetic",
            [osp.join(root, "speedplus", "synthetic", sp, "train.csv"),
             osp.join(root, "speedplus", "synthetic", sp, "validation.csv")],
            cache_dir)
"""


def _mirror_assets(assets_dir: str) -> None:
    """SPEEDPLUS_ASSETS_DIR redirects ALL asset lookups (tango_points.npy
    etc.), so mirror the standard assets in — EXCEPT any pretrained
    backbone, which is exactly the variable under test: the boot arm gets
    only the donor's converted backbone, the scratch arm none."""
    import shutil

    os.makedirs(assets_dir, exist_ok=True)
    std = os.path.join(REPO, "assets")
    for fn in os.listdir(std):
        if fn == "mobilenetv2_backbone.msgpack":
            continue
        dst = os.path.join(assets_dir, fn)
        if not os.path.exists(dst):
            shutil.copy2(os.path.join(std, fn), dst)


def _prepare_assets(donor: str, assets_dir: str) -> None:
    """Donor msgpack -> torchvision .pth -> converted backbone msgpack, via
    the real dump + convert CLIs (CPU subprocesses; the donor file is pure
    host-side numpy either way). Always regenerated from the donor (seconds,
    deterministic) so a stale backbone from an earlier --donor can never
    shadow the requested one."""
    _mirror_assets(assets_dir)
    out = os.path.join(assets_dir, "mobilenetv2_backbone.msgpack")
    pth = os.path.join(assets_dir, "krn_backbone.pth")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "dump_krn_backbone.py"),
                    donor, pth], check=True, env=env, cwd=REPO)
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts",
                                 "convert_torchvision_mobilenet.py"),
                    "--src", pth, "--out", out],
                   check=True, env=env, cwd=REPO)


def _train_donor(root, width, height, retries, timeout_s, env=None):
    """Self-contained donor: 768-image synthetic split (default render seed,
    distinct from the A/B split's seed=7), reference KRN recipe
    (README.md:78-87), no mid-run validation. Returns the checkpoint path."""
    droot = os.path.join(root, "donor")
    cache_dir = os.path.join(droot, "cache")
    ckpt = os.path.join(droot, "save", "model_best.msgpack")
    if os.path.exists(ckpt):
        return ckpt
    if not os.path.exists(os.path.join(
            droot, "speedplus", "synthetic", "splits_krn", "train.csv")):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, "-c", _GEN, droot, "768",
             str(width), str(height), cache_dir, "0"],
            check=True, env=env, cwd=REPO)
    workers = str(max(2, os.cpu_count() or 2))
    _run_arm("train.py", [
        "--dataroot", droot,
        "--input_shape", "224", "224",
        "--num_workers", workers,
        "--train_domain", "synthetic", "--train_csv", "train.csv",
        "--test_domain", "synthetic", "--test_csv", "validation.csv",
        "--optimizer", "adamw", "--lr", "1e-3", "--weight_decay", "0.01",
        "--batch_size", "48", "--max_epochs", "120",
        "--save_epoch", "10",
        "--cache_dir", cache_dir,
        "--savedir", os.path.join(droot, "save"),
        "--logdir", os.path.join(droot, "log"),
    ], retries, timeout_s, env=env)
    return ckpt


def run(root, donor, n_train, epochs, test_every, width, height, retries,
        timeout_s):
    # Both the donor and arm A must see NO pretrained backbone — a repo-level
    # assets/mobilenetv2_backbone.msgpack or a leftover SPEEDPLUS_ASSETS_DIR
    # in the caller's environment would otherwise be silently loaded by
    # train.py's epoch-0 maybe_load_pretrained, collapsing the A/B.
    scratch_assets = os.path.join(root, "scratch_assets")
    _mirror_assets(scratch_assets)
    clean_env = dict(os.environ, SPEEDPLUS_ASSETS_DIR=scratch_assets)

    if not os.path.exists(donor):
        print(f"[krn_transfer] donor {donor} absent; training one under "
              f"{root}/donor", flush=True)
        donor = _train_donor(root, width, height, retries, timeout_s,
                             env=clean_env)

    cache_dir = os.path.join(root, "cache")
    if not os.path.exists(os.path.join(
            root, "speedplus", "synthetic", "splits_krn", "train.csv")):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, "-c", _GEN, root, str(n_train),
             str(width), str(height), cache_dir, "7"],
            check=True, env=env, cwd=REPO)

    assets_dir = os.path.join(root, "boot_assets")
    _prepare_assets(donor, assets_dir)

    workers = str(max(2, os.cpu_count() or 2))
    common = [
        "--dataroot", root,
        "--input_shape", "224", "224",
        "--num_workers", workers,
        "--train_domain", "synthetic", "--train_csv", "train.csv",
        "--test_domain", "synthetic", "--test_csv", "validation.csv",
        "--eval_batch_size", "48",
        "--optimizer", "adamw", "--lr", "1e-3", "--weight_decay", "0.01",
        "--test_epoch", str(test_every), "--save_epoch", str(test_every),
        "--cache_dir", cache_dir,
        "--batch_size", "48", "--max_epochs", str(epochs),
    ]
    # Arm A: random init (the reference recipe minus pretrained=True),
    # pinned to the backbone-free assets mirror.
    if not os.path.exists(os.path.join(root, "log_scratch", "done")):
        _run_arm("train.py", common + [
            "--savedir", os.path.join(root, "save_scratch"),
            "--logdir", os.path.join(root, "log_scratch"),
        ], retries, timeout_s, env=clean_env)
        open(os.path.join(root, "log_scratch", "done"), "w").close()
    # Arm B: donor backbone through maybe_load_pretrained (park2019.py:107
    # semantics — trunk pretrained, extras/head fresh).
    if not os.path.exists(os.path.join(root, "log_boot", "done")):
        _run_arm("train.py", common + [
            "--savedir", os.path.join(root, "save_boot"),
            "--logdir", os.path.join(root, "log_boot"),
        ], retries, timeout_s,
            env=dict(os.environ, SPEEDPLUS_ASSETS_DIR=assets_dir))
        open(os.path.join(root, "log_boot", "done"), "w").close()

    return _curve(os.path.join(root, "log_scratch")), \
        _curve(os.path.join(root, "log_boot"))


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--donor", type=str,
                   default=os.path.join(REPO, "runs", "dann_ab", "save_src",
                                        "model_best.msgpack"))
    p.add_argument("--n_train", type=int, default=96)
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--test_every", type=int, default=10)
    p.add_argument("--render_w", type=int, default=640)
    p.add_argument("--render_h", type=int, default=400)
    p.add_argument("--retries", type=int, default=4)
    p.add_argument("--timeout_s", type=int, default=3600)
    args = p.parse_args()

    os.makedirs(args.root, exist_ok=True)
    scratch, boot = run(args.root, args.donor, args.n_train, args.epochs,
                        args.test_every, args.render_w, args.render_h,
                        args.retries, args.timeout_s)

    print("\n       unseen-split validation (96-image training set)")
    print("arm      epoch  eR[deg]   eT[m]    speed(raw)")
    for name, curve in (("scratch", scratch), ("boot", boot)):
        for ep in sorted(curve):
            c = curve[ep]
            print(f"{name:8s} {ep:5d}  "
                  f"{c.get('Valid/err_q [deg]', float('nan')):8.3f} "
                  f"{c.get('Valid/err_t [m]', float('nan')):8.4f} "
                  f"{c.get('Valid/speed (raw) [-]', float('nan')):10.5f}")

    if not scratch or not boot:
        sys.exit(f"[krn_transfer] no validation scalars recorded (scratch: "
                 f"{len(scratch)} points, boot: {len(boot)}) — is --epochs "
                 f"({args.epochs}) smaller than --test_every "
                 f"({args.test_every})?")
    a = scratch[max(scratch)]
    b = boot[max(boot)]
    print(json.dumps({
        "scratch_final_eR_deg": round(a.get("Valid/err_q [deg]", -1), 3),
        "scratch_final_speed": round(a.get("Valid/speed (raw) [-]", -1), 4),
        "boot_final_eR_deg": round(b.get("Valid/err_q [deg]", -1), 3),
        "boot_final_speed": round(b.get("Valid/speed (raw) [-]", -1), 4),
        "n_train": args.n_train, "epochs": args.epochs,
    }))


if __name__ == "__main__":
    main()
