"""Convergence proof: the full train -> EPnP -> SPEED-score loop OPTIMIZES.

The 1-epoch CLI smoke (test_cli.py) only proves the loop *runs*; this trains
KRN through scripts/convergence_run.run (the real train.py CLI path:
loaders, augs, jitted step, per-epoch batched-EPnP validation, checkpoints)
on the learnable fake dataset until the validation pose score drops. Loose
bounds — the definitive 224^2 TPU curve is recorded in BASELINE.md
(unseen-split eR ~100 deg -> median 1.9 deg; reference behavior:
train.py:125-158 driving inference.py:43-144).

Kept CPU-sized: 96^2 input, 96 images, evaluated ON THE TRAIN SPLIT
(memorization collapses orders of magnitude faster than generalization and
exercises exactly the same eval plumbing; the unseen-split generalization
curve is the BASELINE.md TPU run). The assertion is a RELATIVE collapse of
the SPEED score (raw), immune to the absolute floor set by the tiny
resolution.
"""
import json
import sys

import pytest


def test_needs_generate_tracks_num_classes(tmp_path):
    """Regeneration fires when the CSVs were stamped with a different
    --num_classes — including REVERTING to a previously-used count, where
    both the bin file and train.csv exist but the CSV class columns are
    stale (json2csv bakes the bins in)."""
    sys.path.insert(0, "scripts")
    from convergence_run import _needs_generate

    root = str(tmp_path)
    split_dir = tmp_path / "speedplus" / "synthetic" / "splits_spn"
    npy20 = str(tmp_path / "attitude_classes_20.npy")
    npy50 = str(tmp_path / "attitude_classes_50.npy")

    # Fresh root: no CSVs at all.
    assert _needs_generate(root, "spn", "", 0)

    split_dir.mkdir(parents=True)
    (split_dir / "train.csv").write_text("stub\n")

    # Pre-stamp root (no gen_meta.json): trusted only without class bins.
    assert not _needs_generate(root, "spn", "", 0)
    (tmp_path / "attitude_classes_20.npy").write_bytes(b"stub")
    assert _needs_generate(root, "spn", npy20, 20)

    # Stamped at 20: consistent request passes, different count regenerates
    # even though train.csv exists.
    (split_dir / "gen_meta.json").write_text(json.dumps({"num_classes": 20}))
    assert not _needs_generate(root, "spn", npy20, 20)
    assert _needs_generate(root, "spn", npy50, 50)

    # The silent-staleness case: root later stamped at 50, then the caller
    # REVERTS to 20 — bin file and train.csv both exist, CSVs are stale.
    (split_dir / "gen_meta.json").write_text(json.dumps({"num_classes": 50}))
    assert _needs_generate(root, "spn", npy20, 20)

    # Missing requested bin file always regenerates.
    assert _needs_generate(root, "spn", str(tmp_path / "absent.npy"), 7)


def test_mirror_assets_excludes_pretrained_backbone(tmp_path, monkeypatch):
    """The transfer A/B's purity rests on the scratch arm never seeing a
    pretrained backbone: the assets mirror must carry the shared assets
    (tango_points.npy etc.) but NEVER mobilenetv2_backbone.msgpack, even
    when one exists at the repo level (the documented convert workflow
    leaves one there)."""
    sys.path.insert(0, "scripts")
    import krn_transfer_run as ktr

    fake_repo_assets = tmp_path / "assets"
    fake_repo_assets.mkdir()
    (fake_repo_assets / "tango_points.npy").write_bytes(b"pts")
    (fake_repo_assets / "mobilenetv2_backbone.msgpack").write_bytes(b"bb")
    monkeypatch.setattr(ktr, "REPO", str(tmp_path))

    mirror = tmp_path / "scratch_assets"
    ktr._mirror_assets(str(mirror))
    names = sorted(p.name for p in mirror.iterdir())
    assert "tango_points.npy" in names
    assert "mobilenetv2_backbone.msgpack" not in names


@pytest.mark.slow
def test_krn_training_reduces_pose_error(tmp_path):
    sys.path.insert(0, "scripts")
    from convergence_run import run

    curve = run(str(tmp_path), n_train=96, epochs=16, input_hw=96,
                test_every=3,
                extra=["--lr_decay_step", "50", "--test_csv", "train.csv"])
    assert curve, "no validation records written"
    epochs = sorted(curve)
    speeds = [curve[e]["Valid/speed (raw) [-]"] for e in epochs]
    first, best = speeds[0], min(speeds[1:])
    # With random init the SPEED score starts ~O(2-4) (eR ~ 100 deg); a
    # working optimization loop more than halves it while memorizing 96
    # images for 16 epochs.
    assert best < 0.5 * first, (epochs, speeds)
    assert all(s > 0 for s in speeds)
