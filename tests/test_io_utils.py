"""io_utils tests: meters format, summary sinks, visualize, misc."""
import json
import os

import numpy as np

from speedplusbaseline_tpu.io_utils import AverageMeter, SummaryWriter
from speedplusbaseline_tpu.io_utils.misc import compute_mean_std, set_all_seeds
from speedplusbaseline_tpu.io_utils.visualize import (
    imshow,
    plot_2D_bbox,
    scatter_keypoints,
)


class TestAverageMeter:
    def test_running_average(self):
        m = AverageMeter("ms")
        m.update(10.0, 2)
        m.update(20.0, 2)
        assert m.val == 20.0 and m.avg == 15.0 and m.unit == "ms"

    def test_reset(self):
        m = AverageMeter()
        m.update(5.0)
        m.reset()
        assert m.avg == 0 and m.count == 0


class TestSummaryWriter:
    def test_jsonl_mirror(self, tmp_path):
        w = SummaryWriter(str(tmp_path))
        w.add_scalar("train/loss_x", 1.5, 3)
        w.add_scalar("Valid/err_q [deg]", 0.2, 3)
        w.close()
        lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
        assert lines[0]["tag"] == "train/loss_x"
        assert lines[0]["value"] == 1.5 and lines[0]["step"] == 3


class TestVisualize:
    def test_figures_render_headless(self, rng):
        img = rng.rand(32, 32, 3).astype(np.float32)
        fig = imshow(img)
        assert fig is not None
        fig = plot_2D_bbox(img, [4, 20, 6, 28])
        assert fig is not None
        fig = scatter_keypoints(img, rng.rand(11), rng.rand(11), normalized=True)
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close("all")


class TestMisc:
    def test_set_all_seeds_returns_key(self):
        key = set_all_seeds(123)
        import jax

        k2 = jax.random.PRNGKey(123)
        np.testing.assert_array_equal(np.asarray(key), np.asarray(k2))

    def test_compute_mean_std(self):
        batches = [{"image": np.full((2, 4, 4, 3), 0.5, np.float32)},
                   {"image": np.full((2, 4, 4, 3), 0.7, np.float32)}]
        mu, std = compute_mean_std(batches)
        np.testing.assert_allclose(mu, [0.6, 0.6, 0.6], atol=1e-6)
        np.testing.assert_allclose(std, 0.0, atol=1e-6)


class TestResumeCompat:
    """check_resume_compat fails fast on structural flag changes (the raw
    failure is an opaque flax from_state_dict error deep in optax state)."""

    def _write_snapshot(self, tmp_path, **overrides):
        from speedplusbaseline_tpu.config import default_cfg, save_cfg

        save_cfg(default_cfg(**overrides), str(tmp_path))

    def test_matching_config_passes(self, tmp_path):
        from speedplusbaseline_tpu.config import check_resume_compat, default_cfg

        self._write_snapshot(tmp_path, optimizer="adamw")
        check_resume_compat(default_cfg(optimizer="adamw"), str(tmp_path))

    def test_optimizer_change_raises(self, tmp_path):
        import pytest

        from speedplusbaseline_tpu.config import check_resume_compat, default_cfg

        self._write_snapshot(tmp_path, optimizer="adamw")
        with pytest.raises(ValueError, match="optimizer.*adamw"):
            check_resume_compat(default_cfg(optimizer="rmsprop"), str(tmp_path))

    def test_model_and_shape_changes_raise(self, tmp_path):
        import pytest

        from speedplusbaseline_tpu.config import check_resume_compat, default_cfg

        self._write_snapshot(tmp_path, model_name="spn", input_shape=(227, 227))
        with pytest.raises(ValueError, match="model_name"):
            check_resume_compat(
                default_cfg(model_name="krn", input_shape=(224, 224)),
                str(tmp_path))

    def test_non_structural_change_passes(self, tmp_path):
        from speedplusbaseline_tpu.config import check_resume_compat, default_cfg

        self._write_snapshot(tmp_path, lr=1e-3, max_epochs=30)
        # lr / epochs / batch size may legitimately change across resumes.
        check_resume_compat(default_cfg(lr=5e-4, max_epochs=60, batch_size=16),
                            str(tmp_path))

    def test_missing_snapshot_passes(self, tmp_path):
        from speedplusbaseline_tpu.config import check_resume_compat, default_cfg

        check_resume_compat(default_cfg(), str(tmp_path))
