"""Evaluation CLI — reference test.py: load a checkpoint, run validation over
the test CSV, write averaged metrics to $logdir/$resultfn."""
from __future__ import annotations

import logging
import os
import os.path as osp

import jax
import jax.numpy as jnp

from speedplusbaseline_tpu.config import parse_cfg
from speedplusbaseline_tpu.data import make_dataloader
from speedplusbaseline_tpu.engine import (
    create_train_state,
    make_krn_eval_step,
    make_spn_eval_step,
)
from speedplusbaseline_tpu.engine.loops import run_validation
from speedplusbaseline_tpu.io_utils import (
    load_attitude_classes,
    load_camera_intrinsics,
    load_tango_3d_keypoints,
    setup_logger,
)
from speedplusbaseline_tpu.models import get_model
from speedplusbaseline_tpu.parallel import batch_sharding, make_mesh

logger = logging.getLogger(__name__)


def main(cfg=None):
    cfg = cfg or parse_cfg()
    setup_logger("test")
    os.makedirs(cfg.logdir, exist_ok=True)
    logger.info("Random seed value: %d", cfg.seed)

    mesh = make_mesh(cfg.num_devices, cfg.batch_size)
    sharding = batch_sharding(mesh)

    model = get_model(cfg)
    rng = jax.random.PRNGKey(cfg.seed)

    import optax

    state = create_train_state(model, optax.identity(), rng,
                               jnp.zeros((1, *cfg.input_shape, 3)))

    # Strict checkpoint load (test.py:60-62): accepts either a bare-variables
    # model_best.msgpack or a full checkpoint.msgpack. Like the reference's
    # strict torch.load, a --pretrained path that doesn't exist is a hard
    # failure — never silently evaluate random weights.
    if cfg.pretrained:
        if not osp.exists(cfg.pretrained):
            raise FileNotFoundError(
                f"--pretrained checkpoint not found: {cfg.pretrained}")
        from flax import serialization

        with open(cfg.pretrained, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        variables = raw.get("variables", raw)
        params = serialization.from_state_dict(state.params, variables["params"])
        batch_stats = serialization.from_state_dict(
            state.batch_stats, variables.get("batch_stats", {}))
        state = state.replace(params=params, batch_stats=batch_stats)
        logger.info("Model loaded from %s", cfg.pretrained)

    test_loader = make_dataloader(cfg, is_train=False, is_source=False,
                                  sharding=sharding)

    corners3d = load_tango_3d_keypoints(cfg.keypts_3d_model)
    camera_matrix, dist_coeffs = load_camera_intrinsics(
        osp.join(cfg.dataroot, cfg.dataname, "camera.json"))

    if cfg.model_name == "krn":
        eval_step = make_krn_eval_step(model, corners3d, camera_matrix, dist_coeffs)
    else:
        att_classes = load_attitude_classes(cfg.attitude_class)
        assert att_classes.shape[0] == cfg.num_classes, "Number of classes not matching."
        eval_step = make_spn_eval_step(model, att_classes, corners3d,
                                       camera_matrix, dist_coeffs,
                                       cfg.num_neighbors)

    performances = run_validation(0, cfg, eval_step, state.params,
                                  state.batch_stats, test_loader, None)

    # Averaged results file (test.py:79-88)
    try:
        writefn = osp.join(cfg.logdir, cfg.resultfn)
        with open(writefn, "w") as f:
            for metric, meter in performances.items():
                f.write(f"{metric}: {meter.avg:.5f} [{meter.unit}]\n")
        logger.info("Test results written to %s", writefn)
    except Exception:
        logger.info("WARNING! Failed to write test results to %s",
                    osp.join(cfg.logdir, cfg.resultfn))


if __name__ == "__main__":
    main()
