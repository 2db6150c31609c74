"""DANN domain-adaptation CLI — reference adapt.py: supervised source loss +
adversarial source/target domain loss through a gradient-reversed domain
classifier. KRN only (adapt.py:52)."""
from __future__ import annotations

import logging
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from speedplusbaseline_tpu.config import check_resume_compat, parse_cfg, save_cfg
from speedplusbaseline_tpu.data import make_dataloader
from speedplusbaseline_tpu.engine import (
    build_optimizer,
    create_train_state,
    make_dann_train_step,
    make_krn_eval_step,
)
from speedplusbaseline_tpu.engine.loops import run_validation, train_epoch
from speedplusbaseline_tpu.engine.optim import step_lr_schedule
from speedplusbaseline_tpu.engine.state import restore_train_state
from speedplusbaseline_tpu.io_utils import (
    SummaryWriter,
    checkpoint_exists,
    load_camera_intrinsics,
    load_tango_3d_keypoints,
    save_checkpoint,
    setup_logger,
)
from speedplusbaseline_tpu.io_utils.checkpoint import CKPT_NAME, load_checkpoint
from speedplusbaseline_tpu.models import get_model
from speedplusbaseline_tpu.parallel import batch_sharding, make_mesh

logger = logging.getLogger(__name__)


def main(cfg=None):
    cfg = cfg or parse_cfg()
    # DANN only implemented for KRN (adapt.py:52)
    assert cfg.dann and cfg.model_name == "krn"

    setup_logger("train")
    rng = jax.random.PRNGKey(cfg.seed)

    os.makedirs(cfg.savedir, exist_ok=True)
    logger.info("Checkpoints will be saved to %s", cfg.savedir)
    writer = SummaryWriter(cfg.logdir)
    if cfg.auto_resume and checkpoint_exists(cfg.savedir):
        check_resume_compat(cfg, cfg.savedir)
    save_cfg(cfg, cfg.savedir)

    mesh = make_mesh(cfg.num_devices, cfg.batch_size)
    sharding = batch_sharding(mesh)

    model = get_model(cfg)  # RevGrad

    # Three loaders (adapt.py:104-106): labeled source train, unlabeled
    # target train, labeled target test.
    source_loader = make_dataloader(cfg, is_train=True, is_source=True,
                                    load_labels=True, sharding=sharding)
    target_loader = make_dataloader(cfg, is_train=True, is_source=False,
                                    load_labels=False, sharding=sharding)
    test_loader = make_dataloader(cfg, is_train=False, is_source=False,
                                  sharding=sharding)

    steps_per_epoch = min(len(source_loader), len(target_loader))
    tx = build_optimizer(cfg, steps_per_epoch)
    state = create_train_state(model, tx, rng,
                               jnp.zeros((1, *cfg.input_shape, 3)), alpha=0.0)

    begin_epoch = 0
    best_perf = 0
    if cfg.auto_resume and checkpoint_exists(cfg.savedir):
        template = state.as_checkpoint_dict(0, cfg.model_name, 0)
        ckpt = load_checkpoint(osp.join(cfg.savedir, CKPT_NAME), template)
        state = restore_train_state(state, ckpt)
        begin_epoch = int(ckpt["epoch"])
        best_perf = begin_epoch

    corners3d = load_tango_3d_keypoints(cfg.keypts_3d_model)
    camera_matrix, dist_coeffs = load_camera_intrinsics(
        osp.join(cfg.dataroot, cfg.dataname, "camera.json"))

    train_step = make_dann_train_step(model, tx, cfg)
    eval_step = make_krn_eval_step(model, corners3d, camera_matrix, dist_coeffs)

    schedule = step_lr_schedule(cfg.lr, cfg.lr_decay_alpha, cfg.lr_decay_step,
                                steps_per_epoch)

    for epoch in range(begin_epoch, cfg.max_epochs):
        # GRL coefficient schedule (dann.py:77-78)
        def alpha_fn(idx, n_batches, _epoch=epoch):
            p = float(idx + _epoch * n_batches) / cfg.max_epochs / n_batches
            return 2.0 / (1.0 + np.exp(-10.0 * p)) - 1.0

        lr_value = float(schedule(int(state.step)))
        # Display/TB epoch is 1-based like train.py:167 and the reference
        # (trainer.py:102, dann.py:109 both print epoch+1).
        state = train_epoch(epoch + 1, cfg, state, train_step, None, rng, writer,
                            lr_value=lr_value,
                            dann_loaders=(source_loader, target_loader),
                            dann_alpha_fn=alpha_fn)

        if (epoch + 1) % cfg.test_epoch == 0 and cfg.test_epoch > 0:
            run_validation(epoch + 1, cfg, eval_step, state.params,
                           state.batch_stats, test_loader, writer)

        perf = epoch + 1
        is_best = perf > best_perf
        if is_best:
            best_perf = perf
        if (epoch + 1) % cfg.save_epoch == 0 or epoch + 1 == cfg.max_epochs:
            save_checkpoint(
                state.as_checkpoint_dict(epoch + 1, cfg.model_name, best_perf),
                is_best, cfg.savedir)

    writer.close()


if __name__ == "__main__":
    main()
