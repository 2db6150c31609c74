"""Supervised training CLI — reference train.py with the same flags/outputs.

Flow (reference train.py:49-158): seed, savedir/logdir setup, config.txt
snapshot, model + optional StyleAugmentor, optimizer + StepLR, auto-resume,
dataloaders, per-epoch train -> lr step -> optional validation -> checkpoint.

TPU-native differences: the epoch body is one jitted step (augs + styleaug +
fwd/bwd + update fused on device), the batch is sharded over a data-parallel
Mesh, and --use_fp16 selects bf16 compute (no GradScaler needed on TPU).
"""
from __future__ import annotations

import logging
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from speedplusbaseline_tpu.config import check_resume_compat, parse_cfg, save_cfg
from speedplusbaseline_tpu.augment import StyleAugmentor, load_style_stats
from speedplusbaseline_tpu.data import make_dataloader
from speedplusbaseline_tpu.engine import (
    build_optimizer,
    create_train_state,
    make_krn_eval_step,
    make_krn_train_step,
    make_spn_eval_step,
    make_spn_train_step,
)
from speedplusbaseline_tpu.engine.loops import run_validation, train_epoch
from speedplusbaseline_tpu.engine.optim import step_lr_schedule
from speedplusbaseline_tpu.engine.state import restore_train_state
from speedplusbaseline_tpu.io_utils import (
    SummaryWriter,
    checkpoint_exists,
    load_attitude_classes,
    load_camera_intrinsics,
    load_tango_3d_keypoints,
    save_checkpoint,
    setup_logger,
)
from speedplusbaseline_tpu.io_utils.assets import default_assets_dir
from speedplusbaseline_tpu.io_utils.checkpoint import CKPT_NAME, load_checkpoint
from speedplusbaseline_tpu.models import get_model
from speedplusbaseline_tpu.parallel import batch_sharding, make_mesh
from speedplusbaseline_tpu.parallel.mesh import maybe_initialize_distributed

logger = logging.getLogger(__name__)


def main(cfg=None):
    cfg = cfg or parse_cfg()
    maybe_initialize_distributed()
    setup_logger("train")
    logger.info("Random seed value: %d", cfg.seed)
    rng = jax.random.PRNGKey(cfg.seed)

    os.makedirs(cfg.savedir, exist_ok=True)
    logger.info("Checkpoints will be saved to %s", cfg.savedir)
    writer = SummaryWriter(cfg.logdir)
    logger.info("Logs will be saved to %s", cfg.logdir)
    if cfg.auto_resume and checkpoint_exists(cfg.savedir):
        check_resume_compat(cfg, cfg.savedir)
    save_cfg(cfg, cfg.savedir)

    mesh = make_mesh(cfg.num_devices, cfg.batch_size)
    sharding = batch_sharding(mesh)
    logger.info("Device mesh: %s", mesh)

    model = get_model(cfg)

    # Style augmentor (train.py:76-80)
    style_aug = None
    style_params = None
    if cfg.randomize_texture:
        try:
            stats = load_style_stats(default_assets_dir())
        except FileNotFoundError:
            from speedplusbaseline_tpu.augment.styleaug import random_style_stats

            logger.warning("Style embedding assets missing; using random stats")
            stats = random_style_stats(cfg.seed)
        dtype = jnp.bfloat16 if cfg.fp16 else jnp.float32
        style_aug = StyleAugmentor(cfg.texture_alpha, stats, dtype=dtype)
        style_params = style_aug.init_params(
            jax.random.PRNGKey(cfg.seed + 1),
            (1, *cfg.input_shape, 3))
        ghiasi_ckpt = osp.join(default_assets_dir(), "ghiasi_params.msgpack")
        if osp.exists(ghiasi_ckpt):
            from flax import serialization

            with open(ghiasi_ckpt, "rb") as f:
                style_params = serialization.from_bytes(style_params, f.read())
            logger.info("Ghiasi transformer weights loaded from %s", ghiasi_ckpt)
        else:
            logger.warning(
                "Ghiasi transformer weights not found (%s); using random init "
                "(the reference asset checkpoint_transformer.pth is absent — "
                "convert with scripts/convert_ghiasi.py)", ghiasi_ckpt)
        logger.info("Texture randomization enabled with alpha = %s", cfg.texture_alpha)
        logger.info("   - Randomization ratio: %.2f", cfg.texture_ratio)

    # Data
    train_loader = make_dataloader(cfg, is_train=True, is_source=True,
                                   sharding=sharding)
    test_loader = make_dataloader(cfg, is_train=False, is_source=False,
                                  sharding=sharding)
    steps_per_epoch = len(train_loader)

    # Optimizer + state
    tx = build_optimizer(cfg, steps_per_epoch)
    sample = jnp.zeros((1, *cfg.input_shape, 3))
    state = create_train_state(model, tx, rng, sample)
    from speedplusbaseline_tpu.models.build import log_parameters

    log_parameters(state.params)

    # Auto-resume (train.py:86-94)
    begin_epoch = 0
    best_perf = 0
    ckpt_path = osp.join(cfg.savedir, CKPT_NAME)
    if cfg.auto_resume and checkpoint_exists(cfg.savedir):
        template = state.as_checkpoint_dict(0, cfg.model_name, 0)
        ckpt = load_checkpoint(ckpt_path, template)
        state = restore_train_state(state, ckpt)
        begin_epoch = int(ckpt["epoch"])
        best_perf = begin_epoch

    # Pretrained init (reference park2019.py:107 / spn.py:101-123): load
    # converted weights when the assets exist (scripts/convert_*.py).
    if begin_epoch == 0:
        from speedplusbaseline_tpu.models.weight_convert import maybe_load_pretrained

        state = maybe_load_pretrained(cfg, state, default_assets_dir())

    if cfg.fp16:
        logger.info("bf16 compute enabled (TPU-native mixed precision)")

    # Eval assets
    corners3d = load_tango_3d_keypoints(cfg.keypts_3d_model)
    camera_json = osp.join(cfg.dataroot, cfg.dataname, "camera.json")
    camera_matrix, dist_coeffs = load_camera_intrinsics(camera_json)
    if cfg.model_name == "spn":
        att_classes = load_attitude_classes(cfg.attitude_class)
        assert att_classes.shape[0] == cfg.num_classes, "Number of classes not matching."

    # Steps
    if cfg.model_name == "krn":
        train_step = make_krn_train_step(model, tx, cfg, style_aug)
        eval_step = make_krn_eval_step(model, corners3d, camera_matrix, dist_coeffs)
    else:
        train_step = make_spn_train_step(model, tx, cfg, style_aug)
        eval_step = make_spn_eval_step(model, att_classes, corners3d,
                                       camera_matrix, dist_coeffs,
                                       cfg.num_neighbors)

    schedule = step_lr_schedule(cfg.lr, cfg.lr_decay_alpha, cfg.lr_decay_step,
                                steps_per_epoch)

    profiling = False
    for epoch in range(begin_epoch, cfg.max_epochs):
        if cfg.profile_dir and not profiling and epoch == begin_epoch + 1:
            jax.profiler.start_trace(cfg.profile_dir)
            profiling = True

        lr_value = float(schedule(int(state.step)))
        state = train_epoch(epoch + 1, cfg, state, train_step, train_loader,
                            rng, writer, style_params=style_params,
                            lr_value=lr_value)

        if (epoch + 1) % cfg.test_epoch == 0 and cfg.test_epoch > 0:
            run_validation(epoch + 1, cfg, eval_step, state.params,
                           state.batch_stats, test_loader, writer)

        # "Best" degenerates to latest, as in the reference (train.py:141-146).
        perf = epoch + 1
        is_best = perf > best_perf
        if is_best:
            best_perf = perf
        if (epoch + 1) % cfg.save_epoch == 0 or epoch + 1 == cfg.max_epochs:
            save_checkpoint(
                state.as_checkpoint_dict(epoch + 1, cfg.model_name, best_perf),
                is_best, cfg.savedir)

    if profiling:
        jax.profiler.stop_trace()
    writer.close()


if __name__ == "__main__":
    main()
