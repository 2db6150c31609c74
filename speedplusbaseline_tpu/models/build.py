"""Model factory — reference src/nets/build.py:39-58.

Returns the flax module; parameter init happens in the engine (functionally,
with an explicit PRNG key). Pretrained weights load via weight_convert when
the corresponding asset files exist (torchvision mobilenet_v2 /
bvlc_alexnet.npy are absent from this environment; the architecture trains
from scratch otherwise).
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from .krn import KeypointRegressionNet
from .revgrad import RevGrad
from .spn import SpacecraftPoseNet

logger = logging.getLogger(__name__)


def get_model(cfg):
    assert cfg.model_name in ("krn", "spn"), "Model name must be either krn or spn"

    dtype = jnp.bfloat16 if cfg.fp16 else jnp.float32

    if not cfg.dann:
        if cfg.model_name == "krn":
            model = KeypointRegressionNet(cfg.num_keypoints, dtype=dtype)
            logger.info("KRN created")
        else:
            model = SpacecraftPoseNet(cfg.num_classes, dtype=dtype)
            logger.info("SPN created")
    else:
        model = RevGrad(cfg.num_keypoints, dtype=dtype)
        logger.info("RevGrad created with %s", cfg.model_name)
    return model


def num_parameters(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def log_parameters(params) -> None:
    n = num_parameters(params)
    logger.info("   - Number of total parameters:     %s", f"{n:,}")
    logger.info("   - Number of trainable parameters: %s", f"{n:,}")
