"""Checkpoint I/O — reference utils.py:109-135 layout, flax serialization.

File-per-run layout matching the reference:
  $savedir/checkpoint.msgpack    — full train state {epoch, model, state, ...}
  $savedir/model_best.msgpack    — bare model variables (strict-load eval path)

Uses flax.serialization msgpack (single-file, dependency-free, replicated
params). Orbax is intentionally not required: these models are MB-scale and
replicated across the DP mesh, so sharded async checkpointing buys nothing.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

logger = logging.getLogger(__name__)

CKPT_NAME = "checkpoint.msgpack"
BEST_NAME = "model_best.msgpack"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)


def save_checkpoint(state_dict: Dict[str, Any], is_best: bool, output_dir: str,
                    filename: str = CKPT_NAME) -> None:
    """state_dict: {'epoch', 'model', 'variables', 'opt_state', 'best_score'}."""
    os.makedirs(output_dir, exist_ok=True)
    # to_state_dict first: optax states are (named)tuples, which msgpack
    # can't encode directly; the state-dict form is pure nested dicts.
    payload = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(state_dict)))
    path = os.path.join(output_dir, filename)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)  # atomic: a crash never corrupts the resume file
    logger.info("Checkpoint saved to %s", path)

    if is_best and "variables" in state_dict:
        best = serialization.msgpack_serialize(
            serialization.to_state_dict(_to_host(state_dict["variables"])))
        best_path = os.path.join(output_dir, BEST_NAME)
        with open(best_path, "wb") as f:
            f.write(best)
        logger.info("Best model saved to %s", best_path)


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    """Restore a checkpoint dict; with ``template``, restores into the given
    pytree structure (strict, like the reference's strict=True load)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if template is not None:
        raw = serialization.from_state_dict(template, raw)
    logger.info("Checkpoint loaded from %s at epoch %s", path, raw.get("epoch", "?"))
    return raw


def checkpoint_exists(savedir: str) -> bool:
    return os.path.exists(os.path.join(savedir, CKPT_NAME))
