"""Functional train state (params + batch_stats + optimizer state)."""
from __future__ import annotations

from typing import Any


import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    def as_checkpoint_dict(self, epoch: int, model_name: str, best_score):
        """Reference checkpoint payload shape (utils.py:109-119)."""
        return {
            "epoch": epoch,
            "model": model_name,
            "variables": {"params": self.params, "batch_stats": self.batch_stats},
            "opt_state": self.opt_state,
            "step": self.step,
            "best_score": best_score,
        }


def create_train_state(model, tx: optax.GradientTransformation, rng,
                       sample_input, **apply_kwargs) -> TrainState:
    variables = model.init({"params": rng}, sample_input, train=False,
                           **apply_kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def restore_train_state(state: TrainState, ckpt: dict) -> TrainState:
    """Load a checkpoint dict (from io_utils.checkpoint) into a live state.

    Accepts either raw state-dict form (nested dicts from msgpack) or a
    checkpoint already restored into live pytrees by
    ``load_checkpoint(path, template)`` — the opt_state of the latter is a
    tuple, which must not be run through from_state_dict again.
    """
    from flax import serialization

    def maybe_restore(target, value):
        if isinstance(value, dict) and not isinstance(target, dict):
            return serialization.from_state_dict(target, value)
        return value

    variables = ckpt["variables"]
    params = serialization.from_state_dict(state.params, variables["params"])
    batch_stats = serialization.from_state_dict(
        state.batch_stats, variables.get("batch_stats", {}))
    opt_state = maybe_restore(state.opt_state, ckpt["opt_state"])
    step = jnp.asarray(ckpt.get("step", 0), jnp.int32)
    return state.replace(params=params, batch_stats=batch_stats,
                         opt_state=opt_state, step=step)
