"""Optimizers + schedules with torch semantics parity (reference
src/nets/build.py:60-78, train.py:107-109, trainer.py clip calls).

Mappings (cfg.momentum doubles as the smoothing/beta1 knob, as in the
reference):
  sgd     -> L2-into-grad (torch weight_decay), momentum buffer, lr
  rmsprop -> L2-into-grad, square-avg decay=momentum, eps OUTSIDE sqrt
             (torch RMSprop), lr
  adam    -> L2-into-grad (torch Adam), adam(b1=momentum, b2=0.999), lr
  adamw   -> decoupled decay (torch AdamW: p -= lr*(update + wd*p))

Gradient clipping composes in front (reference clips after backward, before
step): global-norm 1.0 for KRN/DANN (trainer.py:97, dann.py:99), by-value 1.0
for SPN (trainer.py:184).

StepLR: lr(epoch) = lr * alpha^(epoch // step) (train.py:107-109) as an
optax schedule over optimizer steps with a static steps_per_epoch.
"""
from __future__ import annotations

import optax


def step_lr_schedule(base_lr: float, decay_alpha: float, decay_step: int,
                     steps_per_epoch: int):
    """torch StepLR(step_size=decay_step, gamma=decay_alpha) equivalent."""

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * (decay_alpha ** (epoch // max(decay_step, 1)))

    return schedule


def build_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = step_lr_schedule(cfg.lr, cfg.lr_decay_alpha, cfg.lr_decay_step,
                                steps_per_epoch)

    if cfg.model_name == "spn" and not cfg.dann:
        clip = optax.clip(1.0)  # clip_grad_value_ (trainer.py:184)
    else:
        clip = optax.clip_by_global_norm(1.0)  # clip_grad_norm_ (trainer.py:97)

    wd = cfg.weight_decay
    m = cfg.momentum

    if cfg.optimizer == "sgd":
        core = [optax.add_decayed_weights(wd), optax.trace(decay=m)]
    elif cfg.optimizer == "rmsprop":
        core = [optax.add_decayed_weights(wd),
                optax.scale_by_rms(decay=m, eps=1e-8, eps_in_sqrt=False)]
    elif cfg.optimizer == "adam":
        core = [optax.add_decayed_weights(wd),
                optax.scale_by_adam(b1=m, b2=0.999, eps=1e-8)]
    elif cfg.optimizer == "adamw":
        core = [optax.scale_by_adam(b1=m, b2=0.999, eps=1e-8),
                optax.add_decayed_weights(wd)]
    else:
        raise ValueError(f"unknown optimizer: {cfg.optimizer}")

    return optax.chain(clip, *core, optax.scale_by_learning_rate(schedule))
