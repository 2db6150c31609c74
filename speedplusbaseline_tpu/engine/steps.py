"""Jitted train/eval steps — the TPU-native replacement for the reference's
per-batch Python loops (src/core/trainer.py, dann.py, inference.py).

Everything that touches pixels after the host crop happens inside ONE jit:
photometric/geometric augs, the bernoulli-gated style transfer, the model
forward/backward, clipping, the optimizer update — and on the eval side the
forward pass, EPnP pose recovery and SPEED scoring. Under a data-parallel
mesh the global batch arrives sharded on axis 0 and GSPMD inserts the ICI
collectives (gradient all-reduce, global BatchNorm statistics).
"""
from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import optax

from ..augment.photometric import augment_sample
from ..geometry.epnp import keypoints_to_pose
from ..geometry.quaternion import weighted_mean_quaternion
from ..geometry.spn_position import compute_position_spn_batched
from ..metrics.pose_score import speed_score_batched
from ..models.krn import krn_loss
from ..models.revgrad import bce_with_logits
from ..models.spn import spn_loss


def _images_to_float(images):
    """The loader ships uint8 pixels (4x less H2D/DCN traffic than f32 —
    minimizing host->device transfer is a first-order TPU concern); the
    [0,1] normalization the reference does on the host (transforms.py:192-196
    ToTensor) happens here on-device. Float inputs (device-resident benches,
    tests) pass through unchanged."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) * (1.0 / 255.0)
    return images


def _apply_train(model, params, batch_stats, *args, rngs=None, **kwargs):
    """model.apply in train mode with mutable batch stats."""
    variables = {"params": params}
    has_bn = bool(batch_stats)
    if has_bn:
        variables["batch_stats"] = batch_stats
    out = model.apply(variables, *args, train=True,
                      mutable=["batch_stats"] if has_bn else False,
                      rngs=rngs, **kwargs)
    if has_bn:
        out, mutated = out
        return out, mutated["batch_stats"]
    return out, batch_stats


def make_krn_train_step(model, tx, cfg, style_aug=None):
    """KRN supervised step (trainer.py:41-112 semantics, fully fused).

    Returns fn(state, batch, rng, style_params) -> (state, metrics).
    Passing ``style_params=None`` runs the plain program; passing params runs
    the style-randomized one. The per-batch bernoulli(texture_ratio) draw
    lives on the HOST (engine/loops.py), exactly like the reference's
    ``random.random() < cfg.texture_ratio`` (trainer.py:68) — each outcome is
    its own specialized XLA program with no in-graph conditional.
    """

    def _body(state, batch, rng, style_params, styled: bool):
        rng = jax.random.fold_in(rng, state.step)
        aug_key, style_key = jax.random.split(rng)

        images, keypts = _images_to_float(batch["image"]), batch["keypts"]
        # Per-sample geometric+photometric augs (transforms.py:198-211).
        keys = jax.random.split(aug_key, images.shape[0])
        images, keypts = jax.vmap(
            functools.partial(augment_sample, p=0.5))(keys, images, keypts)

        if styled:
            images = style_aug(style_params, style_key, images).astype(
                images.dtype)

        def loss_fn(params):
            (xc, yc), new_bs = _apply_train(model, params, state.batch_stats,
                                            images)
            loss, sm = krn_loss(xc, yc, keypts)
            return loss, (sm, new_bs)

        grads, (sm, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, sm

    plain = jax.jit(functools.partial(_body, style_params=None, styled=False),
                    donate_argnums=(0,))
    styled = jax.jit(functools.partial(_body, styled=True),
                     donate_argnums=(0,)) if style_aug is not None else None

    def train_step(state, batch, rng, style_params=None):
        if style_params is None or styled is None:
            return plain(state, batch, rng)
        return styled(state, batch, rng, style_params)

    return train_step


def make_spn_train_step(model, tx, cfg, style_aug=None):
    """SPN supervised step (trainer.py:114-199): soft-label CE on both heads,
    loss_class + 10*loss_regress, clip-by-value (in tx). Style gating is
    host-side, as in make_krn_train_step."""

    def _body(state, batch, rng, style_params, styled: bool):
        rng = jax.random.fold_in(rng, state.step)
        style_key, dropout_key = jax.random.split(rng)

        images = _images_to_float(batch["image"])
        if styled:
            images = style_aug(style_params, style_key, images).astype(
                images.dtype)

        def loss_fn(params):
            (classes, weights), new_bs = _apply_train(
                model, params, state.batch_stats, images,
                rngs={"dropout": dropout_key})
            loss, sm = spn_loss(classes, weights,
                                batch["y_classes"], batch["y_weights"])
            return loss, (sm, new_bs)

        grads, (sm, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, sm

    plain = jax.jit(functools.partial(_body, style_params=None, styled=False),
                    donate_argnums=(0,))
    styled = jax.jit(functools.partial(_body, styled=True),
                     donate_argnums=(0,)) if style_aug is not None else None

    def train_step(state, batch, rng, style_params=None):
        if style_params is None or styled is None:
            return plain(state, batch, rng)
        return styled(state, batch, rng, style_params)

    return train_step


def make_dann_train_step(model, tx, cfg):
    """DANN step (dann.py:38-117): one joint backward through the source pose
    loss + both gradient-reversed domain BCE losses. ``alpha`` (the GRL
    schedule coefficient, dann.py:77-78) is a traced scalar input so the
    step compiles once."""

    def train_step(state, source_batch, target_batch, rng, alpha):
        rng = jax.random.fold_in(rng, state.step)
        src_key, tgt_key = jax.random.split(rng)

        src_images = _images_to_float(source_batch["image"])
        keypts = source_batch["keypts"]
        keys = jax.random.split(src_key, src_images.shape[0])
        src_images, keypts = jax.vmap(
            functools.partial(augment_sample, p=0.5))(keys, src_images, keypts)

        # The reference builds the unlabeled target loader with is_train=True
        # (build.py:45-53), so the same Rotate/Flip/BC/Noise stack runs on
        # target images too — with dummy zero keypoints, exactly like
        # Park2019KRNDataset.py:92-98 feeds zeros through the remapping.
        tgt_images = _images_to_float(target_batch["image"])
        tgt_keys = jax.random.split(tgt_key, tgt_images.shape[0])
        dummy_kp = jnp.zeros((tgt_images.shape[0], 2, keypts.shape[-1]),
                             keypts.dtype)
        tgt_images, _ = jax.vmap(
            functools.partial(augment_sample, p=0.5))(tgt_keys, tgt_images,
                                                      dummy_kp)

        B_src = src_images.shape[0]
        B_tgt = tgt_images.shape[0]

        def loss_fn(params):
            ((xc, yc), dom_src), bs1 = _apply_train(
                model, params, state.batch_stats, src_images, alpha=alpha)
            loss_pose, sm = krn_loss(xc, yc, keypts)
            loss_dom_src = bce_with_logits(dom_src, jnp.ones((B_src,)))

            (_, dom_tgt), bs2 = _apply_train(
                model, params, bs1, tgt_images, alpha=alpha)
            loss_dom_tgt = bce_with_logits(dom_tgt, jnp.zeros((B_tgt,)))

            loss = loss_pose + loss_dom_src + loss_dom_tgt
            aux = {
                "loss_pose": loss_pose,
                "loss_source": loss_dom_src,
                "loss_target": loss_dom_tgt,
            }
            return loss, (aux, bs2)

        grads, (aux, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, aux

    return jax.jit(train_step, donate_argnums=(0,))


def make_krn_eval_step(model, corners3d, camera_matrix, dist_coeffs):
    """KRN eval (inference.py:43-144): forward -> denormalize by RoI -> EPnP
    -> SPEED scores, all on-device and batched (the reference does this
    per-image on the host through OpenCV)."""
    corners3d = jnp.asarray(corners3d, jnp.float32)
    camera_matrix = jnp.asarray(camera_matrix, jnp.float32)
    dist_coeffs = jnp.asarray(dist_coeffs, jnp.float32)

    def eval_step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        xc, yc = model.apply(variables, _images_to_float(batch["image"]),
                             train=False)
        q_pr, t_pr = keypoints_to_pose(xc, yc, batch["bbox"], corners3d,
                                       camera_matrix, dist_coeffs)
        m = speed_score_batched(t_pr, q_pr, batch["t_gt"], batch["q_gt"])
        return {"q_pr": q_pr, "t_pr": t_pr, **m}

    return jax.jit(eval_step)


def make_spn_eval_step(model, q_class, corners3d, camera_matrix, dist_coeffs,
                       num_neighbors: int):
    """SPN eval (inference.py:146-225): top-k over the weight head, softmax,
    weighted quaternion mean over class quaternions, Gauss-Newton position."""
    q_class = jnp.asarray(q_class, jnp.float32)
    corners3d = jnp.asarray(corners3d, jnp.float32)
    camera_matrix = jnp.asarray(camera_matrix, jnp.float32)
    dist_coeffs = jnp.asarray(dist_coeffs, jnp.float32)

    def eval_step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        _, weights = model.apply(variables, _images_to_float(batch["image"]),
                                 train=False)
        top_w, top_c = jax.lax.top_k(weights, num_neighbors)
        top_w = jax.nn.softmax(top_w, axis=1)
        qs = q_class[top_c]  # (B, k, 4)
        q_pr = jax.vmap(weighted_mean_quaternion)(qs, top_w)
        t_pr = compute_position_spn_batched(q_pr, batch["bbox"], corners3d,
                                            camera_matrix, dist_coeffs)
        m = speed_score_batched(t_pr, q_pr, batch["t_gt"], batch["q_gt"])
        return {"q_pr": q_pr, "t_pr": t_pr, **m}

    return jax.jit(eval_step)
