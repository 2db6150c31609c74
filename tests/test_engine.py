"""Engine tests: optimizers vs torch, train steps learn, DANN, checkpointing.

Uses tiny inputs (KRN accepts any 32x-divisible size >= 32 thanks to the
adaptive head) to keep CPU compile time sane.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speedplusbaseline_tpu.config import default_cfg
from speedplusbaseline_tpu.engine import (
    build_optimizer,
    create_train_state,
    make_dann_train_step,
    make_krn_train_step,
    make_spn_train_step,
    step_lr_schedule,
)
from speedplusbaseline_tpu.engine.state import restore_train_state
from speedplusbaseline_tpu.models import KeypointRegressionNet, RevGrad, SpacecraftPoseNet


def tiny_cfg(**kw):
    base = dict(batch_size=4, input_shape=(64, 64), optimizer="adamw",
                lr=1e-3, weight_decay=0.01)
    base.update(kw)
    return default_cfg(**base)


class TestSchedule:
    def test_step_lr_matches_torch_steplr(self):
        torch = pytest.importorskip("torch")
        lr0, gamma, step_size, spe = 0.1, 0.95, 2, 10
        sched = step_lr_schedule(lr0, gamma, step_size, spe)

        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=lr0)
        tsched = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size, gamma=gamma)
        for epoch in range(8):
            torch_lr = opt.param_groups[0]["lr"]
            ours = float(sched(epoch * spe))
            assert abs(ours - torch_lr) < 1e-9, (epoch, ours, torch_lr)
            opt.step()
            tsched.step()


class TestOptimizerParity:
    @pytest.mark.parametrize("name", ["sgd", "rmsprop", "adam", "adamw"])
    def test_matches_torch_step_by_step(self, name, rng):
        """5 updates on a quadratic; our optax chain vs the torch optimizer
        the reference builds (src/nets/build.py:60-78)."""
        torch = pytest.importorskip("torch")
        w0 = rng.randn(6).astype(np.float32)
        lr, momentum, wd = 0.01, 0.9, 5e-4
        target = rng.randn(6).astype(np.float32)

        cfg = tiny_cfg(optimizer=name, lr=lr, momentum=momentum,
                       weight_decay=wd, model_name="krn",
                       lr_decay_alpha=1.0)  # isolate optimizer math
        tx = build_optimizer(cfg, steps_per_epoch=1000000)

        params = {"w": jnp.asarray(w0)}
        opt_state = tx.init(params)

        tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        topt = {
            "sgd": lambda: torch.optim.SGD([tp], lr=lr, momentum=momentum,
                                           weight_decay=wd),
            "rmsprop": lambda: torch.optim.RMSprop([tp], lr=lr, alpha=momentum,
                                                   weight_decay=wd),
            "adam": lambda: torch.optim.Adam([tp], lr=lr, betas=(momentum, 0.999),
                                             weight_decay=wd),
            "adamw": lambda: torch.optim.AdamW([tp], lr=lr, betas=(momentum, 0.999),
                                               weight_decay=wd),
        }[name]()

        tt = torch.from_numpy(target)
        for _ in range(5):
            grads = {"w": 2.0 * (params["w"] - jnp.asarray(target))}
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            topt.zero_grad()
            loss = ((tp - tt) ** 2).sum()
            loss.backward()
            # reference clips grads first (trainer.py:97)
            torch.nn.utils.clip_grad_norm_([tp], 1.0)
            topt.step()

        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(), atol=2e-4)


def synthetic_krn_batch(rng, B=4, hw=64, K=11):
    return {
        "image": jnp.asarray(rng.rand(B, hw, hw, 3).astype(np.float32)),
        "keypts": jnp.asarray(rng.rand(B, 2, K).astype(np.float32) * 0.8 + 0.1),
    }


class TestKRNTrainStep:
    def test_loss_decreases_on_fixed_batch(self, rng):
        cfg = tiny_cfg(lr=3e-4)
        model = KeypointRegressionNet(cfg.num_keypoints)
        tx = build_optimizer(cfg, steps_per_epoch=100)
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, tx, key, jnp.zeros((1, 64, 64, 3)))
        step = make_krn_train_step(model, tx, cfg, style_aug=None)

        batch = synthetic_krn_batch(rng)
        losses = []
        for _ in range(12):
            state, sm = step(state, batch, key, None)
            losses.append(float(sm["loss_x"]) + float(sm["loss_y"]))
        # Augmentation jitters per-step targets; compare start/end windows.
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    def test_step_increments_and_batch_stats_change(self, rng):
        cfg = tiny_cfg()
        model = KeypointRegressionNet(cfg.num_keypoints)
        tx = build_optimizer(cfg, steps_per_epoch=100)
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, tx, key, jnp.zeros((1, 64, 64, 3)))
        step = make_krn_train_step(model, tx, cfg, style_aug=None)
        bs0 = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
        state, _ = step(state, synthetic_krn_batch(rng), key, None)
        assert int(state.step) == 1
        bs1 = jax.tree_util.tree_leaves(state.batch_stats)[0]
        assert not np.allclose(np.asarray(bs0), np.asarray(bs1))

    def test_uint8_batch_matches_float(self, rng):
        """The loader ships uint8 images (4x smaller H2D copies); the step
        normalizes on-device (steps.py _images_to_float). A uint8 batch must
        match the equivalent pre-normalized f32 batch to float rounding (the
        two dtypes trace separate XLA programs, so fusion reassociation and
        the 1-ulp x*(1/255) vs x/255 difference preclude bit equality).
        Compared on loss and BN batch stats — smooth functions of the input;
        adamw's params after one step are ±lr*sign(grad), which amplifies
        ulp-level noise on near-zero gradients to full sign flips."""
        cfg = tiny_cfg()
        model = KeypointRegressionNet(cfg.num_keypoints)
        tx = build_optimizer(cfg, steps_per_epoch=100)
        key = jax.random.PRNGKey(0)
        step = make_krn_train_step(model, tx, cfg, style_aug=None)

        img_u8 = (rng.rand(4, 64, 64, 3) * 255).astype(np.uint8)
        kp = jnp.asarray(rng.rand(4, 2, 11).astype(np.float32))
        b_u8 = {"image": jnp.asarray(img_u8), "keypts": kp}
        b_f32 = {"image": jnp.asarray(img_u8.astype(np.float32) / 255.0),
                 "keypts": kp}

        s0 = create_train_state(model, tx, key, jnp.zeros((1, 64, 64, 3)))
        s1 = create_train_state(model, tx, key, jnp.zeros((1, 64, 64, 3)))
        s0, m0 = step(s0, b_u8, key, None)
        s1, m1 = step(s1, b_f32, key, None)
        assert abs(float(m0["loss_x"]) - float(m1["loss_x"])) < 1e-3 * (
            1.0 + abs(float(m1["loss_x"])))
        assert abs(float(m0["loss_y"]) - float(m1["loss_y"])) < 1e-3 * (
            1.0 + abs(float(m1["loss_y"])))
        for a, b in zip(jax.tree_util.tree_leaves(s0.batch_stats),
                        jax.tree_util.tree_leaves(s1.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)

    def test_styleaug_gating_inside_step(self, rng):
        from speedplusbaseline_tpu.augment.styleaug import (
            StyleAugmentor,
            random_style_stats,
        )

        cfg = tiny_cfg(randomize_texture=True, texture_ratio=1.0)
        model = KeypointRegressionNet(cfg.num_keypoints)
        tx = build_optimizer(cfg, steps_per_epoch=100)
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, tx, key, jnp.zeros((1, 64, 64, 3)))
        aug = StyleAugmentor(cfg.texture_alpha, random_style_stats(0))
        style_params = aug.init_params(jax.random.PRNGKey(1), (1, 64, 64, 3))
        step = make_krn_train_step(model, tx, cfg, style_aug=aug)
        state, sm = step(state, synthetic_krn_batch(rng), key, style_params)
        assert np.isfinite(float(sm["loss_x"]))


@pytest.mark.slow
class TestSPNTrainStep:
    def test_runs_and_decreases(self, rng):
        cfg = tiny_cfg(model_name="spn", num_classes=50, input_shape=(227, 227),
                       lr=1e-4, batch_size=2)
        model = SpacecraftPoseNet(cfg.num_classes)
        tx = build_optimizer(cfg, steps_per_epoch=100)
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, tx, key, jnp.zeros((1, 227, 227, 3)))
        step = make_spn_train_step(model, tx, cfg, style_aug=None)

        yc = np.zeros((2, 50), np.float32)
        yc[:, :5] = 0.2
        yw = np.zeros((2, 50), np.float32)
        yw[:, :5] = 0.2
        batch = {
            "image": jnp.asarray(rng.rand(2, 227, 227, 3).astype(np.float32)),
            "y_classes": jnp.asarray(yc),
            "y_weights": jnp.asarray(yw),
        }
        losses = []
        for _ in range(6):
            state, sm = step(state, batch, key, None)
            losses.append(float(sm["loss_c"]))
        assert losses[-1] < losses[0]


@pytest.mark.slow
class TestDANNTrainStep:
    def test_joint_step_runs_and_learns_domains(self, rng):
        cfg = tiny_cfg(dann=True, model_name="krn", lr=1e-3, optimizer="adamw")
        model = RevGrad(cfg.num_keypoints)
        tx = build_optimizer(cfg, steps_per_epoch=100)
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, tx, key, jnp.zeros((1, 64, 64, 3)),
                                   alpha=0.0)
        step = make_dann_train_step(model, tx, cfg)

        src = synthetic_krn_batch(rng)
        tgt = {"image": jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))}
        aux_hist = []
        for i in range(4):
            state, aux = step(state, src, tgt, key, np.float32(0.1))
            aux_hist.append({k: float(v) for k, v in aux.items()})
        for k in ("loss_pose", "loss_source", "loss_target"):
            assert np.isfinite(aux_hist[-1][k])
        assert int(state.step) == 4

    def test_target_stream_is_augmented(self, rng, monkeypatch):
        """The reference builds the unlabeled target loader with
        is_train=True so the Rotate/Flip/BC/Noise stack applies to target
        images too (reference build.py:45-53, transforms.py:222-244). Spy on
        augment_sample at trace time: both the source and the target stream
        must route through it."""
        from speedplusbaseline_tpu.engine import steps as steps_mod

        calls = []
        orig = steps_mod.augment_sample

        def spy(key, image, keypts, p=0.5):
            calls.append(tuple(image.shape))
            return orig(key, image, keypts, p=p)

        monkeypatch.setattr(steps_mod, "augment_sample", spy)

        cfg = tiny_cfg(dann=True, model_name="krn")
        model = RevGrad(cfg.num_keypoints)
        tx = build_optimizer(cfg, steps_per_epoch=100)
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, tx, key, jnp.zeros((1, 64, 64, 3)),
                                   alpha=0.0)
        step = make_dann_train_step(model, tx, cfg)
        src = synthetic_krn_batch(rng)
        tgt = {"image": jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))}
        state, aux = step(state, src, tgt, key, np.float32(0.1))
        # one vmap trace for source, one for target
        assert len(calls) == 2, calls
        assert np.isfinite(float(aux["loss_target"]))


class TestCheckpointRoundtrip:
    def test_save_restore_identical(self, rng, tmp_path):
        from speedplusbaseline_tpu.io_utils.checkpoint import (
            CKPT_NAME,
            load_checkpoint,
            save_checkpoint,
        )

        cfg = tiny_cfg()
        model = KeypointRegressionNet(cfg.num_keypoints)
        tx = build_optimizer(cfg, steps_per_epoch=100)
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, tx, key, jnp.zeros((1, 64, 64, 3)))
        step = make_krn_train_step(model, tx, cfg, style_aug=None)
        state, _ = step(state, synthetic_krn_batch(rng), key, None)

        save_checkpoint(state.as_checkpoint_dict(3, "krn", 3), True, str(tmp_path))
        assert os.path.exists(tmp_path / CKPT_NAME)
        assert os.path.exists(tmp_path / "model_best.msgpack")

        fresh = create_train_state(model, tx, jax.random.PRNGKey(9),
                                   jnp.zeros((1, 64, 64, 3)))
        template = fresh.as_checkpoint_dict(0, "krn", 0)
        ckpt = load_checkpoint(str(tmp_path / CKPT_NAME), template)
        restored = restore_train_state(fresh, ckpt)

        assert ckpt["epoch"] == 3
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_continues_training(self, rng, tmp_path):
        """Save -> restore -> next step must equal uninterrupted training."""
        from speedplusbaseline_tpu.io_utils.checkpoint import (
            CKPT_NAME,
            load_checkpoint,
            save_checkpoint,
        )

        cfg = tiny_cfg()
        model = KeypointRegressionNet(cfg.num_keypoints)
        tx = build_optimizer(cfg, steps_per_epoch=100)
        key = jax.random.PRNGKey(0)
        state = create_train_state(model, tx, key, jnp.zeros((1, 64, 64, 3)))
        step = make_krn_train_step(model, tx, cfg, style_aug=None)
        batch = synthetic_krn_batch(rng)

        state, _ = step(state, batch, key, None)
        save_checkpoint(state.as_checkpoint_dict(1, "krn", 1), False, str(tmp_path))
        cont, sm_direct = step(state, batch, key, None)

        fresh = create_train_state(model, tx, jax.random.PRNGKey(7),
                                   jnp.zeros((1, 64, 64, 3)))
        ckpt = load_checkpoint(str(tmp_path / CKPT_NAME),
                               fresh.as_checkpoint_dict(0, "krn", 0))
        restored = restore_train_state(fresh, ckpt)
        resumed, sm_resumed = step(restored, batch, key, None)

        assert abs(float(sm_direct["loss_x"]) - float(sm_resumed["loss_x"])) < 1e-5
