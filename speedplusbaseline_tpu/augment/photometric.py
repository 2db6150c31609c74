"""On-device training augmentations as pure functions of PRNG keys.

Reference transforms.py:38-110 runs Rotate/Flip/BrightnessContrast/
GaussianNoise on CPU DataLoader workers; here each is a jittable per-sample
function vmapped over the batch INSIDE the train step, so augmentation runs on
TPU fused with the model step and the host pipeline only decodes + crops.

Semantics parity:
  * Rotate: 90-degree multiples, k ~ uniform{1,2,3}; keypoint remaps
    (x,y)->(y,1-x) / (1-x,1-y) / (1-y,x) exactly as transforms.py:44-53, and
    image rotations chosen so pixels track keypoints (jnp.rot90 k times).
  * Flip: p=0.5 horizontal (x->1-x) else vertical (y->1-y), transforms.py:57-69.
  * BrightnessContrast: a = exp(U[log .5, log 2]), b = U[-25,25]/255,
    clip(a*img + b, 0, 1), transforms.py:71-96.
  * GaussianNoise: sigma = 25/255, clip, transforms.py:98-110.
  * RandomApply: each aug applied independently with p=0.5
    (transforms.py:198-211), via lax.cond on a bernoulli draw.

Images are (H, W, 3) float32 in [0,1] (square); keypts are (2, K) normalized.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rotate(key, image, keypts):
    k = jax.random.randint(key, (), 1, 4)  # 1..3 like torch.randint(1, 4)

    def rot1(args):
        img, kp = args
        x, y = kp[0], kp[1]
        return jnp.rot90(img, 1, axes=(0, 1)), jnp.stack([y, 1.0 - x])

    def rot2(args):
        img, kp = args
        x, y = kp[0], kp[1]
        return jnp.rot90(img, 2, axes=(0, 1)), jnp.stack([1.0 - x, 1.0 - y])

    def rot3(args):
        img, kp = args
        x, y = kp[0], kp[1]
        return jnp.rot90(img, 3, axes=(0, 1)), jnp.stack([1.0 - y, x])

    return jax.lax.switch(k - 1, [rot1, rot2, rot3], (image, keypts))


def _flip(key, image, keypts):
    horizontal = jax.random.uniform(key) < 0.5

    def hflip(args):
        img, kp = args
        return img[:, ::-1, :], jnp.stack([1.0 - kp[0], kp[1]])

    def vflip(args):
        img, kp = args
        return img[::-1, :, :], jnp.stack([kp[0], 1.0 - kp[1]])

    return jax.lax.cond(horizontal, hflip, vflip, (image, keypts))


def _brightness_contrast(key, image, keypts,
                         alpha=(0.5, 2.0), beta=(-25.0, 25.0)):
    ka, kb = jax.random.split(key)
    log_lo, log_hi = jnp.log(alpha[0]), jnp.log(alpha[1])
    a = jnp.exp(jax.random.uniform(ka) * (log_hi - log_lo) + log_lo)
    b = (jax.random.uniform(kb) * (beta[1] - beta[0]) + beta[0]) / 255.0
    return jnp.clip(a * image + b, 0.0, 1.0), keypts


def _gaussian_noise(key, image, keypts, std=25.0 / 255.0):
    noise = jax.random.normal(key, image.shape, dtype=image.dtype) * std
    return jnp.clip(image + noise, 0.0, 1.0), keypts


_AUGS = (_rotate, _flip, _brightness_contrast, _gaussian_noise)


def augment_sample(key, image, keypts, p: float = 0.5):
    """Apply the reference KRN aug stack to one sample (jit/vmap-able)."""
    keys = jax.random.split(key, 2 * len(_AUGS))
    for i, aug in enumerate(_AUGS):
        gate_key, op_key = keys[2 * i], keys[2 * i + 1]
        apply = jax.random.uniform(gate_key) < p

        image, keypts = jax.lax.cond(
            apply,
            lambda args, op_key=op_key, aug=aug: aug(op_key, *args),
            lambda args: args,
            (image, keypts),
        )
    return image, keypts


@functools.partial(jax.jit, static_argnames=("p",))
def augment_batch(key, images, keypts, p: float = 0.5):
    """vmap augment_sample over the batch with per-sample keys.

    Args:
        images: (B, H, W, 3) float32 in [0,1]; keypts: (B, 2, K).
    """
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(functools.partial(augment_sample, p=p))(keys, images, keypts)
