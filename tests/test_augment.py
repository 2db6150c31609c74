"""Augmentation tests: keypoints must track pixels; parity with reference
formulas (transforms.py:38-110)."""
import numpy as np

import jax
import jax.numpy as jnp

from speedplusbaseline_tpu.augment.photometric import (
    _brightness_contrast,
    _flip,
    _gaussian_noise,
    _rotate,
    augment_batch,
)
from speedplusbaseline_tpu.augment.styleaug import StyleAugmentor, random_style_stats


def _blob_image(h, w, cx, cy):
    """Image with a bright blob at (cx, cy) in [0,1] normalized coords."""
    img = np.zeros((h, w, 3), dtype=np.float32)
    px = min(int(cx * w), w - 1)
    py = min(int(cy * h), h - 1)
    img[py, px, :] = 1.0
    return img


def _locate_blob(img):
    idx = np.unravel_index(np.argmax(np.asarray(img)[..., 0]), img.shape[:2])
    h, w = img.shape[:2]
    return (idx[1] + 0.5) / w, (idx[0] + 0.5) / h  # (x, y) normalized


class TestGeometricAugs:
    def test_rotate_keypoints_track_pixels(self):
        """For each rotation k, the remapped keypoint must land on the pixel
        the blob moved to."""
        h = w = 32
        for seed in range(12):  # hits all three rotations
            key = jax.random.PRNGKey(seed)
            cx, cy = 0.25, 0.125
            img = jnp.asarray(_blob_image(h, w, cx, cy))
            kp = jnp.asarray([[cx], [cy]], dtype=jnp.float32)
            img2, kp2 = _rotate(key, img, kp)
            bx, by = _locate_blob(np.asarray(img2))
            assert abs(float(kp2[0, 0]) - bx) < 2.5 / w, (seed, kp2, (bx, by))
            assert abs(float(kp2[1, 0]) - by) < 2.5 / h, (seed, kp2, (bx, by))

    def test_rotate_formulas(self):
        """Keypoint maps match transforms.py:44-53 exactly per k."""
        x, y = 0.3, 0.1
        kp = jnp.asarray([[x], [y]], dtype=jnp.float32)
        img = jnp.zeros((8, 8, 3))
        maps = {1: (y, 1 - x), 2: (1 - x, 1 - y), 3: (1 - y, x)}
        seen = set()
        for seed in range(30):
            key = jax.random.PRNGKey(seed)
            k = int(jax.random.randint(key, (), 1, 4))
            _, kp2 = _rotate(key, img, kp)
            ex, ey = maps[k]
            assert abs(float(kp2[0, 0]) - ex) < 1e-6
            assert abs(float(kp2[1, 0]) - ey) < 1e-6
            seen.add(k)
        assert seen == {1, 2, 3}

    def test_flip_keypoints_track_pixels(self):
        h = w = 32
        for seed in range(8):
            key = jax.random.PRNGKey(seed)
            cx, cy = 0.25, 0.125
            img = jnp.asarray(_blob_image(h, w, cx, cy))
            kp = jnp.asarray([[cx], [cy]], dtype=jnp.float32)
            img2, kp2 = _flip(key, img, kp)
            bx, by = _locate_blob(np.asarray(img2))
            assert abs(float(kp2[0, 0]) - bx) < 2.5 / w
            assert abs(float(kp2[1, 0]) - by) < 2.5 / h


class TestPhotometricAugs:
    def test_brightness_contrast_range_and_bounds(self, rng):
        img = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
        kp = jnp.zeros((2, 1))
        for seed in range(10):
            out, _ = _brightness_contrast(jax.random.PRNGKey(seed), img, kp)
            assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_noise_statistics(self, rng):
        img = jnp.full((64, 64, 3), 0.5, jnp.float32)
        out, _ = _gaussian_noise(jax.random.PRNGKey(0), img, jnp.zeros((2, 1)))
        resid = np.asarray(out) - 0.5
        assert abs(resid.std() - 25.0 / 255.0) < 0.01  # sigma = 25/255
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_augment_batch_shapes_and_determinism(self, rng):
        imgs = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
        kps = jnp.asarray(rng.rand(4, 2, 11).astype(np.float32))
        key = jax.random.PRNGKey(42)
        o1, k1 = augment_batch(key, imgs, kps)
        o2, k2 = augment_batch(key, imgs, kps)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
        assert o1.shape == imgs.shape and k1.shape == kps.shape

    def test_per_sample_decorrelation(self, rng):
        """Different samples in the batch must receive different augs."""
        img = rng.rand(16, 16, 3).astype(np.float32)
        imgs = jnp.asarray(np.stack([img] * 8))
        kps = jnp.zeros((8, 2, 11), jnp.float32)
        out, _ = augment_batch(jax.random.PRNGKey(3), imgs, kps)
        out = np.asarray(out)
        diffs = [np.abs(out[i] - out[0]).max() for i in range(1, 8)]
        assert max(diffs) > 1e-3


class TestStyleAugmentor:
    def test_apply_and_gate(self, rng):
        aug = StyleAugmentor(alpha=0.5, stats=random_style_stats(0))
        params = aug.init_params(jax.random.PRNGKey(0), (1, 32, 32, 3))
        x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))

        out = aug(params, jax.random.PRNGKey(1), x)
        assert out.shape == x.shape
        assert float(jnp.abs(out - x).max()) > 1e-3  # actually restyled

        # ratio=0 -> identity; ratio=1 -> restyled
        same = aug.maybe_apply(params, jax.random.PRNGKey(2), x, 0.0)
        np.testing.assert_array_equal(np.asarray(same), np.asarray(x))
        styled = aug.maybe_apply(params, jax.random.PRNGKey(2), x, 1.0)
        assert float(jnp.abs(styled - x).max()) > 1e-3

    def test_embedding_sampler_statistics(self):
        """z @ A^T + mean must reproduce mean/cov (styleAugmentor.py:44-49)."""
        A, mean, base = random_style_stats(1)
        aug = StyleAugmentor(alpha=0.5, stats=(A, mean, base))
        emb = np.asarray(aug.sample_embedding(jax.random.PRNGKey(0), 20000))
        emp_mean = emb.mean(0)
        np.testing.assert_allclose(emp_mean, mean, atol=0.02)
        emp_cov = np.cov(emb.T)
        np.testing.assert_allclose(emp_cov, A @ A.T, atol=0.05)

    def test_gradient_is_stopped(self, rng):
        aug = StyleAugmentor(alpha=0.5, stats=random_style_stats(0))
        params = aug.init_params(jax.random.PRNGKey(0), (1, 16, 16, 3))
        x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))

        def f(xin):
            return jnp.sum(aug(params, jax.random.PRNGKey(1), xin))

        g = jax.grad(f)(x)
        np.testing.assert_array_equal(np.asarray(g), np.zeros_like(np.asarray(g)))
