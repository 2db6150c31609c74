"""Style predictor (InceptionV3 truncated at Mixed_6e) in flax — reference
src/styleaug/stylePredictor.py:6-243.

Offline-only component: it maps images to 100-dim style embeddings to
precompute the SPEED+ embedding mean/covariance that the on-line style
augmentor samples from (get_embedding_mean_and_covariance.py; SURVEY.md §2.5).
The truncated trunk is stem convs + 3x InceptionA + InceptionB + 4x
InceptionC, mean-pooled to 768 features, then Linear(768 -> 100).

Keeps the reference's double-preprocessing quirk (stylePredictor.py:32-41):
the ImageNet normalize followed by the torchvision-Inception re-normalize
(including the 0.255-vs-0.225 typo in the first step, preserved on purpose so
converted checkpoints reproduce embeddings bit-comparably).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

EMBED_DIM = 100


class BasicConv2d(nn.Module):
    """Conv(no bias) + BN(eps=1e-3) + ReLU (stylePredictor.py:232-243)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ph, pw = self.padding
        x = nn.Conv(self.features, self.kernel_size,
                    strides=(self.strides, self.strides),
                    padding=((ph, ph), (pw, pw)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=jnp.float32,
                         name="bn")(x.astype(jnp.float32)).astype(self.dtype)
        return nn.relu(x)


def _avg_pool_3x3_same(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


def _max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = lambda f, k, p, name: BasicConv2d(f, k, 1, p, dtype=self.dtype, name=name)
        b1 = b(64, (1, 1), (0, 0), "branch1x1")(x, train)
        b5 = b(48, (1, 1), (0, 0), "branch5x5_1")(x, train)
        b5 = b(64, (5, 5), (2, 2), "branch5x5_2")(b5, train)
        b3 = b(64, (1, 1), (0, 0), "branch3x3dbl_1")(x, train)
        b3 = b(96, (3, 3), (1, 1), "branch3x3dbl_2")(b3, train)
        b3 = b(96, (3, 3), (1, 1), "branch3x3dbl_3")(b3, train)
        bp = b(self.pool_features, (1, 1), (0, 0), "branch_pool")(
            _avg_pool_3x3_same(x), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = BasicConv2d(384, (3, 3), 2, (0, 0), dtype=self.dtype,
                         name="branch3x3")(x, train)
        d = BasicConv2d(64, (1, 1), 1, (0, 0), dtype=self.dtype,
                        name="branch3x3dbl_1")(x, train)
        d = BasicConv2d(96, (3, 3), 1, (1, 1), dtype=self.dtype,
                        name="branch3x3dbl_2")(d, train)
        d = BasicConv2d(96, (3, 3), 2, (0, 0), dtype=self.dtype,
                        name="branch3x3dbl_3")(d, train)
        return jnp.concatenate([b3, d, _max_pool_3x3_s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c7 = self.channels_7x7
        b = lambda f, k, p, name: BasicConv2d(f, k, 1, p, dtype=self.dtype, name=name)
        b1 = b(192, (1, 1), (0, 0), "branch1x1")(x, train)

        b7 = b(c7, (1, 1), (0, 0), "branch7x7_1")(x, train)
        b7 = b(c7, (1, 7), (0, 3), "branch7x7_2")(b7, train)
        b7 = b(192, (7, 1), (3, 0), "branch7x7_3")(b7, train)

        d = b(c7, (1, 1), (0, 0), "branch7x7dbl_1")(x, train)
        d = b(c7, (7, 1), (3, 0), "branch7x7dbl_2")(d, train)
        d = b(c7, (1, 7), (0, 3), "branch7x7dbl_3")(d, train)
        d = b(c7, (7, 1), (3, 0), "branch7x7dbl_4")(d, train)
        d = b(192, (1, 7), (0, 3), "branch7x7dbl_5")(d, train)

        bp = b(192, (1, 1), (0, 0), "branch_pool")(_avg_pool_3x3_same(x), train)
        return jnp.concatenate([b1, b7, d, bp], axis=-1)


class StylePredictor(nn.Module):
    """Images in [0,1] (NHWC) -> (B, 100) style embeddings."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(jnp.float32)
        # Double preprocessing (stylePredictor.py:32-41), channel-last.
        mean1 = jnp.array([0.485, 0.456, 0.406])
        std1 = jnp.array([0.229, 0.224, 0.255])  # 0.255 quirk preserved
        x = (x - mean1) / std1
        scale2 = jnp.array([0.229 / 0.5, 0.224 / 0.5, 0.225 / 0.5])
        shift2 = jnp.array([(0.485 - 0.5) / 0.5, (0.456 - 0.5) / 0.5,
                            (0.406 - 0.5) / 0.5])
        x = (x * scale2 + shift2).astype(self.dtype)

        b = lambda f, k, s, p, name: BasicConv2d(f, k, s, p, dtype=self.dtype,
                                                 name=name)
        x = b(32, (3, 3), 2, (0, 0), "Conv2d_1a_3x3")(x, train)
        x = b(32, (3, 3), 1, (0, 0), "Conv2d_2a_3x3")(x, train)
        x = b(64, (3, 3), 1, (1, 1), "Conv2d_2b_3x3")(x, train)
        x = _max_pool_3x3_s2(x)
        x = b(80, (1, 1), 1, (0, 0), "Conv2d_3b_1x1")(x, train)
        x = b(192, (3, 3), 1, (0, 0), "Conv2d_4a_3x3")(x, train)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x, train)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x, train)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x, train)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x, train)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x, train)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x, train)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x, train)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x, train)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (B, 768)
        return nn.Dense(EMBED_DIM, param_dtype=jnp.float32, name="fc")(x)
