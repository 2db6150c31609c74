"""On-device style augmentation — reference src/styleaug/styleAugmentor.py.

The reference samples a style embedding z ~ N(mean_pbn, cov_pbn) via a
precomputed SVD factor A = U S^1/2 (styleAugmentor.py:38-49), interpolates
with the SPEED+ dataset mean embedding (alpha*z + (1-alpha)*base, :57-64) and
runs the frozen Ghiasi transformer under no_grad. Here the whole thing is a
pure function invoked INSIDE the jitted train step, gated per-batch by a
bernoulli(texture_ratio) draw via lax.cond (trainer.py:68-69 semantics) with
stop_gradient on the output (the .detach() at styleAugmentor.py:68).

Assets: mean/cov come from ``assets/style_embedding_*.npy`` (converted from
the reference's checkpoint_embeddings.pth / embedding_mean_speedplus.npy —
see scripts/convert_assets.py). The Ghiasi transformer weights
(checkpoint_transformer.pth) are ABSENT from this environment
(.MISSING_LARGE_BLOBS); ``StyleAugmentor.init_params`` falls back to random
init, and models/weight_convert.convert_ghiasi ingests the public
philipjackson/style-augmentation checkpoint when provided.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ghiasi import Ghiasi

EMBED_DIM = 100


def load_style_stats(assets_dir: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load (A, mean, base_embedding) for the embedding sampler.

    A = U diag(s)^0.5 from the SVD of the PBN embedding covariance
    (styleAugmentor.py:38-41); base is the SPEED+ mean embedding used for
    alpha-interpolation (named imagenet_embedding in the reference, :29-31).
    """
    mean = np.load(os.path.join(assets_dir, "style_embedding_pbn_mean.npy"))
    cov = np.load(os.path.join(assets_dir, "style_embedding_pbn_cov.npy"))
    base = np.load(os.path.join(assets_dir, "style_embedding_speedplus_mean.npy"))
    u, s, _ = np.linalg.svd(cov)
    A = u @ np.diag(np.sqrt(s))
    return A.astype(np.float32), mean.reshape(-1).astype(np.float32), base.reshape(-1).astype(np.float32)


def random_style_stats(seed: int = 0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random stand-in stats for tests / when assets are unavailable."""
    rs = np.random.RandomState(seed)
    A = (rs.randn(EMBED_DIM, EMBED_DIM) * 0.05).astype(np.float32)
    mean = rs.randn(EMBED_DIM).astype(np.float32) * 0.1
    base = rs.randn(EMBED_DIM).astype(np.float32) * 0.1
    return A, mean, base


class StyleAugmentor:
    """Frozen style randomizer applied to image batches on-device.

    Usage:
        aug = StyleAugmentor(alpha, stats=(A, mean, base))
        params = aug.init_params(rng)           # or converted Ghiasi weights
        out = aug(params, key, images)          # inside jit
    """

    def __init__(self, alpha: float, stats, dtype=jnp.float32,
                 use_pallas: Optional[bool] = None,
                 tpu_opt: Optional[bool] = None,
                 f32_out: bool = False):
        self.alpha = float(alpha)
        A, mean, base = stats
        self.A = jnp.asarray(A)
        self.mean = jnp.asarray(mean)
        self.base = jnp.asarray(base)
        if use_pallas is None:
            # The fused Pallas residual block beats XLA's lowering by ~13%
            # at the 56^2x128 Ghiasi shape (fetch-synced A/B, round 2);
            # auto-on for real TPU backends, off on CPU (no Mosaic).
            use_pallas = jax.default_backend() not in ("cpu",)
        if tpu_opt is None:
            # Phase-space (space-to-depth) rewrites of the full-resolution
            # layers (ops/phase_conv.py) — numerically identical and
            # checkpoint-compatible (tested); a throughput win on TPU, off
            # on CPU where XLA's direct lowering is faster to compile.
            tpu_opt = jax.default_backend() not in ("cpu",)
        self.ghiasi = Ghiasi(dtype=dtype, use_pallas=bool(use_pallas),
                             tpu_opt=bool(tpu_opt), f32_out=f32_out)

    def init_params(self, rng, image_shape=(1, 224, 224, 3)):
        variables = self.ghiasi.init(
            {"params": rng}, jnp.zeros(image_shape), jnp.zeros((1, EMBED_DIM))
        )
        return variables["params"]

    def sample_embedding(self, key, n: int):
        """z ~ N(mean, cov): randn @ A^T + mean (styleAugmentor.py:44-49)."""
        z = jax.random.normal(key, (n, EMBED_DIM), dtype=jnp.float32)
        return z @ self.A.T + self.mean

    def __call__(self, params, key, x):
        """Restyle a batch: (B, H, W, 3) in [0,1] -> same, gradient-stopped."""
        emb = self.sample_embedding(key, x.shape[0])
        emb = self.alpha * emb + (1.0 - self.alpha) * self.base
        out = self.ghiasi.apply({"params": params}, x, emb)
        return jax.lax.stop_gradient(out)

    def maybe_apply(self, params, key, x, texture_ratio: float):
        """Whole-batch bernoulli(texture_ratio) gate as an IN-GRAPH lax.cond.

        The engine's train steps now gate on the host instead (two
        specialized programs — see engine/steps.py; +6% step throughput);
        this stays for users who need the gate inside a single jit."""
        gate_key, style_key = jax.random.split(key)
        apply = jax.random.uniform(gate_key) < texture_ratio
        return jax.lax.cond(
            apply,
            lambda img: self(params, style_key, img).astype(img.dtype),
            lambda img: img,
            x,
        )
