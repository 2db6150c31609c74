"""[MEASURED DEAD END — kept under scripts/ for the record, not shipped.]

Reflect-padded convolution without materializing the padded tensor.
Measured SLOWER than plain jnp.pad reflect on v5e (30.9 vs 27.6 ms per
Ghiasi forward, BASELINE.md round-1 optimization record): the
dynamic_update_slice border writes cost more than the pad they avoid. The
production path instead removed the reflect-pad tax entirely via the
phase-space lowering (ops/phase_conv.py). Self-test: run this file.

``conv(reflect_pad(x))`` forces XLA to materialize a padded copy of the
activation (~8 ms per Ghiasi forward at 224^2 batch 48 on v5e), because only
ZERO padding folds into the conv itself. This op computes

    out = conv_zero_pad(x)                  # fully fused by XLA
    out[border] = conv(reflect strips)      # thin recompute, then DUS

The interior of a zero-padded SAME conv is identical to the reflect-padded
conv; only the p = k//2 border rows/cols differ. Those are recomputed from
(p + k - 1)-row strips built with explicit reflection and written back with
dynamic_update_slice — O(p * W) work instead of an O(H * W) copy.

Stride-1, square odd kernels (the Ghiasi stride-1 layers: k=3 and k=9).

MEASURED RESULT (v5e, 48x224^2 Ghiasi forward): 30.9 ms vs 27.6 ms for the
jnp.pad path — the four dynamic_update_slice border writes cost more than
the avoided pad copy, so Ghiasi keeps the plain reflect_pad. Retained as a
library op (and as the record of the experiment); exact-match tested against
the padded conv.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv_valid(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _reflect_w(x, p: int):
    """Reflect-pad the width axis only."""
    left = x[:, :, p:0:-1]
    right = x[:, :, -2:-2 - p:-1]
    return jnp.concatenate([left, x, right], axis=2)


def reflect_conv(x, w, b=None):
    """conv(reflect_pad(x, k//2), w, VALID) + b, stride 1, without the pad copy.

    Args:
        x: (B, H, W, C); w: (k, k, C, Cout) HWIO, k odd; b: (Cout,) or None.
    Returns:
        (B, H, W, Cout), float32-accumulated in x's compute dtype.
    """
    k = w.shape[0]
    p = k // 2
    B, H, W, _ = x.shape

    # Main pass: zero padding folds into the conv (no materialization).
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # Border strips. Output rows 0..p-1 read input rows -p..k-2; with
    # reflection, row -i is row i. Strips are width-reflected too, so their
    # VALID conv yields exactly the correct border values (corners included).
    top_in = jnp.concatenate([x[:, p:0:-1], x[:, :k - 1]], axis=1)
    bot_in = jnp.concatenate([x[:, H - k + 1:], x[:, -2:-2 - p:-1]], axis=1)
    top = _conv_valid(_reflect_w(top_in, p), w)  # (B, p, W, Cout)
    bot = _conv_valid(_reflect_w(bot_in, p), w)

    # Left/right strips cover rows p..H-p-1 only (corners already correct).
    left_in = jnp.concatenate([x[:, :, p:0:-1], x[:, :, :k - 1]], axis=2)
    right_in = jnp.concatenate([x[:, :, W - k + 1:], x[:, :, -2:-2 - p:-1]], axis=2)
    left = _conv_valid(left_in, w)[:, :, :, :]  # (B, H-k+1, p, Cout) after H VALID
    right = _conv_valid(right_in, w)

    out = jax.lax.dynamic_update_slice(out, top, (0, 0, 0, 0))
    out = jax.lax.dynamic_update_slice(out, bot, (0, H - p, 0, 0))
    out = jax.lax.dynamic_update_slice(out, left, (0, p, 0, 0))
    out = jax.lax.dynamic_update_slice(out, right, (0, p, W - p, 0))

    if b is not None:
        out = out + b
    return out


if __name__ == "__main__":
    import numpy as np

    rng = np.random.RandomState(0)
    for (k, C, Co, H) in [(3, 8, 16, 20), (9, 3, 32, 24)]:
        x = jnp.asarray(rng.randn(2, H, H, C).astype(np.float32))
        w = jnp.asarray(rng.randn(k, k, C, Co).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(Co).astype(np.float32) * 0.1)
        p = k // 2
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        ref = jax.lax.conv_general_dilated(
            xp, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        out = reflect_conv(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    print("reflect_conv self-test OK")
