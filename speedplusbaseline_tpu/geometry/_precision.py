"""Matmul-precision pinning for geometry kernels.

XLA's DEFAULT matmul precision allows reduced-precision accumulation (bf16
passes on the TPU MXU, and oneDNN/AMX bf16 on CPU). That is exactly right for
the neural nets, but pose recovery (EPnP null-space extraction, quaternion
means, Gauss-Newton solves) needs true float32: a 2e-3 relative error in
M^T M shifts the recovered attitude by more than the 0.169 deg SPEED+ HIL
threshold. Every public geometry entry point runs its trace under
``jax.default_matmul_precision('float32')``.
"""
from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace ``fn`` with float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
