"""Data-parallel device mesh over ICI — the distributed runtime the reference
lacks (SURVEY.md §2.9: reference is single-process single-GPU; the TPU build
introduces DP as a first-class component).

Design: a 1-axis ``Mesh(('data',))`` over all chips. The global batch is
sharded on axis 0 with NamedSharding; parameters/optimizer state are
replicated. The train step is a plain ``jax.jit`` — GSPMD turns the batch-dim
reductions (loss means, BatchNorm batch statistics, gradient sums) into ICI
collectives automatically, which makes BN statistics exactly global-batch
(better than torch DDP's per-replica stats) and gradient all-reduce free of
hand-written psums. The mesh keeps room for more axes (tp/pp) but these
MobileNetV2/AlexNet-scale CNNs only shard profitably on data (SURVEY.md §5
"long-context/sequence parallelism: absent and inapplicable").

Multi-host: call ``maybe_initialize_distributed()`` first; each process feeds
its host-local shard of the global batch.
"""
from __future__ import annotations

import os
import warnings

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """jax.distributed.initialize() when launched under a multi-host runtime
    (no-op on a single host)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(num_devices: int = 0, batch_size: int = 0) -> Mesh:
    """1-axis data mesh. With ``batch_size``, clamps the device count to the
    largest divisor of the batch so sharding stays exact (a global batch of 4
    cannot shard over 8 chips). Clamping is LOUD: silently idling chips
    (e.g. batch 50 on 8 chips -> 5 used, 3 idle) would be a 37% throughput
    loss the user never asked for, so it warns with the fix spelled out."""
    devices = jax.devices()
    requested = num_devices if num_devices > 0 else len(devices)
    n = min(requested, len(devices))
    if batch_size > 0:
        while n > 1 and batch_size % n != 0:
            n -= 1
        if n < min(requested, len(devices)):
            warnings.warn(
                f"make_mesh: batch_size={batch_size} is not divisible by the "
                f"{min(requested, len(devices))} available devices; clamping "
                f"the data mesh to {n} device(s) and IDLING the rest. Pick a "
                f"batch_size divisible by the device count to use all chips.",
                RuntimeWarning, stacklevel=2)
    return Mesh(np.asarray(devices[:n]), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch as a globally-sharded array tree."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
