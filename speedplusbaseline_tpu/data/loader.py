"""Threaded prefetching data loader feeding device-resident batches.

Replaces the reference's torch DataLoader (8 CPU worker PROCESSES,
build.py:45-66). Design for TPU hosts:

  * decode/crop runs in a thread pool (PIL/cv2 release the GIL during decode
    and resize, so threads scale without pickling overhead);
  * batches are stacked into contiguous numpy arrays and copied to device
    ahead of consumption (double-buffered prefetch queue), optionally sharded
    over a data-parallel Mesh with NamedSharding so each step consumes an
    already-distributed global batch;
  * shuffling is a per-epoch permutation from a (seed, epoch) Philox stream —
    deterministic and resumable, unlike torch's global-RNG shuffle.

An optional C++ decode core (native/) can replace the Python decode path via
``use_native=True``.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def _stack(samples) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 num_workers: int = 4, drop_last: bool = True,
                 sharding=None, prefetch: int = 2, seed: int = 2021):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.sharding = sharding
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _index_order(self):
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.Generator(
            np.random.Philox(key=np.uint64(
                [(self.seed << 20) + self.epoch, 0x5EEDF00D])))
        return rng.permutation(n)

    def _device_put(self, batch: Dict[str, np.ndarray]):
        if self.sharding is not None:
            if jax.process_count() > 1:
                # Multi-host: this process loaded only its local rows
                # (see _local_slice); assemble the global array from
                # process-local shards without gathering through host 0.
                return jax.tree_util.tree_map(
                    lambda x: jax.make_array_from_process_local_data(
                        self.sharding, x), batch)
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    def _local_pad_target(self) -> int:
        """Rows this process must emit per (non-drop_last) batch.

        The GLOBAL batch must divide the data mesh for NamedSharding, and
        eval batches may not (e.g. ``--batch_size 48 --num_devices 6
        --eval_batch_size 32``: the mesh clamps against the TRAIN batch, so
        device_put of a 32-row eval batch over 6 devices would fail
        mid-validation). Pad every eval batch up to the next mesh multiple;
        the 'valid' mask trims the padding out of metrics.
        """
        pc = jax.process_count()
        local = self.batch_size // pc
        mesh = getattr(self.sharding, "mesh", None)
        if mesh is None:
            return local
        d = mesh.size
        global_target = -(-self.batch_size // d) * d
        return global_target // pc

    def _local_slice(self, idxs: np.ndarray) -> np.ndarray:
        """The rows of a global batch this host is responsible for.

        With P processes, the global batch of size B is sharded over the
        'data' axis; each process feeds B/P contiguous rows (matching
        NamedSharding's row-major device order across processes).
        """
        pc = jax.process_count()
        if pc == 1:
            return idxs
        per = len(idxs) // pc
        pi = jax.process_index()
        return idxs[pi * per:(pi + 1) * per]

    def __iter__(self) -> Iterator:
        order = self._index_order()
        nb = len(self)
        epoch = self.epoch

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        error: list = []

        def produce():
            # Any exception must still enqueue the sentinel, or the consumer
            # blocks on out_q.get() forever; the error re-raises on the
            # consumer side.
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(nb):
                        if stop.is_set():
                            return
                        idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                        idxs = self._local_slice(idxs)
                        samples = list(pool.map(
                            lambda i: self.dataset.__getitem__(int(i), epoch=epoch),
                            idxs))
                        n_valid = len(samples)
                        local_bs = self._local_pad_target()
                        if not self.drop_last:
                            # Pad the tail batch to full (local) size — and
                            # every batch up to a mesh multiple — so shapes
                            # stay static for jit and divisible for the DP
                            # mesh; 'valid' masks the padding out of metrics.
                            while len(samples) < local_bs:
                                samples.append(samples[0])
                        batch = _stack(samples)
                        if not self.drop_last:
                            mask = np.zeros((local_bs,), np.float32)
                            mask[:n_valid] = 1.0
                            batch["valid"] = mask
                        batch = self._device_put(batch)
                        out_q.put(batch)
            except BaseException as e:  # noqa: BLE001
                error.append(e)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
            if error:
                raise error[0]
        finally:
            stop.set()
            # Drain so the producer thread can exit.
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    thread.join(timeout=0.1)


def make_dataloader(cfg, is_train=True, is_source=True, load_labels=True,
                    sharding=None):
    """Loader factory (reference build.py:45-66). Train: cfg.batch_size +
    shuffle; eval: cfg.eval_batch_size, no shuffle (the reference evaluates
    batch=1 — we batch for TPU throughput; per-image results are identical
    and still dumped per image)."""
    from .csv_dataset import build_dataset

    dataset = build_dataset(cfg, is_train, is_source, load_labels)
    if is_train:
        batch_size, shuffle, workers = cfg.batch_size, True, cfg.num_workers
        drop_last = True
    else:
        batch_size = getattr(cfg, "eval_batch_size", 32)
        shuffle, workers, drop_last = False, max(1, cfg.num_workers // 2), False
    return DataLoader(dataset, batch_size, shuffle, workers, drop_last,
                      sharding=sharding, seed=cfg.seed)
