"""Host data loader: batching, shuffling, per-process sharding, optional
worker processes.

Replaces the reference's torch DataLoader + DistributedSampler stack
(train_ae.py:100-116): each JAX process iterates its own shard of the
dataset (DistributedSampler semantics: seeded permutation, padded to a
multiple of world size, round-robin split), collates numpy batches, and
hands (B, 3, N) clouds / (B, H, W, C) images to the device step.

Workers: `num_workers > 0` with the default `worker_type="thread"` uses
a THREAD pool for the CPU-hot surface sampling (numpy releases the GIL
on the large-array ops; h5py serializes its own calls behind its global
lock); `worker_type="process"` uses a SPAWN-based process pool — true
multi-core for the GIL-bound parts of the pipeline (h5 reads, small-array
transforms). Spawn, not fork: forking a multithreaded JAX host is the
CPython-documented deadlock hazard (the child inherits held locks).
Each worker process unpickles the dataset once (open h5 handles are
dropped in __getstate__; workers lazily reopen their own SWMR handles)
and serves index lookups. The native batched sampler (csrc/sampler.cpp)
is already multi-core and takes priority over either pool whenever it
is available.
"""

from __future__ import annotations

import math
import queue
import threading
from typing import Iterator, Optional

import numpy as np

_END = object()  # sentinel: producer finished

_WORKER_DATASET = None  # set once per spawned worker process


def _process_worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _process_worker_get(args):
    # the parent's set_epoch does not reach spawned workers' dataset
    # copies, and the per-sample RNG is epoch-seeded — sync it per task
    epoch, i = args
    if _WORKER_DATASET.epoch != epoch:
        _WORKER_DATASET.set_epoch(epoch)
    return _WORKER_DATASET[int(i)]


def _collate(samples, image_nhwc=True):
    batch = {}
    for key in samples[0]:
        arr = np.stack([np.asarray(s[key]) for s in samples])
        if key == "image" and image_nhwc and arr.ndim == 4:
            arr = np.transpose(arr, (0, 2, 3, 1))  # (B,C,H,W) -> (B,H,W,C)
        batch[key] = arr
    return batch


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        num_workers: int = 0,
        num_replicas: int = 1,
        rank: int = 0,
        seed: int = 0,
        image_nhwc: bool = True,
        prefetch: int = 2,
        worker_type: str = "thread",
    ):
        if worker_type not in ("thread", "process"):
            raise ValueError(f"worker_type must be 'thread' or 'process', "
                             f"got {worker_type!r}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.worker_type = worker_type
        self.num_replicas = num_replicas
        self.rank = rank
        self.seed = seed
        self.image_nhwc = image_nhwc
        # prefetch > 0: assemble up to `prefetch` batches ahead on a
        # background thread (torch DataLoader's worker-prefetch analog,
        # reference train_ae.py:100-116) so host-side surface sampling
        # overlaps the in-flight device step instead of sitting on the
        # critical path. 0 = synchronous.
        self.prefetch = prefetch
        self.epoch = 0
        self._pool = None

    def set_epoch(self, epoch: int):
        """Reshuffle seed per epoch (DistributedSampler.set_epoch analog)."""
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        if self.num_replicas > 1:
            total = int(
                math.ceil(n / self.num_replicas) * self.num_replicas
            )
            if total > n:  # pad by wrapping (DistributedSampler semantics)
                idx = np.concatenate([idx, idx[: total - n]])
            idx = idx[self.rank::self.num_replicas]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return int(math.ceil(n / self.batch_size))

    def _get_pool(self):
        if self._pool is None and self.num_workers > 0:
            if self.worker_type == "process":
                import multiprocessing as mp

                ctx = mp.get_context("spawn")
                self._pool = ctx.Pool(
                    self.num_workers,
                    initializer=_process_worker_init,
                    initargs=(self.dataset,),
                )
            else:
                from multiprocessing.pool import ThreadPool

                self._pool = ThreadPool(self.num_workers)
        return self._pool

    def _assemble(self, chunk) -> dict:
        samples = None
        if hasattr(self.dataset, "get_batch"):
            # native multithreaded batch sampling fast path — already
            # multi-core, so it beats any Python-side pool
            samples = self.dataset.get_batch(chunk)
        if samples is None:
            pool = self._get_pool()
            if pool is None:
                samples = [self.dataset[int(i)] for i in chunk]
            elif self.worker_type == "process":
                # each spawned worker holds its own unpickled dataset
                # (module global, _process_worker_init)
                samples = pool.map(
                    _process_worker_get,
                    [(self.epoch, int(i)) for i in chunk],
                )
            else:
                samples = pool.map(
                    lambda i: self.dataset[int(i)], list(chunk)
                )
        return _collate(samples, self.image_nhwc)

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        n_batches = len(self)
        chunks = [
            idx[b * self.batch_size:(b + 1) * self.batch_size]
            for b in range(n_batches)
        ]
        if self.prefetch <= 0:
            for chunk in chunks:
                yield self._assemble(chunk)
            return

        # double-buffered background assembly: the bounded queue holds up
        # to `prefetch` ready batches; the producer blocks when ahead.
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for chunk in chunks:
                    if stop.is_set():
                        return
                    q.put(self._assemble(chunk))
                q.put(_END)
            except BaseException as e:  # surfaced in the consumer
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while not q.empty():  # unblock a producer stuck on put()
                q.get_nowait()
            t.join(timeout=5.0)

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None
