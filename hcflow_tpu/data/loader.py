"""Batch loader: epoch-seeded enlarged-permutation sampling + multiprocess prefetch.

Behavioral reference: /root/reference/codes/data/data_sampler.py (DistIterSampler with
dataset enlarged xratio so epoch restarts are rare, deterministic per-epoch
permutation) and data/__init__.py:7-25 (dataloader construction, ``n_workers``).

TPU-native replacement for torch DataLoader + DistributedSampler: a host-side numpy
permutation over an enlarged index space, sliced per process for multi-host training,
with a fork-based worker pool decoding ahead of the accelerator (PNG decode is
GIL-bound, so honoring ``n_workers`` needs real processes, not threads).  Batches are
assigned round-robin and re-ordered on receipt, so worker count never changes the
batch stream; per-item RNG is (seed, epoch, index)-derived, so placement doesn't
either.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue
import signal
import threading
from typing import Iterator, Optional

import numpy as np


class EnlargedSampler:
    """Deterministic epoch-seeded permutation of ratio * len(dataset) indices."""

    def __init__(
        self,
        num_samples: int,
        ratio: int = 1,
        num_replicas: int = 1,
        rank: int = 0,
        seed: int = 0,
    ):
        self.num_samples = num_samples
        self.ratio = ratio
        self.num_replicas = num_replicas
        self.rank = rank
        self.seed = seed
        total = int(np.ceil(num_samples * ratio / num_replicas)) * num_replicas
        self.total_size = total
        self.per_replica = total // num_replicas

    def indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng([self.seed, epoch])
        idx = rng.permutation(self.total_size) % self.num_samples
        return idx[self.rank : self.total_size : self.num_replicas]


def _collate(items):
    batch = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            batch[k] = np.stack(vals).astype(np.float32)
        else:
            batch[k] = vals
    return batch


class DataLoader:
    """Minimal dataset -> batched-numpy iterator with optional thread prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        sampler: Optional[EnlargedSampler] = None,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.sampler = sampler
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = self.sampler.per_replica if self.sampler else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return int(np.ceil(n / self.batch_size))

    def _index_order(self) -> np.ndarray:
        if self.sampler is not None:
            return self.sampler.indices(self.epoch)
        if self.shuffle:
            rng = np.random.default_rng([self.seed, self.epoch])
            return rng.permutation(len(self.dataset))
        return np.arange(len(self.dataset))

    def __iter__(self) -> Iterator[dict]:
        order = self._index_order()
        n_batches = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(n_batches)
        ]
        if self.num_workers <= 0 or n_batches == 0:
            for b in batches:
                yield _collate([self.dataset[int(i)] for i in b])
            return
        if self.num_workers == 1:
            yield from self._iter_threaded(batches)
            return
        try:
            yield from self._iter_pool(batches)
        except OSError:  # fork unavailable (restricted sandbox): degrade gracefully
            yield from self._iter_threaded(batches)

    def _iter_threaded(self, batches) -> Iterator[dict]:
        """Single prefetch thread — enough when decode is cheap (pkl/npy in RAM)."""
        q: "queue.Queue" = queue.Queue(maxsize=4)
        stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(_collate([self.dataset[int(i)] for i in b]))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    def _iter_pool(self, batches) -> Iterator[dict]:
        """num_workers forked decode processes; round-robin batch assignment with
        in-order reassembly (mirrors torch DataLoader semantics: worker count
        never changes the batch stream)."""
        ctx = mp.get_context("fork")
        n_workers = min(self.num_workers, len(batches))
        result_q = ctx.Queue(maxsize=2 * n_workers)

        def worker(wid: int):
            # the fork inherits the parent's signal handlers; a flag-setting
            # SIGTERM handler (e.g. the train CLI's preemption hook) would make
            # the parent's terminate() a no-op and leak the worker
            signal.signal(signal.SIGTERM, signal.SIG_DFL)
            try:
                for j in range(wid, len(batches), n_workers):
                    items = [self.dataset[int(i)] for i in batches[j]]
                    result_q.put((j, _collate(items)))
                result_q.put((-1, wid))
            except KeyboardInterrupt:
                pass
            finally:
                # skip atexit handlers: the forked child inherits the parent's
                # accelerator runtime state and must not tear it down
                result_q.close()
                result_q.join_thread()
                os._exit(0)

        procs = [ctx.Process(target=worker, args=(w,), daemon=True) for w in range(n_workers)]
        for p in procs:
            p.start()
        pending: dict = {}
        next_j, done = 0, 0
        try:
            while next_j < len(batches):
                while next_j not in pending:
                    j, payload = result_q.get()
                    if j < 0:
                        done += 1
                        if done == n_workers and next_j not in pending and len(pending) == 0:
                            raise RuntimeError("decode workers exited before finishing")
                        continue
                    pending[j] = payload
                yield pending.pop(next_j)
                next_j += 1
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
            for p in procs:
                p.join(timeout=5)
            for p in procs:  # decode workers never hold device state: safe to kill
                if p.is_alive():
                    p.kill()
                    p.join(timeout=5)


def create_dataloader(dataset, dataset_opt: dict, sampler=None, num_replicas: int = 1):
    """Train/val dataloader construction matching data/__init__.py:7-25."""
    phase = dataset_opt.get("phase", "train")
    if phase == "train":
        batch_size = max(dataset_opt.get("batch_size", 16) // num_replicas, 1)
        return DataLoader(
            dataset,
            batch_size=batch_size,
            shuffle=sampler is None and dataset_opt.get("use_shuffle", True),
            drop_last=True,
            num_workers=dataset_opt.get("n_workers", 1),
            sampler=sampler,
            seed=dataset_opt.get("seed", 0),
        )
    return DataLoader(dataset, batch_size=1, shuffle=False, num_workers=0)
