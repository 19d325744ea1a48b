"""Loader wrappers: batching, multi-dataset scheduling, device prefetch.

TPU-native replacement for the reference loader stack
(reference: stllm/datasets/datasets/dataloader_utils.py):

  - ``DataLoader``      : torch-DataLoader-free batcher with a thread pool
                          (decode work is C++/cv2 and releases the GIL) and a
                          bounded prefetch queue;
  - ``MultiIterLoader`` : ratio sampling (:15-43);
  - ``MetaLoader``      : length-weighted shuffled schedule; the reference
                          broadcasts the order from rank 0 over NCCL (:57-71),
                          here every process derives the SAME order from a
                          shared seed — no collective needed;
  - ``IterLoader``      : infinite epoch-wrapping iterator (:165-200);
  - ``DevicePrefetcher``: the CUDA-stream PrefetchLoader (:84-149) becomes a
                          background thread issuing ``jax.device_put`` one
                          batch ahead (dispatch is async; transfer overlaps
                          compute).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class DataLoader:
    """Minimal map-style loader: shuffle, batch, collate, prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = True,
        num_workers: int = 4,
        drop_last: bool = True,
        seed: int = 42,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _index_batches(self) -> List[List[int]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        batches = [
            order[i:i + self.batch_size].tolist()
            for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        batches = self._index_batches()
        # not a context manager: an abandoned iterator would run the
        # executor's blocking shutdown inside GC (noisy on interpreter exit);
        # shut down explicitly without waiting instead
        pool = ThreadPoolExecutor(self.num_workers)
        try:
            pending = []
            bi = 0

            def submit(idxs):
                return [pool.submit(self.dataset.__getitem__, i) for i in idxs]

            while bi < len(batches) and len(pending) < self.prefetch:
                pending.append(submit(batches[bi]))
                bi += 1
            while pending:
                futures = pending.pop(0)
                samples = [f.result() for f in futures]
                if bi < len(batches):
                    pending.append(submit(batches[bi]))
                    bi += 1
                yield self.collate_fn(samples)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


class MultiIterLoader:
    """Ratio-weighted sampling over iterators (reference: :15-43)."""

    def __init__(self, loaders: Sequence, ratios: Optional[Sequence[float]] = None,
                 seed: int = 0):
        for loader in loaders:
            assert hasattr(loader, "__next__"), f"{loader} has no __next__"
        if ratios is None:
            ratios = [1.0] * len(loaders)
        total = float(sum(ratios))
        self.ratios = [r / total for r in ratios]
        self.loaders = list(loaders)
        self.rng = np.random.default_rng(seed)

    def __next__(self):
        idx = int(self.rng.choice(len(self.loaders), p=self.ratios))
        return next(self.loaders[idx])


class IterLoader:
    """Infinite epoch-wrapping iterator (reference: :165-200)."""

    def __init__(self, dataloader, use_distributed: bool = False):
        self._dataloader = dataloader
        self.iter_loader = iter(dataloader)
        self._use_distributed = use_distributed
        self._epoch = 0

    @property
    def epoch(self) -> int:
        return self._epoch

    def __next__(self):
        try:
            return next(self.iter_loader)
        except StopIteration:
            self._epoch += 1
            if hasattr(self._dataloader, "set_epoch"):
                self._dataloader.set_epoch(self._epoch)
            self.iter_loader = iter(self._dataloader)
            return next(self.iter_loader)

    def __iter__(self):
        return self

    def __len__(self) -> int:
        return len(self._dataloader)


class MetaLoader:
    """Length-weighted shuffled schedule over multiple loaders; every process
    derives the SAME order from ``seed`` (replaces the reference's rank-0
    NCCL broadcast, :57-71 — same-schedule guarantee without a collective)."""

    def __init__(self, loaders: Sequence, seed: int = 42):
        self.loaders = list(loaders)
        self.seed = seed
        self._round = 0
        self.iter_order = self._build_iter()

    def _build_iter(self) -> List[int]:
        order: List[int] = []
        for n, l in enumerate(self.loaders):
            order.extend([n] * len(l))
        rng = np.random.default_rng(self.seed + self._round)
        rng.shuffle(order)
        self._round += 1
        return order

    def __len__(self) -> int:
        return len(self.iter_order)

    def __iter__(self):
        """Runs indefinitely, reshuffling each pass (reference: :77-83)."""
        while True:
            for loader_idx in self.iter_order:
                yield next(self.loaders[loader_idx])
            self.iter_order = self._build_iter()


class DevicePrefetcher:
    """Background-thread device_put, one batch ahead (reference CUDA-stream
    PrefetchLoader, :84-149). ``put_fn`` defaults to sharded/plain
    jax.device_put of every array leaf."""

    def __init__(self, loader, put_fn: Optional[Callable] = None, depth: int = 2):
        import jax

        self.loader = loader
        self.put_fn = put_fn or (lambda batch: jax.tree_util.tree_map(
            jax.device_put, batch))
        self.depth = depth

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        DONE = object()

        def producer():
            try:
                for batch in self.loader:
                    q.put(self.put_fn(batch))
            finally:
                q.put(DONE)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is DONE:
                break
            yield item
        th.join()
