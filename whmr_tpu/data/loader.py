"""Threaded host-side batch loader with device prefetch.

Replaces torch DataLoader + DistributedSampler (reference core/trainer.py:
129-143): worker threads run the numpy augmentation pipeline, batches are
assembled and handed to the device ahead of time. Multi-host sharding uses
`jax.process_index()` striding (each host reads a disjoint slice of the
epoch permutation) — the mesh-native version of DistributedSampler.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        num_hosts: int = 1,
        host_index: int = 0,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.num_hosts = num_hosts
        self.host_index = host_index
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        self.start_batch = 0

    def set_epoch(self, epoch: int):
        """Reshuffle per epoch (reference sampler.set_epoch, trainer.py:324)."""
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def set_start_batch(self, n: int):
        """Mid-epoch resume: the next iteration skips the first n batches at
        the INDEX level (no decode/augment work for skipped samples — an
        itertools.islice over the live iterator would still run the full
        pipeline for every skipped sample). Single-use: resets after one
        epoch."""
        self.start_batch = int(n)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        rng = np.random.RandomState(self.seed + self.epoch)
        idx = rng.permutation(n) if self.shuffle else np.arange(n)
        # per-host disjoint stride (DistributedSampler equivalent)
        return idx[self.host_index::self.num_hosts]

    def __len__(self):
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        n_batches = len(self)
        sample_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.batch_size)
        stop = threading.Event()

        work = list(indices[: n_batches * self.batch_size]) if self.drop_last else list(indices)
        if self.start_batch:
            work = work[self.start_batch * self.batch_size:]
            n_batches = max(n_batches - self.start_batch, 0)
            self.start_batch = 0
        work_iter = iter(enumerate(work))
        lock = threading.Lock()

        def worker():
            while not stop.is_set():
                with lock:
                    try:
                        pos, idx = next(work_iter)
                    except StopIteration:
                        return
                try:
                    sample = self.dataset[int(idx)]
                except Exception as e:  # noqa: BLE001 — surface as sentinel
                    sample = e
                sample_q.put((pos, sample))

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            buffer: Dict[int, Dict] = {}
            next_pos = 0
            total = len(work)
            for _ in range(n_batches):
                # final batch may be partial when drop_last=False
                want = min(self.batch_size, total - next_pos)
                batch_samples = []
                while len(batch_samples) < want:
                    while next_pos not in buffer:
                        pos, sample = sample_q.get()
                        if isinstance(sample, Exception):
                            raise sample
                        buffer[pos] = sample
                    batch_samples.append(buffer.pop(next_pos))
                    next_pos += 1
                yield {
                    k: np.stack([s[k] for s in batch_samples])
                    for k in batch_samples[0]
                }
        finally:
            stop.set()
            # drain to unblock workers
            while not sample_q.empty():
                try:
                    sample_q.get_nowait()
                except queue.Empty:
                    break


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Overlap host batch assembly with device compute: keep `size` batches
    in flight as device arrays (replaces DataLoader prefetch_factor)."""
    import jax

    buf = []
    for batch in iterator:
        if sharding is not None:
            batch = jax.device_put(batch, sharding)
        else:
            batch = jax.device_put(batch)
        buf.append(batch)
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
