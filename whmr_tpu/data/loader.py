"""Host-side batch loader (threads or processes) with device prefetch.

Replaces torch DataLoader + DistributedSampler (reference core/trainer.py:
129-143): workers run the numpy augmentation pipeline, batches are
assembled and handed to the device ahead of time. Multi-host sharding uses
`jax.process_index()` striding (each host reads a disjoint slice of the
epoch permutation) — the mesh-native version of DistributedSampler.

Two worker modes:
- threads (default): zero-copy, but the augment pipeline is numpy-heavy
  and GIL-bound — measured ceiling ~2x single-thread regardless of
  thread count (scripts/bench_loader.py), far below the 470 crops/s the
  aux-on B=64 train step consumes on a v5e chip.
- processes (`num_procs > 0`): fork-based workers like torch DataLoader's
  (reference trains this way); scales with physical cores. Batch order
  and contents are IDENTICAL to thread mode because every sample draws
  from its own per-(seed, epoch, index) rng stream (npz_dataset.py) —
  asserted by tests/test_data.py.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np


def _proc_worker(dataset, idx_q, out_q):
    """Worker-process loop: pull (pos, idx), push (pos, sample | error)."""
    while True:
        task = idx_q.get()
        if task is None:
            return
        pos, idx = task
        try:
            sample = dataset[int(idx)]
        except Exception as e:  # noqa: BLE001 — surface as sentinel
            sample = RuntimeError(f"dataset[{idx}] failed: {e!r}")
        out_q.put((pos, sample))


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
        num_procs: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.num_procs = int(num_procs)
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
        work = list(indices[: n_batches * self.batch_size]) if self.drop_last else list(indices)
        if self.start_batch:
            work = work[self.start_batch * self.batch_size:]
            n_batches = max(n_batches - self.start_batch, 0)
            self.start_batch = 0
        if self.num_procs > 0:
            yield from self._iter_procs(work, n_batches)
        else:
            yield from self._iter_threads(work, n_batches)

    def _assemble(self, get_sample, total: int, n_batches: int):
        """Order-restoring collation shared by both worker modes."""
        buffer: Dict[int, Dict] = {}
        next_pos = 0
        for _ in range(n_batches):
            # final batch may be partial when drop_last=False
            want = min(self.batch_size, total - next_pos)
            batch_samples = []
            while len(batch_samples) < want:
                while next_pos not in buffer:
                    pos, sample = get_sample()
                    if isinstance(sample, Exception):
                        raise sample
                    buffer[pos] = sample
                batch_samples.append(buffer.pop(next_pos))
                next_pos += 1
            yield {
                k: np.stack([s[k] for s in batch_samples])
                for k in batch_samples[0]
            }

    def _iter_threads(self, work, n_batches: int):
        sample_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.batch_size)
        stop = threading.Event()
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
            yield from self._assemble(sample_q.get, len(work), n_batches)
        finally:
            stop.set()
            # drain to unblock workers
            while not sample_q.empty():
                try:
                    sample_q.get_nowait()
                except queue.Empty:
                    break

    def _iter_procs(self, work, n_batches: int):
        """Fork-based worker processes (torch-DataLoader-style): the GIL
        caps the threaded augment pipeline at ~2x single-core; forked
        workers scale with physical cores. The dataset is inherited by
        fork (no per-item pickling of state; samples come back through an
        OS pipe). Bounded index queue keeps in-flight samples ~prefetch
        batches."""
        import multiprocessing as mp

        ctx = mp.get_context("fork")
        idx_q = ctx.Queue()
        out_q = ctx.Queue(maxsize=max(2, self.prefetch) * self.batch_size)
        procs = [
            ctx.Process(
                target=_proc_worker, args=(self.dataset, idx_q, out_q),
                daemon=True,
            )
            for _ in range(self.num_procs)
        ]
        for p in procs:
            p.start()
        for task in enumerate(work):
            idx_q.put(task)
        for _ in procs:
            idx_q.put(None)

        def get_sample():
            # Liveness watchdog: a worker killed by the OS (OOM, cv2
            # segfault) never posts its claimed (pos, sample); a bare
            # out_q.get() would then hang training forever mid-epoch.
            # torch DataLoader guards the same case with a SIGCHLD watchdog.
            while True:
                try:
                    return out_q.get(timeout=10.0)
                except queue.Empty:
                    dead = [p.pid for p in procs if not p.is_alive()
                            and p.exitcode not in (0, None)]
                    if dead:
                        raise RuntimeError(
                            f"loader worker process(es) died: pids {dead} "
                            f"(exitcodes {[p.exitcode for p in procs]}); "
                            "likely OOM or a native crash in decode/augment"
                        )
                    if not any(p.is_alive() for p in procs) and out_q.empty():
                        raise RuntimeError(
                            "all loader workers exited but samples are "
                            "still missing — results lost in a worker"
                        )

        try:
            yield from self._assemble(get_sample, len(work), n_batches)
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
            for p in procs:
                p.join(timeout=5)


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
