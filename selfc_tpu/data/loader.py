"""Dataset / dataloader factories (reference data/__init__.py:7-61).

The loader is a thread-pool prefetcher producing numpy batches
``(B, T, H, W, 3)`` — host-side work only; device placement happens in the
train/eval step. Per-rank batch splitting follows the reference rule
``batch_size // world_size`` (data/__init__.py:13-14).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .datasets import (
    LQGTVIDAugDataset,
    LQGTVIDBicubicDataset,
    LQGTVIDConsecutiveDataset,
    LQGTVIDDataset,
    LQGTVIDSRDataset,
)


def create_dataset(dataset_opt):
    mode = dataset_opt["mode"]
    if mode == "LQGTVID":
        return LQGTVIDDataset(dataset_opt)
    if mode == "LQGTVID_Aug":
        return LQGTVIDAugDataset(dataset_opt)
    if mode == "LQGTVID_packed":
        from .packed import LQGTVIDPackedDataset

        return LQGTVIDPackedDataset(dataset_opt)
    if mode in ("LQGTVID_Conseutive", "LQGTVID_Consecutive"):
        return LQGTVIDConsecutiveDataset(dataset_opt)
    if mode == "LQGTVID_SR":
        return LQGTVIDSRDataset(dataset_opt)
    if mode == "LQGTVID_bicubic":
        return LQGTVIDBicubicDataset(dataset_opt)
    if mode == "UVG":
        from .uvg_dataset import UVGDataset

        return UVGDataset(dataset_opt)
    if mode == "LQ":
        from .image_datasets import LQDataset

        return LQDataset(dataset_opt)
    if mode == "LQGT":
        from .image_datasets import LQGTDataset

        return LQGTDataset(dataset_opt)
    if mode == "LRHR_seg_bg":
        from .image_datasets import LRHRSegBGDataset

        return LRHRSegBGDataset(dataset_opt)
    raise NotImplementedError(f"dataset mode {mode!r} not recognized")


def _collate(items):
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals, axis=0)
        else:
            out[k] = vals
    return out


class DataLoader:
    """Minimal prefetching loader: batches, optional shuffling/sampler,
    drop_last for training."""

    def __init__(
        self,
        dataset,
        batch_size=1,
        shuffle=False,
        sampler=None,
        num_workers=4,
        drop_last=False,
        seed=0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self._epoch = 0
        self._seed = seed
        self._pool = None  # persistent across epochs (see __iter__)

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self._seed + self._epoch)
            rng.shuffle(idx)
        return idx.tolist()

    def __iter__(self):
        self._epoch += 1
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        q: queue.Queue = queue.Queue(maxsize=2 * self.num_workers)
        stop = threading.Event()

        # One executor for the loader's LIFETIME, and at most 2*num_workers
        # futures in flight with each future reference dropped as soon as
        # its batch is handed to the queue. The original per-epoch pattern
        # (submit ALL batches up front, keep the futures list) retained
        # every consumed batch's result until epoch end — ~22 GB live per
        # 6k-iter epoch at the reference train shape — and the per-epoch
        # executor churn (fresh threads -> fresh glibc arenas holding the
        # sawtooth peaks) ratcheted host RSS to an OOM kill at 131 GB
        # ~90 min into a long run.
        if self._pool is None:
            self._pool = ThreadPoolExecutor(self.num_workers)
        pool = self._pool

        def produce():
            from collections import deque

            inflight: deque = deque()
            it = iter(batches)

            def submit_next():
                b = next(it, None)
                if b is not None:
                    try:
                        inflight.append(pool.submit(
                            lambda b=b: _collate([self.dataset[i] for i in b])
                        ))
                    except RuntimeError:
                        # interpreter/executor shutting down mid-epoch (e.g.
                        # SIGTERM-graceful trainer exit): stop producing
                        # instead of spraying "cannot schedule new futures"
                        # tracebacks into every run log
                        stop.set()

            for _ in range(2 * self.num_workers):
                submit_next()
            while inflight:
                if stop.is_set():
                    break
                f = inflight.popleft()
                try:
                    item = f.result()
                except Exception as e:  # surface worker errors
                    item = e
                del f  # drop the result reference before blocking on put
                q.put(item)
                submit_next()
            for f in inflight:
                f.cancel()
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # unblock a producer parked on a full queue so it can observe
            # stop, cancel its tail, and exit (early epoch exit)
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass

    def close(self):
        """Shut the persistent worker pool down (daemon-threaded; tests
        call this for cleanliness)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None


def _proc_worker_main(dataset, task_q, res_q, seed):
    """Worker loop for ProcessDataLoader (module-level for spawn)."""
    import random as _random

    r = getattr(dataset, "rng", None)
    if isinstance(r, _random.Random):
        r.seed(seed)
    if getattr(dataset, "np_rng", None) is not None:
        dataset.np_rng = np.random.default_rng(seed)
    while True:
        task = task_q.get()
        if task is None:
            break
        gen, bi, batch_idx = task
        try:
            res_q.put((gen, bi, _collate([dataset[i] for i in batch_idx])))
        except Exception as e:  # surface worker errors to the consumer
            res_q.put((gen, bi, e))


class ProcessDataLoader(DataLoader):
    """Process-based loader: PNG decode + augmentation run in separate
    processes so they never contend with the main process's GIL/dispatch
    (the thread-pool loader is GIL-bound on cv2 decode). Batches are
    re-ordered to the deterministic index order. Equivalent of the
    reference's torch DataLoader worker processes (data/__init__.py:16-19)
    with persistent_workers semantics: workers spawn ONCE on first
    iteration and survive epoch boundaries — per-epoch spawn costs seconds
    on a small host and showed up as a ~250 ms/step loader wait on short
    synthetic epochs. Results carry an epoch-generation tag so batches
    left in flight by an early-exited epoch are dropped, not replayed.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._procs = None
        self._task_q = None
        self._res_q = None
        self._gen = 0

    def _ensure_workers(self):
        import multiprocessing as mp

        if self._procs is not None and all(p.is_alive() for p in self._procs):
            return
        # spawn: never fork a process that may hold XLA/jax state
        ctx = mp.get_context("spawn")
        self._task_q = ctx.Queue()
        self._res_q = ctx.Queue(maxsize=4 * self.num_workers)
        self._procs = [
            ctx.Process(
                target=_proc_worker_main,
                args=(self.dataset, self._task_q, self._res_q,
                      self._seed + 977 * self._epoch + w),
                daemon=True,
            )
            for w in range(self.num_workers)
        ]
        for p in self._procs:
            p.start()

    def __iter__(self):
        self._epoch += 1
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if not batches:
            return

        self._ensure_workers()
        self._gen += 1
        gen = self._gen
        for bi, b in enumerate(batches):
            self._task_q.put((gen, bi, b))
        try:
            pending = {}
            nxt = 0
            while nxt < len(batches):
                rgen, bi, item = self._res_q.get()
                if rgen != gen:  # in-flight leftover of an early exit
                    continue
                pending[bi] = item
                while nxt in pending:
                    out = pending.pop(nxt)
                    nxt += 1
                    if isinstance(out, Exception):
                        raise out
                    yield out
        finally:
            # early exit: un-started tasks of this epoch must not burn
            # worker time (stale RESULTS are filtered by the gen tag)
            import queue as _queue

            try:
                while True:
                    self._task_q.get_nowait()
            except (_queue.Empty, OSError, ValueError):
                pass

    def close(self):
        """Shut the persistent workers down (daemon procs die with the
        main process anyway; tests call this for cleanliness)."""
        if not self._procs:
            return
        for _ in self._procs:
            self._task_q.put(None)
        for p in self._procs:
            p.join(timeout=5)
        for p in self._procs:
            if p.is_alive():
                p.terminate()
                p.join(timeout=5)
        self._procs = None


def create_dataloader(dataset, dataset_opt, opt=None, sampler=None):
    phase = dataset_opt["phase"]
    use_proc = bool(dataset_opt.get("use_process_loader"))
    cls = ProcessDataLoader if use_proc else DataLoader
    if phase == "train":
        world_size = (opt or {}).get("world_size") or 1
        num_workers = (dataset_opt["n_workers"] or 2) * len(
            dataset_opt.get("gpu_ids") or [1]
        )
        batch_size = (dataset_opt["batch_size"] or 1) // world_size
        shuffle = sampler is None and bool(dataset_opt["use_shuffle"])
        return cls(
            dataset,
            batch_size=batch_size,
            shuffle=shuffle,
            sampler=sampler,
            num_workers=num_workers,
            drop_last=True,
        )
    return cls(
        dataset,
        batch_size=dataset_opt["batch_size"] or 1,
        shuffle=False,
        num_workers=8,
    )
