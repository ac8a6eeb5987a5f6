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
    LQGTVIDBicubicDataset,
    LQGTVIDConsecutiveDataset,
    LQGTVIDDataset,
    LQGTVIDSRDataset,
)


def create_dataset(dataset_opt):
    mode = dataset_opt["mode"]
    if mode == "LQGTVID":
        return LQGTVIDDataset(dataset_opt)
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

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [
                    pool.submit(lambda b=b: _collate([self.dataset[i] for i in b]))
                    for b in batches
                ]
                for f in futures:
                    if stop.is_set():
                        f.cancel()
                        continue
                    try:
                        q.put(f.result())
                    except Exception as e:  # surface worker errors
                        q.put(e)
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


def create_dataloader(dataset, dataset_opt, opt=None, sampler=None):
    phase = dataset_opt["phase"]
    if phase == "train":
        world_size = (opt or {}).get("world_size") or 1
        num_workers = (dataset_opt["n_workers"] or 2) * len(
            dataset_opt.get("gpu_ids") or [1]
        )
        batch_size = (dataset_opt["batch_size"] or 1) // world_size
        shuffle = sampler is None and bool(dataset_opt["use_shuffle"])
        return DataLoader(
            dataset,
            batch_size=batch_size,
            shuffle=shuffle,
            sampler=sampler,
            num_workers=num_workers,
            drop_last=True,
        )
    return DataLoader(
        dataset,
        batch_size=dataset_opt["batch_size"] or 1,
        shuffle=False,
        num_workers=8,
    )
