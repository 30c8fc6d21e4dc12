"""Host-side batched loader with threaded decode + prefetch.

Reference parity: utils.py::{get_all_data_loaders, get_data_loader_folder}
(torch DataLoader with num_workers fork processes). TPU-native version:
a thread pool decodes PIL images (libjpeg releases the GIL) into a bounded
prefetch queue of stacked uint8 numpy batches; randomized augmentation is
NOT done here — it happens on-device (ondevice.py).
"""

from __future__ import annotations

import os
import queue
import threading
import zlib
from typing import Iterator

import numpy as np

from councilx.config import Config
from councilx.data.dataset import (ImageFilelistDataset, ImageFolderDataset,
                                   SyntheticImageDataset)


class DataLoader:
    """Infinite (train) or single-epoch (eval) uint8 batch iterator."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True,
                 infinite: bool = True, seed: int = 0, prefetch: int = 4,
                 shard_index: int = 0, shard_count: int = 1,
                 start_batch: int = 0):
        # start_batch > 0 = resume fast-forward: the index stream is
        # deterministic (fixed seed), so a resumed run would otherwise
        # REPLAY the batches the checkpointed run already consumed. Skipping
        # is index arithmetic only (whole epochs cost one permutation draw
        # each, no decode), so the resumed stream continues exactly where
        # the original left off.
        # shard_count > 1 = multi-host input partitioning (SURVEY.md §5.8):
        # every process draws the SAME shuffled index stream (same seed) and
        # takes its own disjoint batch_size-row slice of each global batch
        # of batch_size * shard_count rows — hosts never load the same image
        # into one global batch.
        if not (0 <= shard_index < shard_count):
            raise ValueError(f"shard_index {shard_index} out of range for "
                             f"shard_count {shard_count}")
        if shard_count > 1 and not drop_last:
            raise ValueError("sharded loading requires drop_last=True "
                             "(a ragged final global batch would leave some "
                             "shards short)")
        if len(dataset) < batch_size * shard_count and drop_last:
            raise ValueError(
                f"dataset of {len(dataset)} images smaller than the global "
                f"batch {batch_size} x {shard_count} shards")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.infinite = infinite
        self.seed = seed
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.start_batch = int(start_batch)
        # native C++ decode path (councilx/data/native): used when the
        # dataset is a plain image folder at new_size with no crop override;
        # PIL thread pool remains the fallback (and the parity path)
        self._native = None
        if (isinstance(dataset, ImageFolderDataset)
                and dataset.crop in (None, dataset.new_size)
                and not dataset.return_paths):
            try:
                from councilx.data.native import NativeImageLoader
                self._native = NativeImageLoader(
                    dataset.paths, dataset.new_size, threads=self.num_workers)
            except Exception:
                self._native = None

    def __len__(self) -> int:
        gbs = self.batch_size * self.shard_count
        n = len(self.dataset) // gbs
        if not self.drop_last and len(self.dataset) % gbs:
            n += 1
        return n

    def _index_stream(self, start: int = None) -> Iterator[np.ndarray]:
        rng = np.random.RandomState(self.seed)
        gbs = self.batch_size * self.shard_count
        off = self.shard_index * self.batch_size
        skip = self.start_batch if start is None else int(start)
        while True:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                idx = rng.permutation(idx)
            lim = (len(idx) // gbs * gbs if self.drop_last else len(idx))
            per_epoch = -(-lim // gbs) if lim else 0
            if skip >= per_epoch and self.infinite and per_epoch:
                skip -= per_epoch  # skip the whole epoch; keep rng in sync
                continue
            for s in range(0, lim, gbs):
                if skip:
                    skip -= 1
                    continue
                yield idx[s + off:s + off + self.batch_size]
            if not self.infinite:
                return

    def head_rows(self, n: int) -> np.ndarray:
        """The first ``n`` rows of the epoch-0 stream (ignoring
        ``start_batch``), decoded synchronously — NO producer thread.

        For fixtures that must not consume or race the training stream:
        display batches and eval inputs. Unlike ``next(iter(loader))``,
        this (a) is identical before and after a resume fast-forward, and
        (b) leaves no abandoned producer thread blocked on a full
        prefetch queue. Caps at one epoch of this shard's rows."""
        n = min(n, len(self) * self.batch_size or len(self.dataset))
        rows = []
        stream = self._index_stream(start=0)
        for _ in range(max(len(self), 1)):
            for i in next(stream).tolist():
                rows.append(self.dataset[i])
                if len(rows) == n:
                    return np.stack(rows)
        return np.stack(rows)

    def __iter__(self) -> Iterator[np.ndarray]:
        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # never block forever on a full queue: an abandoned consumer
            # (generator GC'd, train() returned) sets stop in its finally,
            # and the producer must exit instead of pinning a thread pool
            # plus `prefetch` decoded batches for the process lifetime
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # any failure must reach the consumer as an exception, never as
            # a dead producer + a consumer blocked on q.get() forever
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for batch_idx in self._index_stream():
                        if stop.is_set():
                            return
                        batch = None
                        if self._native is not None:
                            try:
                                batch = self._native.load_batch(batch_idx)
                            except IOError:
                                batch = None  # corrupt file -> PIL fallback
                        if batch is None:
                            arrs = list(pool.map(self.dataset.__getitem__,
                                                 batch_idx.tolist()))
                            batch = np.stack(arrs)
                        if not put_or_stop(batch):
                            return
                put_or_stop(None)
            except BaseException as e:  # noqa: BLE001
                put_or_stop(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()


def get_all_data_loaders(cfg: Config, synthetic: bool = False,
                         synthetic_size: int = 64,
                         batch_size: int = None, shard_index: int = 0,
                         shard_count: int = 1, start_batch: int = 0):
    """Reference: utils.py::get_all_data_loaders -> (train_a, train_b,
    test_a, test_b).

    Expects the reference folder layout under ``cfg.data.data_root``:
    trainA/ trainB/ testA/ testB/. ``synthetic=True`` substitutes
    deterministic synthetic data (tests, benchmarks, smoke runs).

    Multi-host: pass ``batch_size`` = this process's share of the global
    batch and ``shard_index``/``shard_count`` = (process index, process
    count). The train loaders then share ONE shuffled index stream and each
    host loads a disjoint slice of every global batch (SURVEY.md §5.8
    per-host input pipeline). Eval loaders are never sharded — each host
    sees the full test split (display batches are broadcast from process 0
    anyway).
    """
    d = cfg.data
    bs = batch_size or cfg.batch_size

    def make(split: str, train: bool):
        if synthetic:
            # crc32, NOT hash(): str hash is PYTHONHASHSEED-salted, which
            # would give every process (and every invocation) different
            # "deterministic" synthetic data
            ds = SyntheticImageDataset(synthetic_size, d.new_size,
                                       seed=zlib.crc32(split.encode())
                                       % (2 ** 31))
        else:
            # reference get_all_data_loaders supports both folder configs
            # (data_root + trainA/...) and filelist configs
            # (data_list_train_a: path-to-list). Keys live in cfg.extras.
            list_key = {"trainA": "data_list_train_a",
                        "trainB": "data_list_train_b",
                        "testA": "data_list_test_a",
                        "testB": "data_list_test_b"}[split]
            flist = cfg.extras.get(list_key)
            if flist:
                ds = ImageFilelistDataset(d.data_root, flist,
                                          new_size=d.new_size)
            else:
                ds = ImageFolderDataset(os.path.join(d.data_root, split),
                                        new_size=d.new_size)
        # per-split seeds: trainA and trainB must shuffle INDEPENDENTLY
        # (the reference's two DataLoaders do) — a shared seed would pair
        # A[i] with B[i] in every batch forever when the domains have equal
        # sizes. crc32, not hash(): PYTHONHASHSEED-independent, so every
        # multi-host process derives the same per-split stream.
        return DataLoader(ds, bs, shuffle=train,
                          num_workers=d.num_workers, infinite=train,
                          seed=zlib.crc32(split.encode()) % (2 ** 31),
                          # a test split smaller than the batch must not
                          # refuse to load; the ragged tail batch is kept
                          drop_last=train,
                          shard_index=shard_index if train else 0,
                          shard_count=shard_count if train else 1,
                          # resume fast-forward: continue the deterministic
                          # train stream where the checkpointed run stopped
                          start_batch=start_batch if train else 0)

    return (make("trainA", True), make("trainB", True),
            make("testA", False), make("testB", False))
