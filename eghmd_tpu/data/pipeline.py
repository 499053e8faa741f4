"""Prefetching host->device input pipeline.

The reference feeds the GPU through a torch DataLoader with (by default) ZERO
workers (reference args.py:39, train.py:214-223) and pays a host round trip
every batch. Here: a thread pool assembles samples (the per-sample EDT/augment
CPU work), batches are collated to pinned numpy, and a double-buffered
prefetcher overlaps ``jax.device_put`` (sharded over the mesh's 'data' axis)
with TPU compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np
import jax

from .sample import Sample


def collate(samples) -> dict:
    """Stack a list of Samples into a dict of batched arrays (NHWC)."""
    out = {}
    for field in Sample._fields:
        out[field] = np.stack([getattr(s, field) for s in samples], axis=0)
    return out


class Subset:
    """First-``n`` view over any sample dataset.

    Backs the ``--overfit N`` smoke check (reference train.py:208-212
    truncates the image lists in place); works uniformly for synthetic and
    H5 datasets.
    """

    def __init__(self, dataset, n: int):
        self.dataset = dataset
        self.n = max(1, min(int(n), len(dataset)))

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if not 0 <= i < self.n:
            raise IndexError(i)
        return self.dataset[i]


class ListDataset:
    """Indexable dataset over an in-memory list of Samples (e.g. teacher
    pseudo-labeled real frames, ``training.distill.pseudo_label_real_samples``)."""

    def __init__(self, samples):
        self.samples = list(samples)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


class ConcatDataset:
    """Concatenation of sample datasets (mixes freely under the pipeline's
    epoch shuffle — used to blend real pseudo-labeled frames into a
    synthetic training set)."""

    def __init__(self, *datasets):
        self.datasets = datasets
        self._offsets = np.cumsum([len(d) for d in datasets])

    def __len__(self):
        return int(self._offsets[-1]) if len(self.datasets) else 0

    def __getitem__(self, i):
        if not 0 <= i < len(self):
            raise IndexError(i)
        d = int(np.searchsorted(self._offsets, i, side="right"))
        prev = int(self._offsets[d - 1]) if d else 0
        return self.datasets[d][i - prev]


class DataPipeline:
    """Iterable over device-resident batches with background prefetch.

    Parameters
    ----------
    dataset: indexable returning Sample
    batch_size: global batch size (must divide by mesh data-axis size)
    sharding: optional jax.sharding.Sharding to place batches with
    shuffle/seed/drop_last: epoch iteration controls (drop_last=True matches
        the reference loaders, train.py:214-223)
    """

    def __init__(self, dataset, batch_size: int, sharding=None, shuffle=True,
                 seed: int = 0, drop_last: bool = True, num_workers: int = 8,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sharding = sharding
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        """Pin the shuffle epoch so a resumed run reproduces the exact batch
        order of the uninterrupted run (the trainer calls this per epoch)."""
        self._epoch = int(epoch)

    def _index_order(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            return rng.permutation(n)
        return np.arange(n)

    def _batches_host(self) -> Iterator[dict]:
        order = self._index_order()
        nb = len(self)
        with ThreadPoolExecutor(self.num_workers) as pool:
            # pipeline batch assembly: submit a window of batches ahead
            futures = []

            def submit(bi):
                idxs = order[bi * self.batch_size:(bi + 1) * self.batch_size]
                futures.append(pool.submit(
                    lambda ii: collate([self.dataset[int(i)] for i in ii]), idxs
                ))

            window = self.num_workers
            for bi in range(min(window, nb)):
                submit(bi)
            nxt = min(window, nb)
            for bi in range(nb):
                batch = futures[bi].result()
                if nxt < nb:
                    submit(nxt)
                    nxt += 1
                yield batch
        self._epoch += 1

    def __iter__(self) -> Iterator[dict]:
        """Yield device-resident batches, one batch of host work ahead."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for batch in self._batches_host():
                    if self.sharding is not None:
                        batch = jax.device_put(batch, self.sharding)
                    else:
                        batch = jax.device_put(batch)
                    q.put(batch)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()
