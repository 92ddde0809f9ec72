"""Batching + host→device prefetch.

Replaces the reference's feed_dict streaming (reference:
lib/network.py:331-338) and its first-epoch RAM cache
(lib/dataset.py:109-155) with an iterator that double-buffers device
transfers so H2D copies overlap compute — the BASELINE.json north-star
requirement.
"""

from __future__ import annotations

import collections
import itertools
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np


class BatchIterator:
    """Epoch iterator over an in-memory sample cache.

    `fetch(i)` produces sample dicts lazily on the first epoch (mirroring
    the reference's data_matrix cache, lib/dataset.py:109-155); later
    epochs permute the cached matrix in place.
    """

    def __init__(self, n_data: int, fetch: Callable[[int], Dict[str, np.ndarray]],
                 batch_size: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True,
                 transform: Optional[Callable] = None):
        self.n_data = n_data
        self.fetch = fetch
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # transform(batch, rng) applied per yielded batch, AFTER the
        # cache — augmentation stays fresh every epoch (data/augment.py)
        self.transform = transform
        self._rng = np.random.RandomState(seed)
        self._cache: Optional[Dict[str, np.ndarray]] = None

    def _ensure_cache(self):
        if self._cache is not None:
            return
        first = self.fetch(0)
        cache = {k: np.zeros((self.n_data,) + v.shape, v.dtype)
                 for k, v in first.items()}
        for k, v in first.items():
            cache[k][0] = v
        for i in range(1, self.n_data):
            s = self.fetch(i)
            for k, v in s.items():
                cache[k][i] = v
        self._cache = cache

    def __len__(self):
        if self.drop_last:
            return self.n_data // self.batch_size
        return -(-self.n_data // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._ensure_cache()
        order = (self._rng.permutation(self.n_data) if self.shuffle
                 else np.arange(self.n_data))
        stop = (self.n_data - self.n_data % self.batch_size
                if self.drop_last else self.n_data)
        for lo in range(0, stop, self.batch_size):
            sel = order[lo:lo + self.batch_size]
            batch = {k: v[sel] for k, v in self._cache.items()}
            yield (self.transform(batch, self._rng)
                   if self.transform else batch)


class StreamingIterator:
    """Infinite stream of freshly generated batches.

    Each epoch-sized pass yields `batches_per_epoch` batches built by
    `make_sample(rng)` — no cache, so synthetic training never sees the
    same frame twice (removes the fixed-epoch overfitting of the cached
    BatchIterator for procedural data).
    """

    def __init__(self, make_sample, batch_size: int,
                 batches_per_epoch: int = 50, seed: int = 0):
        self.make_sample = make_sample
        self.batch_size = batch_size
        self.batches_per_epoch = batches_per_epoch
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return self.batches_per_epoch

    def __iter__(self):
        for _ in range(self.batches_per_epoch):
            samples = [self.make_sample(self._rng)
                       for _ in range(self.batch_size)]
            yield {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Double-buffered host→device transfer.

    Eagerly enqueues `size` batches onto the device (optionally with a
    `jax.sharding.Sharding` for multi-chip layouts) so the H2D copy of
    batch k+1 overlaps the compute of batch k.
    """
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            batch = jax.device_put(batch, sharding)
        else:
            batch = jax.device_put(batch)
        queue.append(batch)

    it = iter(iterator)
    for b in itertools.islice(it, size):
        put(b)
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out
