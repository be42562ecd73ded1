"""Async prefetching batch loader.

Replaces/extends ``kgcnn/io/loader.py:9`` (GraphBatchLoader keras Sequence):
builds GraphBatch objects on a background thread (host numpy) and prefetches
them to device while the TPU computes the previous step — host-side batch
assembly never blocks the accelerator.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np
import jax

from ..batch import GraphBatch, batch_graphs


class GraphBatchLoader:
    def __init__(self, graphs: Sequence[dict], batch_size: int,
                 shuffle: bool = True, seed: int = 0, prefetch: int = 2,
                 drop_last: bool = True, device_put: bool = True, **batch_kwargs):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.device_put = device_put
        self.batch_kwargs = batch_kwargs
        self._epoch = 0

    def __len__(self):
        n = len(self.graphs) // self.batch_size
        if not self.drop_last and len(self.graphs) % self.batch_size:
            n += 1
        return n

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.graphs))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[GraphBatch]:
        idx = self._indices()
        self._epoch += 1
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for start in range(0, len(idx), self.batch_size):
                    chunk = idx[start:start + self.batch_size]
                    if self.drop_last and len(chunk) < self.batch_size:
                        break
                    graphs = [dict(self.graphs[i]) for i in chunk]
                    kw = dict(self.batch_kwargs)
                    kw.setdefault("n_graph_pad", self.batch_size + 1)
                    b = batch_graphs(graphs, np_out=True, **kw)
                    q.put(b)
            except Exception as e:  # surface errors to consumer
                q.put(e)
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, Exception):
                raise item
            if self.device_put:
                item = jax.tree.map(
                    lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x,
                    item)
            yield item
