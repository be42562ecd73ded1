"""Profiling & throughput counters — new capability vs the reference
(SURVEY §5: the reference only wall-clocks fit).

- ``ThroughputMeter``: edges/nodes/graphs per second over train steps.
- ``trace``: context manager around ``jax.profiler`` producing TensorBoard
  traces of XLA execution on TPU.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np


class ThroughputMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self._steps = 0
        self._edges = 0
        self._nodes = 0
        self._graphs = 0

    def start(self):
        self._t0 = time.perf_counter()

    def step(self, batch) -> None:
        """Count a processed GraphBatch (uses real counts, not padding)."""
        if self._t0 is None:
            self.start()
        self._steps += 1
        self._edges += int(np.asarray(batch.edge_mask).sum())
        self._nodes += int(np.asarray(batch.node_mask).sum())
        self._graphs += int(np.asarray(batch.globals["graph_mask"]).sum())

    def report(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - (self._t0 or time.perf_counter()), 1e-9)
        return {
            "steps_per_s": self._steps / dt,
            "edges_per_s": self._edges / dt,
            "nodes_per_s": self._nodes / dt,
            "graphs_per_s": self._graphs / dt,
            "elapsed_s": dt,
        }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace", create_perfetto_link: bool = False):
    """jax.profiler trace context for TPU kernel-level inspection."""
    import jax
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, int]:
    import jax
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
