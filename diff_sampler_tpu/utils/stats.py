"""Training statistics: lock-free accumulation + periodic collection.

Rebuilds `torch_utils/training_stats.py`: report/report0 (:55,102) accumulate
[num, sum, sum-of-squares] per metric; Collector (:112,233-) snapshots
mean/std.  Cross-process sync (the reference all_reduces across ranks) uses
`jax.experimental.multihost_utils` when world_size > 1; in single-process
SPMD the device-side values are already global.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional

import jax
import numpy as np

__all__ = ["report", "report0", "Collector", "default_collector"]

_counters: Dict[str, np.ndarray] = {}


def report(name: str, value) -> None:
    """Accumulate a scalar/array into the named counter
    (training_stats.py:55-99)."""
    v = np.asarray(value, np.float64).ravel()
    if v.size == 0:
        return
    moments = np.array([v.size, v.sum(), np.square(v).sum()], np.float64)
    _counters[name] = _counters.get(name, np.zeros(3)) + moments


def report0(name: str, value) -> None:
    """Accumulate only on process 0 (training_stats.py:102-109)."""
    if jax.process_index() == 0:
        report(name, value)


class Collector:
    """Snapshot accumulated counters into mean/std/num, then reset
    (training_stats.py:112-230)."""

    def __init__(self):
        self._stats: Dict[str, np.ndarray] = {}

    def update(self) -> None:
        global _counters
        pending = _counters
        _counters = {}
        if jax.process_count() > 1:
            pending = _allgather_counters(pending)
        for name, m in pending.items():
            self._stats[name] = self._stats.get(name, np.zeros(3)) + m

    def names(self):
        return sorted(self._stats)

    def num(self, name) -> int:
        return int(self._stats.get(name, np.zeros(3))[0])

    def mean(self, name) -> float:
        m = self._stats.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        return float(m[1] / m[0])

    def std(self, name) -> float:
        m = self._stats.get(name)
        if m is None or m[0] < 2:
            return 0.0
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean**2, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {n: {"num": self.num(n), "mean": self.mean(n), "std": self.std(n)}
                for n in self.names()}

    def reset(self) -> None:
        self._stats = {}


def _allgather_counters(pending: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Merge counters across processes (the reference all_reduces a fixed
    name list, training_stats.py:127-148).  Name sets can DIFFER per process
    (report0 only accumulates on rank 0), so a fixed-shape array allgather
    would misalign; serialize each process's dict and merge the union."""
    from jax.experimental import multihost_utils

    payload = np.frombuffer(
        json.dumps({n: m.tolist() for n, m in pending.items()}).encode(),
        np.uint8)
    lens = np.asarray(multihost_utils.process_allgather(
        np.array([payload.size], np.int32))).ravel()
    buf = np.zeros(int(lens.max()), np.uint8)
    buf[: payload.size] = payload
    bufs = np.asarray(multihost_utils.process_allgather(buf))
    if bufs.ndim == 1:  # single process after all
        bufs, lens = bufs[None], lens[:1]
    merged: Dict[str, np.ndarray] = {}
    for rank in range(bufs.shape[0]):
        d = json.loads(bytes(bufs[rank, : lens[rank]].tobytes()).decode())
        for name, m in d.items():
            merged[name] = merged.get(name, np.zeros(3)) + np.asarray(m)
    return merged


default_collector = Collector()


class JsonlWriter:
    """Per-tick stats.jsonl dump (amed training_loop.py:264-269).

    Multi-host: only process 0 writes (collectors are already allgathered,
    so its records cover every process; the reference gates the same way,
    training_loop.py:264)."""

    def __init__(self, path: str):
        import jax

        self.file = open(path, "at") if jax.process_index() == 0 else None

    def write(self, collector: Collector, **extra) -> None:
        if self.file is None:
            return
        record = {k: v for k, v in collector.as_dict().items()}
        record.update(extra)
        record["timestamp"] = time.time()
        self.file.write(json.dumps(record) + "\n")
        self.file.flush()

    def close(self):
        if self.file is not None:
            self.file.close()
