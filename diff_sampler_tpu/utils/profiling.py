"""Profiling / observability helpers.

The reference's tooling is wall-clock tick fields + CUDA peak-memory counters
(`amed training_loop.py:225-237`) and a module-summary table
(`torch_utils/misc.py:198-268`).  TPU equivalents (SURVEY.md 5.1):
jax.profiler traces, block_until_ready timing, device memory_stats, and a
param-count table over a flax pytree.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np

__all__ = ["Timer", "trace", "device_memory_stats", "print_param_summary",
           "assert_shape"]


class Timer:
    """Tick timing: sec/tick, sec/kimg (training_loop.py:225-233)."""

    def __init__(self):
        self.start_time = time.time()
        self.tick_start = self.start_time
        self.tick_start_nimg = 0

    def tick(self, cur_nimg: int) -> Dict[str, float]:
        now = time.time()
        out = {
            "total_sec": now - self.start_time,
            "sec_per_tick": now - self.tick_start,
            "sec_per_kimg": (now - self.tick_start) * 1000.0
            / max(cur_nimg - self.tick_start_nimg, 1),
        }
        self.tick_start = now
        self.tick_start_nimg = cur_nimg
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard/perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Dict[str, float]:
    """HBM usage in GiB (replaces torch.cuda.max_memory_allocated,
    training_loop.py:234-236)."""
    device = device or jax.local_devices()[0]
    stats = device.memory_stats() or {}
    gib = 1 << 30
    return {
        "bytes_in_use_gib": stats.get("bytes_in_use", 0) / gib,
        "peak_bytes_in_use_gib": stats.get("peak_bytes_in_use", 0) / gib,
        "bytes_limit_gib": stats.get("bytes_limit", 0) / gib,
    }


def print_param_summary(params, max_rows: int = 40) -> int:
    """Parameter table + total count (misc.print_module_summary analogue)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    rows = []
    for path, leaf in flat:
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += n
        rows.append((jax.tree_util.keystr(path), tuple(getattr(leaf, "shape", ())), n))
    for name, shape, n in rows[:max_rows]:
        print(f"{name:<60s} {str(shape):<24s} {n:>12,d}")
    if len(rows) > max_rows:
        print(f"... ({len(rows) - max_rows} more)")
    print(f"{'TOTAL':<60s} {'':<24s} {total:>12,d}")
    return total


def assert_shape(x, shape) -> None:
    """Shape assert with None wildcards (torch_utils/misc.py:81-96)."""
    if x.ndim != len(shape):
        raise AssertionError(f"rank {x.ndim} != expected {len(shape)}")
    for i, (a, b) in enumerate(zip(x.shape, shape)):
        if b is not None and a != b:
            raise AssertionError(f"dim {i}: {a} != expected {b} (shape {x.shape})")
