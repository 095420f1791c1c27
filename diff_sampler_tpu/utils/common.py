"""General utilities: EasyDict, tee Logger, time formatting, string-to-class
config instantiation, cached downloads.

Rebuilds the dnnlib layer (`diff-solvers-main/dnnlib/util.py`): EasyDict
(:39), Logger (:55), format_time (:138), construct_class_by_name (:300),
open_url (:395), set_cache_dir (:119).
"""

from __future__ import annotations

import hashlib
import importlib
import os
import sys
import time
import types
import urllib.request
from typing import Any, Optional

__all__ = ["EasyDict", "Logger", "format_time", "construct_class_by_name",
           "get_obj_by_name", "open_url", "set_cache_dir"]


class EasyDict(dict):
    """dict with attribute access (dnnlib/util.py:39-52)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


class Logger:
    """Tee stdout/stderr to a log file (dnnlib/util.py:55-116)."""

    def __init__(self, file_name: Optional[str] = None, file_mode: str = "w",
                 should_flush: bool = True):
        self.file = open(file_name, file_mode) if file_name else None
        self.should_flush = should_flush
        self.stdout = sys.stdout
        self.stderr = sys.stderr
        sys.stdout = self
        sys.stderr = self

    def write(self, text):
        if len(text) == 0:
            return
        if self.file is not None:
            self.file.write(text)
        self.stdout.write(text)
        if self.should_flush:
            self.flush()

    def flush(self):
        if self.file is not None:
            self.file.flush()
        self.stdout.flush()

    def close(self):
        self.flush()
        if sys.stdout is self:
            sys.stdout = self.stdout
        if sys.stderr is self:
            sys.stderr = self.stderr
        if self.file is not None:
            self.file.close()
            self.file = None


def format_time(seconds) -> str:
    """'1d 03h 04m' style (dnnlib/util.py:138-152)."""
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 60 * 60:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 24 * 60 * 60:
        return f"{s // (60*60)}h {(s // 60) % 60:02d}m {s % 60:02d}s"
    return f"{s // (24*60*60)}d {(s // (60*60)) % 24:02d}h {(s // 60) % 60:02d}m"


def get_obj_by_name(name: str) -> Any:
    """'pkg.module.Class' -> object (dnnlib/util.py:289-297)."""
    parts = name.split(".")
    for i in range(len(parts), 0, -1):
        try:
            module = importlib.import_module(".".join(parts[:i]))
            obj = module
            for p in parts[i:]:
                obj = getattr(obj, p)
            return obj
        except (ImportError, AttributeError):
            continue
    raise ImportError(f"cannot resolve object '{name}'")


def construct_class_by_name(*args, class_name: str = None, **kwargs) -> Any:
    """StyleGAN-style config instantiation (dnnlib/util.py:300-303)."""
    return get_obj_by_name(class_name)(*args, **kwargs)


_cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "diff_sampler_tpu")


def set_cache_dir(path: str) -> None:
    global _cache_dir
    _cache_dir = path


def open_url(url: str, num_attempts: int = 10, verbose: bool = True,
             cache: bool = True):
    """Download with retries + on-disk cache; returns an open binary file
    (dnnlib/util.py:395-466).  Raises RuntimeError in offline environments."""
    assert num_attempts >= 1
    if os.path.isfile(url):
        return open(url, "rb")
    os.makedirs(_cache_dir, exist_ok=True)
    fname = hashlib.md5(url.encode()).hexdigest() + "_" + os.path.basename(url)
    cache_path = os.path.join(_cache_dir, fname)
    if cache and os.path.isfile(cache_path):
        return open(cache_path, "rb")
    last_err = None
    for attempt in range(num_attempts):
        try:
            if verbose:
                print(f"Downloading {url} (attempt {attempt + 1})...")
            tmp = cache_path + ".tmp"
            urllib.request.urlretrieve(url, tmp)
            os.replace(tmp, cache_path)
            return open(cache_path, "rb")
        except Exception as e:  # pragma: no cover - network dependent
            last_err = e
            time.sleep(min(2**attempt, 30))
    raise RuntimeError(f"failed to download {url}: {last_err}")
