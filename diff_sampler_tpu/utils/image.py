"""Image saving: per-seed PNGs (subdirs of 1000) and grids.

Mirrors `diff-solvers-main/sample.py:303-316` (PNG writer) and the
torchvision make_grid/save_image usage for --grid=True.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

__all__ = ["save_images", "save_grid", "parse_int_list"]


def _to_pil(arr):
    import PIL.Image

    if arr.shape[-1] == 1:
        return PIL.Image.fromarray(arr[:, :, 0], "L")
    return PIL.Image.fromarray(arr, "RGB")


def save_images(images_uint8: np.ndarray, seeds: Sequence[int], outdir: str,
                subdirs: bool = True, workers: Optional[int] = None) -> None:
    """One PNG per seed; subdirectory per 1000 seeds (sample.py:310-316).

    Encodes/writes on a thread pool (zlib releases the GIL) so 50k-image
    deployment runs aren't serialized on host PNG IO; on single-CPU hosts
    the pool only adds overhead (measured 0.86 vs 0.62 s / 2000 PNGs), so
    the default worker count follows os.cpu_count()."""
    from concurrent.futures import ThreadPoolExecutor

    if workers is None:
        workers = min(8, os.cpu_count() or 1)

    paths = []
    for seed in seeds:
        d = (os.path.join(outdir, f"{int(seed) - int(seed) % 1000:06d}")
             if subdirs else outdir)
        os.makedirs(d, exist_ok=True)
        paths.append(os.path.join(d, f"{int(seed):06d}.png"))

    def write(args):
        img, path = args
        _to_pil(img).save(path)

    if workers <= 1 or len(paths) < 32:
        for a in zip(images_uint8, paths):
            write(a)
    else:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(write, zip(images_uint8, paths)))


def save_grid(images_uint8: np.ndarray, path: str,
              grid_w: Optional[int] = None) -> None:
    """Tile a batch into one PNG (the --grid=True eyeball smoke test)."""
    n, h, w, c = images_uint8.shape
    gw = grid_w or int(np.ceil(np.sqrt(n)))
    gh = int(np.ceil(n / gw))
    canvas = np.zeros((gh * h, gw * w, c), np.uint8)
    for i, img in enumerate(images_uint8):
        r, col = divmod(i, gw)
        canvas[r * h:(r + 1) * h, col * w:(col + 1) * w] = img
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    _to_pil(canvas).save(path)


def parse_int_list(s) -> list:
    """'1,2,5-10' -> [1,2,5,...,10] (sample.py:42-53)."""
    if isinstance(s, (list, tuple)):
        return list(s)
    import re

    out = []
    range_re = re.compile(r"^(\d+)-(\d+)$")
    for p in str(s).split(","):
        m = range_re.match(p)
        if m:
            out.extend(range(int(m.group(1)), int(m.group(2)) + 1))
        else:
            out.append(int(p))
    return out
