"""Checkpointing + experiment-directory conventions.

Replaces the reference's pickle snapshots (`amed training_loop.py:246-257`,
`sfd:331-342`) and the `@persistent_class` source-embedding system
(`torch_utils/persistence.py`): parameters are saved as flat .npz pytrees and
every run config is a JSON sidecar (SURVEY.md 5.4 recommendation) -- nothing
executable is ever embedded in a checkpoint.

Also provides the `exps/00000-desc` auto-incrementing run-dir convention
(`amed train.py:120-128`) and lookup-by-number (`amed sample.py:149-163`).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = ["save_params", "load_params", "save_config", "load_config",
           "create_run_dir", "find_run_dir", "flatten_params", "unflatten_params"]

_SEP = "/"


def flatten_params(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(path: str, params: Dict, **aux_trees) -> None:
    """Save one or more pytrees into a single .npz (main tree under 'params',
    extra trees under their kwarg name)."""
    flat = {f"params{_SEP}{k}": v for k, v in flatten_params(params).items()}
    for name, tree in aux_trees.items():
        flat.update({f"{name}{_SEP}{k}": v
                     for k, v in flatten_params(tree).items()})
    np.savez(path, **flat)


def load_params(path: str) -> Dict[str, Dict]:
    """Returns {tree_name: pytree}."""
    with np.load(path) as f:
        flat = {k: f[k] for k in f.files}
    roots: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in flat.items():
        root, rest = k.split(_SEP, 1)
        roots.setdefault(root, {})[rest] = v
    return {root: unflatten_params(sub) for root, sub in roots.items()}


def save_config(path: str, config: Any) -> None:
    if dataclasses.is_dataclass(config):
        config = dataclasses.asdict(config)
    with open(path, "w") as f:
        json.dump(config, f, indent=2, default=str)


def load_config(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)


def create_run_dir(base: str, desc: str) -> str:
    """exps/<5-digit-id>-<desc>/ with auto-increment (amed train.py:120-128).

    Multi-host: the id is chosen on process 0 and broadcast so every
    process agrees on the path (a per-process listing could race with
    process 0's mkdir and split-brain the run); only process 0 creates
    the directory."""
    import jax

    multi = jax.process_count() > 1
    os.makedirs(base, exist_ok=True)
    prev = [re.match(r"^(\d{5})-", d) for d in os.listdir(base)]
    ids = [int(m.group(1)) for m in prev if m]
    run_id = max(ids, default=-1) + 1
    if multi:
        import numpy as np
        from jax.experimental import multihost_utils

        run_id = int(multihost_utils.broadcast_one_to_all(np.int32(run_id)))
    run_dir = os.path.join(base, f"{run_id:05d}-{desc}")
    if not multi or jax.process_index() == 0:
        os.makedirs(run_dir, exist_ok=multi)
    return run_dir


def find_run_dir(base: str, number: int) -> Optional[str]:
    """Lookup run dir by experiment number (amed sample.py:149-163)."""
    if not os.path.isdir(base):
        return None
    for d in sorted(os.listdir(base)):
        m = re.match(r"^(\d{5})-", d)
        if m and int(m.group(1)) == number:
            return os.path.join(base, d)
    return None
