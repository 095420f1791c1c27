"""Pre-trained checkpoint registry and resolver.

Rebuilds `torch_utils/download_util.py`: the 13-entry URL table (:6-19),
local-search across directories (:24-44), and `check_file_by_key` with
companion-artifact logic (classifier for imagenet256, VQ-f4 decoder for the
LDM models, MS-COCO prompt CSV for SD) (:79-113).

Checkpoints are the reference's own torch files; `load_checkpoint_params`
routes them through the restricted unpickler + name importer
(models/torch_import.py) -- no embedded code executes.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

from ..utils.common import open_url

__all__ = ["CHECKPOINT_URLS", "MODEL_SPECS", "check_file_by_key",
           "load_checkpoint_params"]

# Same artifacts as download_util.py:6-19.
CHECKPOINT_URLS: Dict[str, str] = {
    "cifar10": "https://nvlabs-fi-cdn.nvidia.com/edm/pretrained/edm-cifar10-32x32-uncond-vp.pkl",
    "ffhq": "https://nvlabs-fi-cdn.nvidia.com/edm/pretrained/edm-ffhq-64x64-uncond-vp.pkl",
    "afhqv2": "https://nvlabs-fi-cdn.nvidia.com/edm/pretrained/edm-afhqv2-64x64-uncond-vp.pkl",
    "imagenet64": "https://nvlabs-fi-cdn.nvidia.com/edm/pretrained/edm-imagenet-64x64-cond-adm.pkl",
    "lsun_bedroom": "https://openaipublic.blob.core.windows.net/consistency/edm_bedroom256_ema.pt",
    "imagenet256": "https://openaipublic.blob.core.windows.net/diffusion/jul-2021/256x256_diffusion.pt",
    "imagenet256-classifier": "https://openaipublic.blob.core.windows.net/diffusion/jul-2021/256x256_classifier.pt",
    "lsun_bedroom_ldm": "https://ommer-lab.com/files/latent-diffusion/lsun_bedrooms.zip",
    "ffhq_ldm": "https://ommer-lab.com/files/latent-diffusion/ffhq.zip",
    "vq-f4": "https://ommer-lab.com/files/latent-diffusion/vq-f4.zip",
    "ms_coco": "https://huggingface.co/runwayml/stable-diffusion-v1-5/resolve/main/v1-5-pruned-emaonly.ckpt",
    "prompts": "https://github.com/boomb0om/text2image-benchmark/releases/download/v0.0.1/MS-COCO_val2014_30k_captions.csv",
}

# dataset key -> (model_source, resolution, channels, label_dim) used by the
# model factory (diff-solvers-main/sample.py:76-121).
MODEL_SPECS = {
    "cifar10": ("edm", 32, 3, 0),
    "ffhq": ("edm", 64, 3, 0),
    "afhqv2": ("edm", 64, 3, 0),
    "imagenet64": ("edm", 64, 3, 1000),
    "lsun_bedroom": ("cm", 256, 3, 0),
    "imagenet256": ("adm", 256, 3, 1000),
    "lsun_bedroom_ldm": ("ldm", 64, 3, 0),
    "ffhq_ldm": ("ldm", 64, 3, 0),
    "ms_coco": ("sd", 64, 4, 1),
}

_COMPANIONS = {
    "imagenet256": ["imagenet256-classifier"],
    "lsun_bedroom_ldm": ["vq-f4"],
    "ffhq_ldm": ["vq-f4"],
    "ms_coco": ["prompts"],
}


def check_file_by_key(key: str, cache_dir: Optional[str] = None,
                      offline_roots: Tuple[str, ...] = ("src", "models",
                                                        "checkpoints")):
    """Resolve a checkpoint (and companions) to local paths, downloading into
    the cache when necessary (download_util.py:79-113).

    Returns (main_path, [companion_paths]).  Searches `offline_roots`
    relative to CWD first, mirroring the reference's cross-subproject local
    search (download_util.py:24-44)."""
    if key not in CHECKPOINT_URLS:
        raise KeyError(f"unknown checkpoint key '{key}'; "
                       f"known: {sorted(CHECKPOINT_URLS)}")

    def resolve(k: str) -> str:
        fname = os.path.basename(CHECKPOINT_URLS[k])
        for root in offline_roots:
            p = os.path.join(root, fname)
            if os.path.isfile(p):
                return p
        if cache_dir is not None:
            from ..utils import common

            common.set_cache_dir(cache_dir)
        with open_url(CHECKPOINT_URLS[k]) as f:
            return f.name

    main = resolve(key)
    companions = [resolve(c) for c in _COMPANIONS.get(key, [])]
    return main, companions


def load_checkpoint_params(path: str):
    """Load a reference torch checkpoint into a Flax param pytree."""
    from .torch_import import (load_torch_file, state_dict_to_params,
                               torch_state_dict)

    obj = load_torch_file(path)
    return state_dict_to_params(torch_state_dict(obj))
