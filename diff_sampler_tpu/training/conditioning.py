"""Caption/context conditioning for SD-tier training (ms_coco).

The reference draws random captions from the MS-COCO 30k CSV each iteration
and encodes them with the checkpoint's CLIP text tower
(`amed-solver-main/training/training_loop.py:118-126,173-180`,
`sfd-main/training/training_loop.py:168-178`); the CFG unconditional context
is the empty-string encoding (amed training_loop.py:175-177, sfd :230-231).

Without captions or a text encoder (random-init smoke runs), both fall back
to seeded random contexts of the right shape so training-path code stays
exercisable offline.
"""

from __future__ import annotations

import csv
import os
from typing import Callable, Optional, Tuple

import numpy as np

__all__ = ["load_captions", "make_caption_context_fn", "make_uncond_context"]

CLIP_SEQ_LEN = 77  # CLIP text tower context length


def load_captions(prompts_path: Optional[str]) -> Optional[list]:
    """MS-COCO captions CSV with a 'text' column -> list[str].

    None path -> None (caller falls back to smoke mode); a GIVEN path that
    does not exist raises -- a typo'd --prompts_path must not silently
    train on random contexts."""
    if not prompts_path:
        return None
    if not os.path.isfile(prompts_path):
        raise FileNotFoundError(
            f"captions CSV not found: {prompts_path!r} (omit --prompts_path "
            f"entirely for the seeded-random smoke mode)")
    with open(prompts_path) as f:
        return [row["text"] for row in csv.DictReader(f)]


def _ctx_dim(ld) -> int:
    return ld.unet.context_dim or 768


def make_caption_context_fn(ld, prompts_path: Optional[str], batch: int,
                            seed: int, verbose: bool = True) -> Callable:
    """Per-iteration caption context sampler: it -> [batch, 77, D] float32.

    Real mode needs both a captions CSV and a bound text encoder; otherwise
    seeded random contexts (smoke mode)."""
    captions = load_captions(prompts_path)
    dim = _ctx_dim(ld)
    if captions is None or ld.cond_stage_fn is None:
        if verbose:
            from ..parallel.mesh import print0

            print0("WARNING: no captions/text encoder -- using seeded random "
                   "contexts (smoke mode)")

        def random_ctx(it):
            rng = np.random.RandomState((seed + it) % (1 << 31))
            return rng.randn(batch, CLIP_SEQ_LEN, dim).astype(np.float32)

        return random_ctx

    if verbose:
        from ..parallel.mesh import print0

        print0(f"Loaded {len(captions)} captions from {prompts_path}")

    def encode_ctx(it):
        rng = np.random.RandomState((seed + it) % (1 << 31))
        texts = [captions[i] for i in rng.randint(len(captions), size=batch)]
        return np.asarray(ld.get_learned_conditioning(texts), np.float32)

    return encode_ctx


def make_uncond_context(ld, mb: int, guidance_rate: float,
                        seed: int = 0) -> Optional[np.ndarray]:
    """Empty-string CFG context [mb, 77, D], or None when guidance is off
    (guidance_rate == 1.0 never doubles the batch, networks_edm.py:747-752).
    Smoke mode (no encoder): a fixed seeded stand-in."""
    if guidance_rate == 1.0:
        return None
    dim = _ctx_dim(ld)
    if ld.cond_stage_fn is None:
        rng = np.random.RandomState(seed)
        one = rng.randn(1, CLIP_SEQ_LEN, dim).astype(np.float32)
        return np.broadcast_to(one, (mb, CLIP_SEQ_LEN, dim)).copy()
    return np.asarray(ld.get_learned_conditioning(mb * [""]), np.float32)
