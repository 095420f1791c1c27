"""CLIP score CLI, mirroring `diff-solvers-main/clip_score.py`:

  python -m diff_sampler_tpu.cli.clip_score --images=out/ \\
      [--captions=MS-COCO_val2014_30k_captions.csv] [--model=...]

Images are paired with captions in order (the reference generates image i
from caption i); the score is mean(100 * cosine).  The encoder checkpoint
downloads on first use (reference behavior); offline environments get a
clear error.
"""

from __future__ import annotations

import csv

import click
import numpy as np

from ..eval.clip_score import clip_score, make_hf_clip_encoders
from ..eval.dataset import ImageFolderDataset
from ..parallel.mesh import print0


def load_captions(path: str = None) -> list:
    """MS-COCO 30k caption CSV (sample.py:171-180); downloads via the zoo
    'prompts' key when no path is given."""
    if path is None:
        from ..models.zoo import check_file_by_key

        path, _ = check_file_by_key("prompts")
    captions = []
    with open(path, newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            captions.append(row["text"])
    return captions


@click.command()
@click.option("--images", "image_path", type=str, required=True)
@click.option("--captions", "caption_path", type=str, default=None)
@click.option("--batch", type=int, default=64)
@click.option("--model", "model_name", type=str,
              default="laion/CLIP-ViT-g-14-laion2B-s12B-b42K")
@click.option("--checkpoint", "checkpoint_path", type=str, default=None,
              help="Local OpenCLIP torch checkpoint (no-network path; the "
                   "reference's ViT-g-14 laion2b_s34b_b88k detector)")
def main(image_path, caption_path, batch, model_name, checkpoint_path):
    captions = load_captions(caption_path)
    ds = ImageFolderDataset(image_path)
    n = min(len(ds), len(captions))
    print0(f"Scoring {n} image/caption pairs...")
    if checkpoint_path:
        from ..eval.clip_score import make_openclip_encoders

        image_fn, text_fn = make_openclip_encoders(checkpoint_path)
    else:
        image_fn, text_fn = make_hf_clip_encoders(model_name)

    def batches():
        for s in range(0, n, batch):
            imgs = np.stack([ds[i][0] for i in range(s, min(s + batch, n))])
            yield imgs, captions[s : s + batch]

    score = clip_score(image_fn, text_fn, batches())
    print0(f"CLIP score: {score:.4f}")


if __name__ == "__main__":
    main()
