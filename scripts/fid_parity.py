"""Real-checkpoint FID parity harness (north-star #1).

Reproduces the reference's headline numbers (`diff-solvers-main/
README.md:120-157`) with THIS framework: load the reference's own
pre-trained EDM checkpoint, sample 50k images with iPNDM at NFE 5/10/35,
compute FID against the authors' reference statistics with the NVIDIA
Inception detector, and print measured-vs-published deltas (target: within
0.05).

OFFLINE STATUS (recorded 2026-08-16, round 2): this build/bench environment
has NO network egress (nvlabs-fi-cdn unreachable; see BENCH_NOTES.md "FID
parity status"), and no checkpoint, detector pkl, or reference-stats npz is
cached anywhere on disk.  This script is therefore ready-to-run but blocked
on artifacts.  To run it, place these three files (or let open_url download
them when online):

  * edm-cifar10-32x32-uncond-vp.pkl   (models/zoo.py CHECKPOINT_URLS['cifar10'])
  * inception-2015-12-05.pkl          (diff-solvers-main/fid.py:34)
  * cifar10-32x32.npz                 (https://nvlabs-fi-cdn.nvidia.com/edm/fid-refs/)

into ./src, ./models, or ./checkpoints, then:

  python scripts/fid_parity.py --dataset=cifar10 --num=50000

The entire pipeline BELOW the download is pinned offline by tests:
per-layer torch->flax weight parity (tests/test_model_parity.py), full
image-level pipeline parity at NFE 35 (tests/test_pipeline_parity.py), the
detector import path (tests/test_inception_import.py), and FID moment
accumulation (tests/test_eval.py).
"""

import json
import os
import sys

import click
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Published reference FID (diff-solvers-main/README.md:130, iPNDM poly-7).
PUBLISHED = {
    "cifar10": {5: 13.59, 6: 7.05, 10: 2.77, 35: 1.94},
    "ffhq": {5: 17.17, 10: 3.98},
}

STATS_URLS = {
    "cifar10": "https://nvlabs-fi-cdn.nvidia.com/edm/fid-refs/cifar10-32x32.npz",
    "ffhq": "https://nvlabs-fi-cdn.nvidia.com/edm/fid-refs/ffhq-64x64.npz",
}

LOCAL_ROOTS = ("src", "models", "checkpoints")


def _find_local(fname):
    for root in LOCAL_ROOTS:
        p = os.path.join(root, fname)
        if os.path.isfile(p):
            return p
    return None


def _resolve(fname, url, what):
    p = _find_local(fname)
    if p:
        return p
    from diff_sampler_tpu.utils.common import open_url

    try:
        # fail fast when offline (default is 10 retry attempts)
        with open_url(url, num_attempts=1) as f:
            return f.name
    except Exception as e:
        raise click.ClickException(
            f"BLOCKED: cannot obtain {what} ({fname}): {type(e).__name__}: {e}\n"
            f"This environment has no network egress. Place the file in one "
            f"of {LOCAL_ROOTS} and re-run (see module docstring).")


@click.command()
@click.option("--dataset", default="cifar10", type=click.Choice(list(PUBLISHED)))
@click.option("--num", default=50000, help="images per FID (10k/30k/50k)")
@click.option("--nfes", default="5,10,35", help="comma-separated NFE points")
@click.option("--batch", default=256)
@click.option("--out", default=None, help="write JSON results here")
def main(dataset, num, nfes, batch, out):
    import jax.numpy as jnp

    from diff_sampler_tpu import sampling
    from diff_sampler_tpu.eval.fid import (FIDAccumulator, compute_fid,
                                           load_stats)
    from diff_sampler_tpu.eval.inception import (InceptionV3FID,
                                                 import_nvidia_inception_pickle)
    from diff_sampler_tpu.models import factory, zoo
    from diff_sampler_tpu.sampling import SolverConfig

    # 1. Artifacts (the only step not pinned by offline tests).
    ckpt = _resolve(os.path.basename(zoo.CHECKPOINT_URLS[dataset]),
                    zoo.CHECKPOINT_URLS[dataset], "EDM checkpoint")
    det = _resolve("inception-2015-12-05.pkl",
                   "https://api.ngc.nvidia.com/v2/models/nvidia/research/"
                   "stylegan3/versions/1/files/metrics/inception-2015-12-05.pkl",
                   "NVIDIA Inception detector")
    stats = _resolve(os.path.basename(STATS_URLS[dataset]),
                     STATS_URLS[dataset], "reference FID stats")

    # 2. Model + detector.
    click.echo(f"Loading {dataset} checkpoint: {ckpt}")
    net, params, _source = factory.create_model(dataset, model_path=ckpt)
    from diff_sampler_tpu.models.precond import bind

    den = bind(net, params)
    click.echo(f"Importing detector: {det}")
    det_params, report = import_nvidia_inception_pickle(det)
    click.echo(f"  import mode: {report['mode']}, "
               f"unused tensors: {len(report['unused'])}")
    detector = InceptionV3FID(tf_preprocessing=True)

    import jax

    feature_fn = jax.jit(lambda im: detector.apply({"params": det_params}, im))
    mu_ref, sigma_ref = load_stats(stats)

    spec = zoo.MODEL_SPECS[dataset]
    res = spec[1]
    results = {}
    for nfe in [int(s) for s in nfes.split(",")]:
        num_steps = nfe + 1  # ipndm: NFE = num_steps - 1
        cfg = SolverConfig(solver="ipndm", num_steps=num_steps,
                           schedule_type="polynomial", schedule_rho=7.0)
        click.echo(f"Sampling {num} images @ NFE {nfe} (ipndm, poly-7)...")
        acc = FIDAccumulator()
        for start in range(0, num, batch):
            n = min(batch, num - start)
            imgs = sampling.generate(den, range(start, start + n),
                                     (res, res, 3), cfg,
                                     max_batch_size=batch,
                                     dtype=jnp.float32)
            acc.update(feature_fn(jnp.asarray(sampling.to_uint8(imgs))))
        mu, sigma = acc.finalize()
        fid = compute_fid(mu, sigma, mu_ref, sigma_ref)
        pub = PUBLISHED[dataset].get(nfe)
        delta = None if pub is None else fid - pub
        results[nfe] = {"fid": fid, "published": pub, "delta": delta}
        click.echo(f"  NFE {nfe}: FID {fid:.4f}"
                   + (f"  (published {pub}, delta {delta:+.4f}, "
                      f"{'PASS' if abs(delta) <= 0.05 else 'FAIL'} at 0.05)"
                      if pub is not None else ""))

    if out:
        with open(out, "w") as f:
            json.dump({"dataset": dataset, "num": num, "results": results}, f,
                      indent=2)
        click.echo(f"Wrote {out}")


if __name__ == "__main__":
    main()
