"""Single-chip perf probe for the CIFAR-10 EDM SongUNet denoiser.

Measures ms/denoiser-eval for a set of variants (batch sizes, resample
implementations, dtype) by CHAINING iterations (output feeds next input)
per BENCH_NOTES.md's axon-tunnel timing guidance.  Used to drive the
round-2 conv-bound optimization work (VERDICT item 4).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, x, iters=8, warmup=2):
    """Chained timing: out of one call feeds the next; one final D2H."""
    fn = jax.jit(fn)
    y = fn(x)
    y.block_until_ready()  # compile + warm
    for _ in range(warmup - 1):
        y = fn(y)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    y.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="*", default=[256, 512, 1024])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--no-box-reshape", action="store_true",
                   help="A/B: use the depthwise-conv box resample path")
    args = p.parse_args()

    from diff_sampler_tpu.models import layers

    # A/B: default arm measures the reshape-based box resample, the flag
    # selects the depthwise-conv path (the production default).  The module
    # default is False, so BOTH arms must assign or the A/B is a no-op.
    layers.BOX_RESAMPLE_RESHAPE = not args.no_box_reshape

    from diff_sampler_tpu.models.precond import EDMPrecond

    kwargs = dict(model_channels=128, channel_mult=[2, 2, 2], num_blocks=4,
                  attn_resolutions=[16], dropout=0.0)
    net = EDMPrecond(img_resolution=32, img_channels=3, label_dim=0,
                     model_type="SongUNet", model_kwargs=kwargs,
                     dtype=jnp.bfloat16)
    params = jax.jit(net.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                               jnp.ones((1,)))["params"]

    flops_per_image = None
    for batch in args.batches:
        x0 = jax.random.normal(jax.random.key(1), (batch, 32, 32, 3))
        sigma = jnp.ones((batch,))

        def eval_fn(x):
            d = net.apply({"params": params}, x, sigma)
            return d.astype(jnp.float32)

        if flops_per_image is None:
            try:
                lowered = jax.jit(eval_fn).lower(x0)
                cost = lowered.compile().cost_analysis()
                flops_per_image = float(cost.get("flops", 0.0)) / batch
            except Exception:
                flops_per_image = 0.0

        dt = bench(eval_fn, x0, iters=args.iters)
        tf = flops_per_image * batch / dt / 1e12
        print(f"batch={batch:5d}  {dt*1e3:8.2f} ms/eval  "
              f"{batch/dt:8.1f} img/s/eval  {tf:6.1f} TF/s  "
              f"({tf/197*100:4.1f}% of 197 TF bf16 peak)")


if __name__ == "__main__":
    main()
