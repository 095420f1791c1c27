"""Throughput benchmark: CIFAR-10 EDM SongUNet sampling, images/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N, ...}

The reference publishes no throughput numbers (SURVEY.md section 6), so
vs_baseline is computed against an ANALYTIC A100 estimate documented here:
  * flops/image/NFE taken from XLA's compiled cost analysis,
  * A100 roofline: 312 TFLOP/s bf16 peak x 40% realistic UNet utilization
    (A100_EFF_TFLOPS below).
The headline metric is NFE=35 (iPNDM, num_steps=36) -- the reference's
high-quality operating point; NFE 5/10 are reported alongside.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_EFF_TFLOPS = 312e12 * 0.40


def main():
    from diff_sampler_tpu.models.precond import EDMPrecond, bind
    from diff_sampler_tpu.ops import get_schedule
    from diff_sampler_tpu.solvers import get_sampler

    dev = jax.devices()[0]
    # EDM CIFAR-10 DDPM++ architecture, bf16 inner compute.
    kwargs = dict(model_channels=128, channel_mult=[2, 2, 2], num_blocks=4,
                  attn_resolutions=[16], dropout=0.0)
    net = EDMPrecond(img_resolution=32, img_channels=3, label_dim=0,
                     model_type="SongUNet", model_kwargs=kwargs,
                     dtype=jnp.bfloat16)
    params = jax.jit(net.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                               jnp.ones((1,)))["params"]
    den = bind(net, params)

    # flops per single denoiser eval (per image) from XLA cost analysis
    batch_probe = 8
    fwd = jax.jit(lambda p, x, s: net.apply({"params": p}, x, s))
    lowered = fwd.lower(params, jnp.zeros((batch_probe, 32, 32, 3)),
                        jnp.ones((batch_probe,)))
    try:
        cost = lowered.compile().cost_analysis()
        flops_per_image = float(cost.get("flops", 0.0)) / batch_probe
    except Exception:
        flops_per_image = 0.0

    results = {}
    batch = 512
    for label, solver, num_steps in [("nfe5", "ipndm", 6), ("nfe10", "ipndm", 11),
                                     ("nfe35", "ipndm", 36)]:
        t_steps = get_schedule(num_steps, den.sigma_min, den.sigma_max,
                               "polynomial", 7.0)
        fn = jax.jit(lambda lat, n=num_steps, t=t_steps:
                     get_sampler("ipndm")(den, lat, t).x)
        lat = jax.device_put(
            jax.random.normal(jax.random.key(1), (batch, 32, 32, 3)), dev)
        fn(lat).block_until_ready()  # compile
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(lat)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        results[label] = batch / dt

    nfe = 35
    value = results["nfe35"]
    a100_est = (A100_EFF_TFLOPS / (flops_per_image * nfe)) if flops_per_image else None
    print(json.dumps({
        "metric": "cifar10_edm_songunet_images_per_sec_per_chip_nfe35",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / a100_est, 3) if a100_est else None,
        "baseline_note": "A100 analytic roofline estimate (312 TF bf16 x 0.40)",
        "a100_estimate": round(a100_est, 2) if a100_est else None,
        "flops_per_image_per_nfe": flops_per_image,
        "batch": batch,
        "nfe5_imgs_per_sec": round(results["nfe5"], 2),
        "nfe10_imgs_per_sec": round(results["nfe10"], 2),
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
