"""Throughput benchmark: CIFAR-10 EDM SongUNet sampling, images/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N, ...}

The reference publishes no throughput numbers (SURVEY.md section 6), so
vs_baseline is computed against an ANALYTIC A100 estimate:
  * flops/image/NFE taken from XLA's compiled cost analysis,
  * primary basis (unchanged from round 1 for comparability): A100 bf16
    roofline 312 TFLOP/s x 40% utilization,
  * also reported: a TF32 basis (156 TFLOP/s x 40%) -- the reference
    actually samples CIFAR EDM in fp32 torch eager, where TF32 tensor cores
    are the realistic ceiling, so the bf16 basis overstates the A100.
Timing chains iterations (output folded into next input, one final D2H) per
BENCH_NOTES.md's axon-tunnel guidance.
"""

import json
import time

import jax
import jax.numpy as jnp

A100_BF16_EFF = 312e12 * 0.40
A100_TF32_EFF = 156e12 * 0.40


def _devices_with_timeout(seconds=300):
    """jax.devices() with a watchdog: the axon tunnel blocks indefinitely
    when the chip pool is unreachable -- better to emit a parseable error
    line than to stall the driver."""
    import threading

    out = {}

    def probe():
        try:
            out["devices"] = jax.devices()
        except Exception as e:  # pragma: no cover - backend-dependent
            out["error"] = repr(e)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(seconds)
    if "devices" in out:
        return out["devices"]
    raise TimeoutError(out.get(
        "error", f"jax.devices() did not return within {seconds}s "
                 f"(axon tunnel unreachable?)"))


def main():
    from diff_sampler_tpu.models.precond import EDMPrecond, bind
    from diff_sampler_tpu.ops import get_schedule
    from diff_sampler_tpu.solvers import get_sampler

    try:
        dev = _devices_with_timeout()[0]
    except TimeoutError as e:
        print(json.dumps({
            "metric": "cifar10_edm_songunet_images_per_sec_per_chip_nfe35",
            "value": 0.0,
            "unit": "images/sec/chip", "vs_baseline": 0.0, "error": str(e)}))
        return
    # EDM CIFAR-10 DDPM++ architecture, bf16 inner compute.
    kwargs = dict(model_channels=128, channel_mult=[2, 2, 2], num_blocks=4,
                  attn_resolutions=[16], dropout=0.0)
    net = EDMPrecond(img_resolution=32, img_channels=3, label_dim=0,
                     model_type="SongUNet", model_kwargs=kwargs,
                     dtype=jnp.bfloat16)
    params = jax.jit(net.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                               jnp.ones((1,)))["params"]
    sigma_min, sigma_max = net.sigma_min, net.sigma_max

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
    batch = 256
    params = jax.device_put(params, dev)
    for label, num_steps in [("nfe5", 6), ("nfe10", 11), ("nfe35", 36)]:
        t_steps = get_schedule(num_steps, sigma_min, sigma_max,
                               "polynomial", 7.0)

        @jax.jit
        def fn(p, lat, t=t_steps):
            # params as a jit ARGUMENT: closing over the 56M tree embeds
            # ~224 MB of HLO constants, which stalls the axon remote-compile
            # service (observed 2026-08-19; same class as BENCH_NOTES'
            # "remote-compile 413" on the LDM tiers)
            out = get_sampler("ipndm")(bind(net, p), lat, t).x
            # chain: fold a scalar of the output back into the next latents
            return lat + jnp.mean(out) * 1e-12

        lat = jax.device_put(
            jax.random.normal(jax.random.key(1), (batch, 32, 32, 3)), dev)
        lat = fn(params, lat)
        float(jnp.mean(lat))  # compile + warm; scalar fetch as fence --
        # block_until_ready alone under-reports over the axon tunnel
        # (BENCH_NOTES "Timing-harness fence fix")
        # keep every measurement window >= ~3 s: short-NFE calls need more
        # reps or host scheduling noise dominates (745 vs 580 img/s observed
        # at NFE5 with reps=3)
        reps = max(3, round(90 / num_steps))
        t0 = time.perf_counter()
        for _ in range(reps):
            lat = fn(params, lat)
        float(jnp.mean(lat))  # data-dependent scalar fence
        dt = (time.perf_counter() - t0) / reps
        results[label] = batch / dt

    nfe = 35
    value = results["nfe35"]
    if flops_per_image:
        a100_bf16 = A100_BF16_EFF / (flops_per_image * nfe)
        a100_tf32 = A100_TF32_EFF / (flops_per_image * nfe)
    else:
        a100_bf16 = a100_tf32 = None
    print(json.dumps({
        "metric": "cifar10_edm_songunet_images_per_sec_per_chip_nfe35",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / a100_bf16, 3) if a100_bf16 else None,
        "baseline_note": ("A100 analytic roofline (312 TF bf16 x 0.40); "
                          "TF32 basis + v5e-8 aggregate also reported"),
        "a100_bf16_estimate": round(a100_bf16, 2) if a100_bf16 else None,
        "a100_tf32_estimate": round(a100_tf32, 2) if a100_tf32 else None,
        "vs_a100_tf32": round(value / a100_tf32, 3) if a100_tf32 else None,
        "v5e8_aggregate_vs_a100_bf16":
            round(8 * value / a100_bf16, 2) if a100_bf16 else None,
        "flops_per_image_per_nfe": flops_per_image,
        "batch": batch,
        "nfe5_imgs_per_sec": round(results["nfe5"], 2),
        "nfe10_imgs_per_sec": round(results["nfe10"], 2),
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
