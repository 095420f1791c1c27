"""Latent-tier sampling throughput on one chip (BASELINE configs 4/5).

Covers the 274M LSUN-bedroom / FFHQ LDMs and the 860M Stable-Diffusion
ms_coco tier (reference basis: sfd-main/sample.py latent sampling over the
ldm codebase's torch U-Net; SD runs classifier-free guidance at rate 7.5,
doubling evals per step -- diff-solvers-main/sample.py:210-219 NFE rules).

Round 3 measured lsun_bedroom at 11.83 img/s @ NFE35 via a one-off inline
drive (commit 9cc1d03); this is the reproducible version, methodology
identical to scripts/bench_64px.py: params as jit ARGUMENTS (closing over
them embeds >1 GB of HLO constants -> remote-compile 413), chained
delta-rep timing with a scalar fence, median of 3 delta pairs, uncontended
chip.

Prints one JSON line per NFE point with img/s/chip and model-level MXU%.

  python -u scripts/ldm_bench.py lsun_bedroom_ldm 32
  python -u scripts/ldm_bench.py ms_coco 8
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

V5E_PEAK = 197e12


def bench_ldm(dataset_name="lsun_bedroom_ldm", batch=32):
    from diff_sampler_tpu.models.factory import build_ldm_model
    from diff_sampler_tpu.models.precond import bind
    from diff_sampler_tpu.ops import get_schedule
    from diff_sampler_tpu.solvers import get_sampler

    dev = jax.devices()[0]
    guided = dataset_name == "ms_coco"  # CFG at 7.5 (README.md run matrix)
    module, _ = build_ldm_model(dataset_name, "random",
                                guidance_rate=7.5 if guided else 1.0,
                                dtype=jnp.bfloat16)
    ld = module.latent_diffusion
    res, chn = module.img_resolution, module.img_channels
    params = ld.unet_params

    key = jax.random.key(1)
    cond = {}
    evals_per_step = 1
    if guided:
        # random caption context: throughput is weight/text-independent
        cond["condition"] = jax.random.normal(key, (batch, 77, 768)) * 0.3
        cond["unconditional_condition"] = jnp.zeros((1, 77, 768))
        evals_per_step = 2  # CFG doubles the batch per eval

    probe = 4
    if guided:
        fwd = jax.jit(lambda p, x, s, c: ld.unet.apply({"params": p}, x, s, c))
        lower_args = (params, jnp.zeros((probe, res, res, chn)),
                      jnp.ones((probe,)), jnp.zeros((probe, 77, 768)))
    else:
        fwd = jax.jit(lambda p, x, s: ld.unet.apply({"params": p}, x, s))
        lower_args = (params, jnp.zeros((probe, res, res, chn)),
                      jnp.ones((probe,)))
    try:
        flops_per_image = float(fwd.lower(*lower_args).compile()
                                .cost_analysis().get("flops", 0.0)) / probe
    except Exception:
        flops_per_image = 0.0

    out = {"metric": f"{dataset_name}_images_per_sec_per_chip",
           "batch": batch, "flops_per_image_per_eval": flops_per_image,
           "evals_per_step": evals_per_step}
    params = jax.device_put(params, dev)
    for label, num_steps in [("nfe5", 6), ("nfe10", 11), ("nfe35", 36)]:
        # latent tiers sample on the model's discrete schedule
        # (cli/sample.py:251-257)
        t_steps = get_schedule(num_steps, module.sigma_min, module.sigma_max,
                               "discrete", 1.0, sigma_fn=module.sigma,
                               sigma_inv_fn=module.sigma_inv)

        @jax.jit
        def fn(p, lat, t=t_steps):
            ld.unet_params = p  # late-bound by the dataclass precond
            d = bind(module, p, **cond)
            res_x = get_sampler("ipndm")(d, lat, t).x
            return lat + jnp.mean(res_x) * 1e-12

        lat = jax.device_put(
            jax.random.normal(key, (batch, res, res, chn)), dev)
        lat = fn(params, lat)
        float(jnp.mean(lat))  # warmup + fence

        def run(reps):
            nonlocal lat
            t0 = time.perf_counter()
            for _ in range(reps):
                lat = fn(params, lat)
            float(jnp.mean(lat))
            return time.perf_counter() - t0

        lo_r, hi_r = 1, max(3, round(60 / num_steps))
        deltas = []
        for _ in range(3):
            deltas.append((run(hi_r) - run(lo_r)) / (hi_r - lo_r))
        deltas = [d for d in deltas if d > 0] or deltas
        deltas.sort()
        dt = deltas[len(deltas) // 2]
        ips = batch / dt
        nfe = {"nfe5": 5, "nfe10": 10, "nfe35": 35}[label]
        out[f"{label}_imgs_per_sec"] = round(ips, 2)
        if flops_per_image:
            out[f"{label}_mxu_pct"] = round(
                100.0 * ips * flops_per_image * evals_per_step * nfe
                / V5E_PEAK, 1)
        print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    bench_ldm(sys.argv[1] if len(sys.argv) > 1 else "lsun_bedroom_ldm",
              int(sys.argv[2]) if len(sys.argv) > 2 else 32)
