"""64px-tier throughput: FFHQ-64 EDM SongUNet and ImageNet-64 DhariwalUNet
sampling on one chip (BASELINE configs 2/3; VERDICT r2 weak #2 asked for
perf breadth beyond CIFAR).

Prints one JSON line per model with img/s/chip at NFE 5/10/35 and model-level
MXU% (XLA cost-analysis flops / wall time vs the v5e 197 TFLOP/s bf16 peak).
Methodology matches bench.py: chained iterations, >=3 s windows, bf16 inner
compute, uncontended chip (BENCH_NOTES.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

V5E_PEAK = 197e12


def bench_model(name, dataset_name, batch):
    from diff_sampler_tpu.models.factory import build_edm_model
    from diff_sampler_tpu.models.precond import bind
    from diff_sampler_tpu.ops import get_schedule
    from diff_sampler_tpu.solvers import get_sampler

    dev = jax.devices()[0]
    net = build_edm_model(dataset_name, dtype=jnp.bfloat16)
    res, chn = net.img_resolution, net.img_channels
    label_dim = net.label_dim
    lab = (jnp.eye(label_dim, dtype=jnp.float32)[
        jnp.arange(batch) % label_dim] if label_dim else None)
    init_args = [jax.random.key(0), jnp.zeros((1, res, res, chn)),
                 jnp.ones((1,))]
    if label_dim:
        init_args.append(jnp.zeros((1, label_dim)))
    params = jax.jit(net.init)(*init_args)["params"]
    den = bind(net, params, class_labels=lab) if label_dim else bind(net, params)

    probe = 8
    fwd = jax.jit(lambda p, x, s: net.apply(
        {"params": p}, x, s, lab[:probe] if label_dim else None))
    lowered = fwd.lower(params, jnp.zeros((probe, res, res, chn)),
                        jnp.ones((probe,)))
    try:
        flops_per_image = float(
            lowered.compile().cost_analysis().get("flops", 0.0)) / probe
    except Exception:
        flops_per_image = 0.0

    out = {"metric": f"{name}_images_per_sec_per_chip", "batch": batch,
           "flops_per_image_per_nfe": flops_per_image}
    params = jax.device_put(params, dev)
    for label, num_steps in [("nfe5", 6), ("nfe10", 11), ("nfe35", 36)]:
        t_steps = get_schedule(num_steps, den.sigma_min, den.sigma_max,
                               "polynomial", 7.0)

        # params enter as a jit ARGUMENT: closing over them embeds ~300M
        # f32 constants into the serialized HLO, which the axon
        # remote-compile service rejects with HTTP 413 (body length limit)
        @jax.jit
        def fn(p, lat, t=t_steps):
            d = (bind(net, p, class_labels=lab) if label_dim
                 else bind(net, p))
            res_x = get_sampler("ipndm")(d, lat, t).x
            return lat + jnp.mean(res_x) * 1e-12

        lat = jax.device_put(
            jax.random.normal(jax.random.key(1), (batch, res, res, chn)), dev)
        lat = fn(params, lat)
        float(jnp.mean(lat))  # warmup + fence (see run())

        # delta-rep timing (BENCH_NOTES methodology): (t(hi)-t(lo))/(hi-lo)
        # cancels the axon tunnel's per-dispatch overhead and any residual
        # warmup -- a naive 3-rep loop once reported 72k img/s for this model
        def run(reps):
            # fence by fetching a scalar data-dependent on the whole chain:
            # block_until_ready under-reports over the axon tunnel
            # (BENCH_NOTES "Timing-harness fence fix")
            nonlocal lat
            t0 = time.perf_counter()
            for _ in range(reps):
                lat = fn(params, lat)
            float(jnp.mean(lat))
            return time.perf_counter() - t0

        # median of 3 independent (lo, hi) delta pairs: a single slow low
        # anchor (tunnel hiccup / stray recompile) once produced a 341k
        # img/s artifact for this model -- one bad pair can't win a median
        lo_r, hi_r = 1, max(3, round(90 / num_steps))
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
                100.0 * ips * flops_per_image * nfe / V5E_PEAK, 1)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ffhq"):
        bench_model("ffhq64_edm_songunet", "ffhq", batch=128)
    if which in ("all", "imagenet64"):
        bench_model("imagenet64_edm_adm", "imagenet64", batch=64)
