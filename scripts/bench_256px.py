"""256px pixel-tier sampling throughput on one chip (VERDICT r4 item 3).

Covers the two BASELINE pixel tiers that had never run on TPU:
  * CM LSUN-Bedroom 256 (consistency-models ADM U-Net behind CMPrecond,
    reference behavioral spec models/cm/unet.py:505 + networks_edm.py:504-552)
  * ADM ImageNet-256 with classifier guidance (CGPrecond computes the
    class-score gradient IN-GRAPH with jax.grad; the reference calls
    torch.autograd.grad inside forward, networks_edm.py:557-625,613-620) --
    this is the first on-chip exercise of that path.

Both were blocked in round 2 by the remote-compile stall; round 4
root-caused it (closing over params embeds them as HLO constants), so
params enter as jit ARGUMENTS here, with the precond closures rebuilt over
the traced tree inside the jitted fn (the same technique as bench.py and
scripts/ldm_bench.py).

Random weights: sampling throughput is weight-independent (same graph, same
flops); no 256px checkpoint is downloadable in this environment (egress
zero, BENCH_NOTES).

Methodology identical to scripts/bench_64px.py: bf16 inner compute,
chained delta-rep timing with a scalar data-dependent fence, median of 3
delta pairs, uncontended chip. Prints one JSON line per tier with
img/s/chip at NFE 5/10/35 and model-level MXU%.

  python -u scripts/bench_256px.py cm 16
  python -u scripts/bench_256px.py cg 8
"""

import copy
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

V5E_PEAK = 197e12


NFE_POINTS = [("nfe5", 6), ("nfe10", 11), ("nfe35", 36)]


def _time_sampler(make_fn, params, batch, res, chn, flops_per_image, out):
    from diff_sampler_tpu.ops import get_schedule

    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    for label, num_steps in NFE_POINTS:
        fn = make_fn(num_steps)
        lat = jax.device_put(
            jax.random.normal(jax.random.key(1), (batch, res, res, chn)), dev)
        lat = fn(params, lat)
        float(jnp.mean(lat))  # warmup + fence

        def run(reps):
            nonlocal lat
            t0 = time.perf_counter()
            for _ in range(reps):
                lat = fn(params, lat)
            float(jnp.mean(lat))
            return time.perf_counter() - t0

        lo_r, hi_r = 1, max(3, round(40 / num_steps))
        deltas = []
        for _ in range(3):
            deltas.append((run(hi_r) - run(lo_r)) / (hi_r - lo_r))
        deltas = [d for d in deltas if d > 0] or deltas
        deltas.sort()
        dt = deltas[len(deltas) // 2]
        ips = batch / dt
        nfe = {"nfe5": 5, "nfe10": 10, "nfe35": 35}[label]
        out[f"{label}_imgs_per_sec"] = round(ips, 3)
        if flops_per_image:
            out[f"{label}_mxu_pct"] = round(
                100.0 * ips * flops_per_image * nfe / V5E_PEAK, 1)
        print(json.dumps(out), flush=True)
    return out


def bench_cm(batch=16):
    """CM LSUN-Bedroom 256: unconditional, polynomial(7) schedule on the
    CM sigma range (0.002, 80)."""
    from diff_sampler_tpu.models.factory import build_cm_model
    from diff_sampler_tpu.models.precond import bind
    from diff_sampler_tpu.ops import get_schedule
    from diff_sampler_tpu.solvers import get_sampler

    module, params = build_cm_model("random", dtype=jnp.bfloat16)
    net = module.net
    res, chn = module.img_resolution, module.img_channels

    def rebound(p):
        return dataclasses.replace(
            module,
            model_fn=lambda x, t, y: net.apply({"params": p}, x, t, None),
            model_fn_bottleneck=None)

    probe = 2
    den_probe = jax.jit(lambda p, x, s: rebound(p)(x, s))
    try:
        flops_per_image = float(
            den_probe.lower(params, jnp.zeros((probe, res, res, chn)),
                            jnp.ones((probe,)))
            .compile().cost_analysis().get("flops", 0.0)) / probe
    except Exception:
        flops_per_image = 0.0

    out = {"metric": "cm_lsun_bedroom256_images_per_sec_per_chip",
           "batch": batch, "flops_per_image_per_nfe": flops_per_image,
           "weights": "random (throughput weight-independent)"}

    def make_fn(num_steps):
        t_steps = get_schedule(num_steps, module.sigma_min, module.sigma_max,
                               "polynomial", 7.0)

        @jax.jit
        def fn(p, lat, t=t_steps):
            d = bind(rebound(p))
            res_x = get_sampler("ipndm")(d, lat, t).x
            return lat + jnp.mean(res_x) * 1e-12

        return fn

    return _time_sampler(make_fn, params, batch, res, chn,
                         flops_per_image, out)


def bench_cg(batch=8, guidance_rate=2.0):
    """ADM ImageNet-256 + classifier guidance: per-image integer class
    labels, in-graph jax.grad through the noisy classifier each eval
    (sample.py:276-281 random labels; guidance scale from the reference's
    imagenet256 runs)."""
    from diff_sampler_tpu.models.factory import build_cg_model
    from diff_sampler_tpu.models.precond import bind
    from diff_sampler_tpu.ops import get_schedule
    from diff_sampler_tpu.solvers import get_sampler

    module, params = build_cg_model("random", guidance_rate,
                                    dtype=jnp.bfloat16)
    net, cls = module.net, module.classifier
    res, chn = module.img_resolution, module.img_channels
    labels = jnp.arange(batch, dtype=jnp.int32) % module.label_dim

    def rebound(p, lab):
        # copy.copy, NOT dataclasses.replace: replace reruns __post_init__,
        # whose float(self.sigma(...)) cannot run on a traced params tree
        d = copy.copy(module)
        d.model_fn = lambda x, t, y: net.apply({"params": p["model"]}, x, t, y)
        d.classifier_fn = lambda x, t: cls.apply({"params": p["classifier"]},
                                                 x, t)
        d.model_fn_bottleneck = None
        return bind(d, class_labels=lab)

    probe = 2
    den_probe = jax.jit(lambda p, x, s: rebound(p, labels[:probe])(x, s))
    try:
        flops_per_image = float(
            den_probe.lower(params, jnp.zeros((probe, res, res, chn)),
                            jnp.ones((probe,)))
            .compile().cost_analysis().get("flops", 0.0)) / probe
    except Exception:
        flops_per_image = 0.0

    out = {"metric": "adm_imagenet256_cg_images_per_sec_per_chip",
           "batch": batch, "guidance_rate": guidance_rate,
           "flops_per_image_per_nfe": flops_per_image,
           "weights": "random (throughput weight-independent)"}

    def make_fn(num_steps):
        t_steps = get_schedule(num_steps, module.sigma_min, module.sigma_max,
                               "polynomial", 7.0)

        @jax.jit
        def fn(p, lat, t=t_steps):
            d = rebound(p, labels)
            res_x = get_sampler("ipndm")(d, lat, t).x
            return lat + jnp.mean(res_x) * 1e-12

        return fn

    return _time_sampler(make_fn, params, batch, res, chn,
                         flops_per_image, out)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if len(sys.argv) > 3:  # e.g. "nfe35": run one point per invocation
        NFE_POINTS = [p for p in NFE_POINTS if p[0] in sys.argv[3:]]
    if which in ("all", "cm"):
        bench_cm(batch or 16)
    if which in ("all", "cg"):
        bench_cg(batch or 8)
