"""FSDP memory proof WITHOUT multi-chip hardware (VERDICT r4 item 5).

BENCH_NOTES round 4 measured that the 860M SD SFD train step at the f32
4-copy footprint (student + Adam m + v + f32 frozen teacher) does NOT fit
one 15.75 GiB v5e: batch 8 / microbatch 2 OOMs by 0.99 GiB, and the args
(not the temps) are the problem.  `parallel/fsdp.py` is motivated as the
memory lever for exactly this case -- this script proves the claim the
same way round 4 proved the OOM table: AOT lower+compile with XLA's own
`memory_analysis`, no execution, on the repo's standard 8-virtual-CPU-
device mesh (the driver's dryrun environment).

For both layouts (replicated = the reference's DDP contract,
sfd-main/training/training_loop.py:214; FSDP 1/8 = fsdp_param_specs over
student/teacher/moments) it reports XLA's per-device argument/temp/output
bytes, next to `fsdp_bytes_per_device`'s analytic prediction, so the
"fits at 1/8" row in BENCH_NOTES is XLA's number, not ours.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -u scripts/fsdp_memory_probe.py --tier ms_coco --batch 8 \
      --batch_gpu 2
"""

import argparse
import os
import sys
import time

# FORCE the CPU backend: this probe is a CPU-mesh tool by design (the
# whole point is proving memory without hardware), and the harness env
# pins JAX_PLATFORMS=axon -- setdefault would silently land on the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags +
                               " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The sitecustomize hook can import jax at interpreter start (before this
# script body runs), freezing the env-var reads with the axon TPU plugin
# active -- override through the config API as well (same as tests/conftest).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np


def gib(n):
    return n / 2**30


def report(tag, compiled):
    try:
        ma = compiled.memory_analysis()
        print(f"{tag}: XLA per-device memory: "
              f"args {gib(ma.argument_size_in_bytes):.2f} + "
              f"temp {gib(ma.temp_size_in_bytes):.2f} + "
              f"out {gib(ma.output_size_in_bytes):.2f} GiB "
              f"(alias {gib(ma.alias_size_in_bytes):.2f})", flush=True)
        return ma
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"{tag}: memory_analysis unavailable: {e}", flush=True)
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tier", default="ms_coco")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--batch_gpu", type=int, default=2)
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--skip_replicated", action="store_true",
                   help="only compile the FSDP layout")
    args = p.parse_args()

    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diff_sampler_tpu.models.factory import build_ldm_model
    from diff_sampler_tpu.parallel import fsdp as fsdpmod
    from diff_sampler_tpu.parallel.mesh import get_mesh
    from diff_sampler_tpu.training.sfd import SFDConfig, make_ldm_train_step

    n_dev = len(jax.devices())
    mesh = get_mesh()
    print(f"devices: {n_dev} x {jax.devices()[0].platform}", flush=True)

    t0 = time.perf_counter()
    # the exact on-chip OOM config: bf16 compute, remat on, f32 teacher,
    # f32 Adam moments (NO --teacher_bf16 / --mu_bf16 rescue)
    precond, _ = build_ldm_model(args.tier, "random", dtype=jnp.bfloat16,
                                 remat=True)
    ld = precond.latent_diffusion
    n_acc = max(1, args.batch // args.batch_gpu)
    cfg = SFDConfig(num_steps=args.num_steps, M=3, sampler_tea="dpmpp",
                    schedule_type="discrete", schedule_rho=1.0, afs=False)
    opt = optax.adam(5e-5)

    def unet_apply(pp, x, t, c=None):
        if c is None:
            return ld.unet.apply({"params": pp}, x, t)
        return ld.unet.apply({"params": pp}, x, t, c)

    step = make_ldm_train_step(unet_apply, precond, cfg, opt, n_acc=n_acc)
    params = ld.unet_params
    n_par = sum(a.size for a in jax.tree.leaves(params))
    par_gib = gib(sum(a.size * a.dtype.itemsize
                      for a in jax.tree.leaves(params)))
    print(f"build+init: {time.perf_counter() - t0:.1f}s  params={n_par/1e6:.0f}M "
          f"({par_gib:.2f} GiB f32)", flush=True)

    res, zc = ld.unet.image_size, ld.unet.in_channels
    lat = jax.ShapeDtypeStruct((args.batch, res, res, zc), jnp.float32)
    ctx = (jax.ShapeDtypeStruct((args.batch, 77, 768), jnp.float32)
           if args.tier == "ms_coco" else None)
    dshard = NamedSharding(mesh, P("data", None, None, None))
    dshard3 = NamedSharding(mesh, P("data", None, None))
    rep = NamedSharding(mesh, P())

    # abstract trees: AOT compile needs shapes+shardings, not data
    def abstract(tree, sh_tree):
        return jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            tree, sh_tree)

    opt_state = jax.eval_shape(opt.init, params)

    def compile_layout(tag, p_sh_tree):
        p_abs = abstract(params, p_sh_tree)
        t_abs = p_abs  # f32 teacher, same layout (the 4-copy config)
        # Adam state = (ScaleByAdamState(count, mu, nu), EmptyState): mu/nu
        # are param-shaped trees -> they inherit the param shardings (the
        # production wiring inits moments from the PLACED params,
        # cli/train_sfd.py); the count scalar replicates
        inner = opt_state[0]
        o_abs = (type(inner)(
            count=jax.ShapeDtypeStruct(inner.count.shape, inner.count.dtype,
                                       sharding=rep),
            mu=abstract(inner.mu, p_sh_tree),
            nu=abstract(inner.nu, p_sh_tree)),
        ) + tuple(jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep),
            s) for s in opt_state[1:])

        lat_a = jax.ShapeDtypeStruct(lat.shape, lat.dtype, sharding=dshard)
        args_abs = [p_abs, o_abs, t_abs, lat_a]
        if ctx is not None:
            args_abs.append(jax.ShapeDtypeStruct(ctx.shape, ctx.dtype,
                                                 sharding=dshard3))
        else:
            args_abs.append(None)
        jstep = jax.jit(step, donate_argnums=(0, 1))
        t0 = time.perf_counter()
        compiled = jstep.lower(*args_abs).compile()
        print(f"{tag}: compile {time.perf_counter() - t0:.1f}s", flush=True)
        return report(tag, compiled)

    # analytic prediction first (instant)
    specs = fsdpmod.fsdp_param_specs(params, n_dev)
    n_sh = fsdpmod.count_sharded_fsdp(specs)
    one = fsdpmod.fsdp_bytes_per_device(params, specs, n_dev)
    # 4 copies: student + teacher + Adam mu + nu, all f32 same layout
    print(f"FSDP prediction: {n_sh} weights sharded 1/{n_dev}; "
          f"per-device resident {gib(one):.2f} GiB/copy x 4 copies = "
          f"{gib(4 * one):.2f} GiB args (replicated: {4 * par_gib:.2f} GiB)",
          flush=True)

    fsdp_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                           is_leaf=lambda x: isinstance(x, P))
    compile_layout(f"fsdp 1/{n_dev}", fsdp_sh)  # the claim under test, first
    if not args.skip_replicated:
        rep_tree = jax.tree.map(lambda _: rep, params)
        compile_layout("replicated (DDP contract)", rep_tree)


if __name__ == "__main__":
    main()
