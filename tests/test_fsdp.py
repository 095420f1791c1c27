"""FSDP (ZeRO-3-style) sharding tier: params/teacher/optimizer moments
sharded 1/n over the data axis must leave training numerically unchanged
(GSPMD inserts the all-gather/reduce-scatter pairs) while actually cutting
per-device resident bytes.  Beyond-reference, like the TP tier: the
reference replicates everything (DDP, sfd-main/training/training_loop.py:214).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from diff_sampler_tpu.models import precond as PC
from diff_sampler_tpu.parallel import fsdp as fsdpmod
from diff_sampler_tpu.parallel.mesh import data_sharding, get_mesh, replicated
from diff_sampler_tpu.training.sfd import SFDConfig, make_train_step

RES, CH = 16, 3
KW = dict(model_channels=16, channel_mult=[1, 2], num_blocks=1,
          attn_resolutions=[8], dropout=0.0)


def _net_and_params():
    net = PC.EDMPrecond(img_resolution=RES, img_channels=CH, label_dim=0,
                        model_type="SongUNet", model_kwargs=KW)
    params = net.init(jax.random.key(0), jnp.zeros((1, RES, RES, CH)),
                      jnp.ones((1,)))["params"]
    return net, params


def test_spec_inference_rules():
    tree = {
        "big2d": jnp.zeros((256, 128)),      # largest dim 256 -> dim 0
        "tie": jnp.zeros((256, 256)),        # tie -> last divisible dim
        "conv": jnp.zeros((3, 3, 64, 128)),  # largest divisible -> dim 3
        "small": jnp.zeros((32, 32)),        # < min elems -> replicated
        "odd": jnp.zeros((255, 129)),        # nothing divides 8 -> replicated
        "scalar": jnp.zeros(()),
    }
    specs = fsdpmod.fsdp_param_specs(tree, 8)
    assert tuple(specs["big2d"]) == ("data", None)
    assert tuple(specs["tie"]) == (None, "data")
    assert tuple(specs["conv"]) == (None, None, None, "data")
    assert tuple(specs["small"]) == ()
    assert tuple(specs["odd"]) == ()
    assert tuple(specs["scalar"]) == ()
    assert fsdpmod.count_sharded_fsdp(specs) == 3
    # resident bytes: sharded leaves count 1/8
    expect = (256 * 128 + 256 * 256 + 3 * 3 * 64 * 128) // 8 * 4 \
        + (32 * 32 + 255 * 129 + 1) * 4
    assert fsdpmod.fsdp_bytes_per_device(tree, specs, 8) == expect


def test_fsdp_shards_a_real_unet():
    # the tiny 16-channel test net sits below the production min-shard
    # threshold (which exists so biases/norms stay replicated at scale);
    # lower it here to exercise the sharding machinery
    _, params = _net_and_params()
    mesh = get_mesh()
    specs = fsdpmod.fsdp_param_specs(params, mesh.shape["data"],
                                     min_shard_elems=512)
    n = fsdpmod.count_sharded_fsdp(specs)
    assert n >= 10, n  # the conv/attention kernels of even a tiny SongUNet
    placed = fsdpmod.shard_params_fsdp(params, mesh, specs,
                                       min_shard_elems=512)
    sharded = [l for l in jax.tree.leaves(placed)
               if not l.sharding.is_fully_replicated]
    assert len(sharded) == n
    # each sharded leaf is 1/8 resident per device
    for l in sharded:
        assert l.addressable_shards[0].data.size == l.size // 8


def test_fsdp_train_step_parity_and_layout():
    """Two SFD train steps under FSDP == replicated baseline, and the
    params coming OUT of the jit keep their 1/n shardings (the scan carry
    must not silently replicate)."""
    net, params = _net_and_params()
    cfg = SFDConfig(num_steps=3, M=1)
    opt = optax.adam(1e-3)
    step = make_train_step(net, cfg, opt)
    teacher = jax.tree.map(lambda a: a.copy(), params)
    student = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.key(1), a.shape),
        params)
    lat = jax.random.normal(jax.random.key(2), (8, RES, RES, CH))

    mesh = get_mesh()
    rep = replicated(mesh)
    shard = data_sharding(mesh, 4)

    def run(p_sh, place):
        p = place(student)
        t = place(teacher)
        o = opt.init(p)  # moments inherit the placed params' shardings
        # pin the opt-state layout through the jit (out_shardings=None lets
        # GSPMD re-layout moments -- observed drifting one leaf to
        # replicated, which defeats the FSDP memory point)
        o_sh = jax.tree.map(
            lambda l: l.sharding if isinstance(l.sharding, NamedSharding)
            else rep, o)
        jstep = jax.jit(step, in_shardings=(p_sh, o_sh, p_sh, shard),
                        out_shardings=(p_sh, o_sh, rep))
        losses = []
        for _ in range(2):
            p, o, m = jstep(p, o, t, jax.device_put(lat, shard))
            losses.append(float(m["loss"]))
        return p, o, losses

    p_ref, _, loss_ref = run(rep, lambda t: jax.device_put(t, rep))

    specs = fsdpmod.fsdp_param_specs(params, mesh.shape["data"],
                                     min_shard_elems=512)
    fsdp_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                           is_leaf=lambda x: isinstance(x, P))
    p_fsdp, o_fsdp, loss_fsdp = run(
        fsdp_sh, lambda t: fsdpmod.shard_params_fsdp(t, mesh, specs))

    # reduce-scatter changes the float reduction order vs the replicated
    # psum, and two sequential per-segment Adam updates feed that noise back
    # through the U-Net (same tolerance rationale as the grad-accumulation
    # parity test in test_amed.py)
    np.testing.assert_allclose(loss_fsdp, loss_ref, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(p_fsdp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-3)
    # layout: the updated params and the Adam moments stayed sharded
    n = fsdpmod.count_sharded_fsdp(specs)
    assert sum(1 for l in jax.tree.leaves(p_fsdp)
               if not l.sharding.is_fully_replicated) == n
    mu = o_fsdp[0].mu  # adam state
    assert sum(1 for l in jax.tree.leaves(mu)
               if not l.sharding.is_fully_replicated) == n


def test_fsdp_cli_flag_conflicts():
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_sfd import main

    r = CliRunner().invoke(main, ["--dataset_name=cifar10", "--fsdp",
                                  "--tp=2", "-n"])
    assert r.exit_code != 0
    assert "mutually exclusive" in r.output


@pytest.mark.slow
def test_fsdp_composes_with_ring_attention():
    """--fsdp plus --sp (the CLI documents them as composable): FSDP param
    shards over 'data' on a (data, seq) mesh while ring attention shards
    the attention tokens over 'seq'; one latent train step must run and
    keep the params sharded."""
    import optax
    from jax.sharding import NamedSharding

    from diff_sampler_tpu.models.ldm import LDMUNet, linear_alphas_cumprod
    from diff_sampler_tpu.models.precond import CFGPrecond
    from diff_sampler_tpu.ops import ring_attention as RA
    from diff_sampler_tpu.parallel import tp as tpmod
    from diff_sampler_tpu.training.sfd import SFDConfig, make_ldm_train_step

    mesh = tpmod.get_mesh_2d(2, model_axis="seq")
    ctx_dim = 16
    unet = LDMUNet(image_size=8, in_channels=4, out_channels=4,
                   model_channels=32, attention_resolutions=(2,),
                   num_res_blocks=1, channel_mult=(1, 2), num_heads=2,
                   use_spatial_transformer=True, transformer_depth=1,
                   context_dim=ctx_dim, legacy=False)
    params = unet.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.ones((1,)), jnp.zeros((1, 3, ctx_dim)))["params"]

    def unet_apply(p, x, t, c):
        return unet.apply({"params": p}, x, t, c)

    precond = CFGPrecond(
        model_fn=lambda x, t, c: unet_apply(params, x, t, c),
        alphas_cumprod=linear_alphas_cumprod(0.00085, 0.012, 100),
        guidance_type="classifier-free", guidance_rate=7.5,
        img_resolution=8, img_channels=4)
    cfg = SFDConfig(num_steps=3, M=1, schedule_type="discrete",
                    schedule_rho=1.0, afs=False,
                    sigma_min=float(precond.sigma_min),
                    sigma_max=float(precond.sigma_max))
    opt = optax.adam(1e-4)
    step = make_ldm_train_step(unet_apply, precond, cfg, opt)

    specs = fsdpmod.fsdp_param_specs(params, mesh.shape["data"],
                                     min_shard_elems=512)
    n = fsdpmod.count_sharded_fsdp(specs)
    assert n >= 5, n
    fsdp_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                           is_leaf=lambda x: isinstance(x, P))
    p = jax.device_put(params, fsdp_sh)
    t = jax.device_put(jax.tree.map(lambda a: a.copy(), params), fsdp_sh)
    o = opt.init(p)
    rep = NamedSharding(mesh, P())
    o_sh = jax.tree.map(
        lambda l: l.sharding if isinstance(l.sharding, NamedSharding)
        else rep, o)
    lat_sh = NamedSharding(mesh, P("data", None, None, None))
    ctx_sh = NamedSharding(mesh, P("data", None, None))
    lat = jax.device_put(
        jnp.asarray(np.random.RandomState(0).randn(8, 8, 8, 4), jnp.float32),
        lat_sh)
    ctx = jax.device_put(
        jnp.asarray(np.random.RandomState(1).randn(8, 3, ctx_dim),
                    jnp.float32), ctx_sh)

    old_thresh, RA._SP_MIN_TOKENS = RA._SP_MIN_TOKENS, 8
    RA.set_sp_context(mesh, seq_axis="seq", batch_axis="data")
    try:
        jstep = jax.jit(step,
                        in_shardings=(fsdp_sh, o_sh, fsdp_sh, lat_sh, ctx_sh),
                        out_shardings=(fsdp_sh, o_sh, rep))
        p, o, m = jstep(p, o, t, lat, ctx)
    finally:
        RA.set_sp_context(None)
        RA._SP_MIN_TOKENS = old_thresh
    assert np.isfinite(float(m["loss"]))
    assert sum(1 for l in jax.tree.leaves(p)
               if not l.sharding.is_fully_replicated) == n
