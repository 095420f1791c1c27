"""Tensor-parallel sharding tier: Megatron-style param shardings over a
2-D ('data','model') mesh must leave every forward/training result
unchanged (GSPMD inserts the collectives) while actually sharding the
big weight matrices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diff_sampler_tpu.parallel import tp as tpmod

CTX = 24


def _tiny_ldm_unet(num_heads=2):
    from diff_sampler_tpu.models.ldm import LDMUNet

    return LDMUNet(image_size=8, in_channels=4, out_channels=4,
                   model_channels=32, attention_resolutions=(2,),
                   num_res_blocks=1, channel_mult=(1, 2),
                   num_heads=num_heads, use_spatial_transformer=True,
                   transformer_depth=1, context_dim=CTX, legacy=False)


def test_mesh_2d_shape():
    mesh = tpmod.get_mesh_2d(2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        tpmod.get_mesh_2d(3)


def test_specs_cover_the_expected_roles():
    unet = _tiny_ldm_unet()
    x = jnp.zeros((1, 8, 8, 4))
    c = jnp.zeros((1, 3, CTX))
    params = unet.init(jax.random.key(0), x, jnp.ones((1,)), c)["params"]
    specs = tpmod.tp_param_specs(params, tp_size=2)

    def get(name, leaf="kernel"):
        return tuple(specs[name][leaf])

    # residual block: col/row conv pair
    assert get("input_blocks_1_0_in_layers_2") == (None, None, None, "model")
    assert get("input_blocks_1_0_out_layers_3") == (None, None, "model", None)
    def all_match(suffix, expect):
        ks = [k for k in specs if k.endswith(suffix)]
        assert ks, suffix
        for k in ks:
            assert tuple(specs[k]["kernel"]) == expect, (k, specs[k]["kernel"])
        return ks

    # cross-attention: heads col, out row; feed-forward: GEGLU col, out row
    all_match("_to_q", (None, "model"))
    all_match("_to_k", (None, "model"))
    all_match("_to_out_0", ("model", None))
    all_match("_net_0_proj", (None, "model"))
    all_match("_net_2", ("model", None))
    # SpatialTransformer boundary + biases + norms stay replicated
    pins = all_match("_proj_in", ())
    for pin in pins:
        pout = pin[: -len("_proj_in")] + "_proj_out"
        assert tuple(specs[pout]["kernel"]) == ()
    assert tuple(specs["input_blocks_1_0_in_layers_2"]["bias"]) == ()
    assert tuple(specs["input_blocks_1_0_in_layers_0"]["scale"]) == ()
    assert tpmod.count_sharded(specs) >= 8


def test_indivisible_dims_fall_back_to_replicated():
    unet = _tiny_ldm_unet()
    x = jnp.zeros((1, 8, 8, 4))
    c = jnp.zeros((1, 3, CTX))
    params = unet.init(jax.random.key(0), x, jnp.ones((1,)), c)["params"]
    specs = tpmod.tp_param_specs(params, tp_size=7)
    assert tpmod.count_sharded(specs) == 0


def test_ldm_unet_tp_forward_parity():
    """TP-sharded forward == replicated forward (the collectives GSPMD
    inserts must be value-preserving)."""
    unet = _tiny_ldm_unet()
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 8, 8, 4), jnp.float32)
    t = jnp.asarray([1.0, 5.0, 9.0, 40.0], jnp.float32)
    c = jnp.asarray(rs.randn(4, 3, CTX), jnp.float32)
    params = unet.init(jax.random.key(0), x, t, c)["params"]

    ref = jax.jit(lambda p: unet.apply({"params": p}, x, t, c))(params)

    mesh = tpmod.get_mesh_2d(2)
    params_tp = tpmod.shard_params_tp(params, mesh)
    data = NamedSharding(mesh, P("data", None, None, None))
    xs = jax.device_put(x, data)
    out = jax.jit(
        lambda p, z: unet.apply({"params": p}, z, t, c),
        out_shardings=NamedSharding(mesh, P()),
    )(params_tp, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_songunet_tp_forward_parity():
    """The same spec rules serve the nested EDM block naming."""
    import __graft_entry__ as g

    fn, (params, x, sigma) = g.entry(tiny=True)
    x = jnp.asarray(np.random.RandomState(1).randn(*x.shape), x.dtype)
    ref = jax.jit(fn)(params, x, sigma)

    mesh = tpmod.get_mesh_2d(2)
    specs = tpmod.tp_param_specs(params, tp_size=2)
    assert tpmod.count_sharded(specs) >= 4
    params_tp = tpmod.shard_params_tp(params, mesh, specs)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    out = jax.jit(fn, out_shardings=NamedSharding(mesh, P()))(params_tp, xs,
                                                              sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_latent_sfd_train_step_tp_dp():
    """One latent SFD distillation train step with params tensor-sharded
    and the batch data-sharded on the same 2-D mesh: runs, loss finite and
    equal to the replicated step, updated params keep their shardings."""
    import optax

    from diff_sampler_tpu.models.ldm import linear_alphas_cumprod
    from diff_sampler_tpu.models.precond import CFGPrecond
    from diff_sampler_tpu.training.sfd import SFDConfig, make_ldm_train_step

    unet = _tiny_ldm_unet()
    rs = np.random.RandomState(0)
    x0 = jnp.zeros((1, 8, 8, 4))
    c0 = jnp.zeros((1, 3, CTX))
    params = unet.init(jax.random.key(0), x0, jnp.ones((1,)), c0)["params"]

    def unet_apply(p, x, t, context):
        return unet.apply({"params": p}, x, t, context)

    precond = CFGPrecond(
        model_fn=lambda x, t, c: unet_apply(params, x, t, c),
        alphas_cumprod=linear_alphas_cumprod(0.00085, 0.012, 100),
        guidance_type="classifier-free", guidance_rate=7.5,
        img_resolution=8, img_channels=4)
    cfg = SFDConfig(num_steps=3, M=1, schedule_type="discrete",
                    schedule_rho=1.0, afs=False,
                    sigma_min=float(precond.sigma_min),
                    sigma_max=float(precond.sigma_max))
    optimizer = optax.adam(1e-4)
    step = make_ldm_train_step(unet_apply, precond, cfg, optimizer)

    batch = 8
    latents = jnp.asarray(rs.randn(batch, 8, 8, 4), jnp.float32)
    context = jnp.asarray(rs.randn(batch, 3, CTX), jnp.float32)
    opt_state = optimizer.init(params)
    teacher = jax.tree.map(lambda a: a.copy(), params)

    # replicated reference
    _, _, m_ref = jax.jit(step)(params, opt_state, teacher, latents, context)

    mesh = tpmod.get_mesh_2d(2)
    specs = tpmod.tp_param_specs(params, tp_size=2)
    params_tp = tpmod.shard_params_tp(params, mesh, specs)
    teacher_tp = tpmod.shard_params_tp(teacher, mesh, specs)
    opt_tp = optimizer.init(params_tp)
    data = NamedSharding(mesh, P("data", None, None, None))
    lat_s = jax.device_put(latents, data)
    ctx_s = jax.device_put(context, NamedSharding(mesh, P("data", None, None)))

    p2, _, metrics = jax.jit(step)(params_tp, opt_tp, teacher_tp, lat_s, ctx_s)
    loss_tp, loss_ref = float(metrics["loss"]), float(m_ref["loss"])
    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_ref, rtol=1e-4)
    # updated params keep the tensor sharding (no silent gather-to-replicated)
    k = "input_blocks_1_0_in_layers_2"
    spec = p2[k]["kernel"].sharding.spec
    assert tuple(spec)[-1] == "model", spec


def test_generate_on_2d_mesh_with_tp_params():
    """End-to-end sampling through `sampling.generate` on the 2-D mesh with
    tensor-sharded closed-over params must reproduce the replicated result:
    the 'data' batch axis and the 'model' weight axis compose."""
    from diff_sampler_tpu.models.ldm import linear_alphas_cumprod
    from diff_sampler_tpu.models.precond import CFGPrecond
    from diff_sampler_tpu.parallel import mesh as pm
    from diff_sampler_tpu.sampling import SolverConfig, generate

    unet = _tiny_ldm_unet()
    x0 = jnp.zeros((1, 8, 8, 4))
    c0 = jnp.zeros((1, 3, CTX))
    params0 = unet.init(jax.random.key(0), x0, jnp.ones((1,)), c0)["params"]
    ctx1 = jnp.asarray(np.random.RandomState(3).randn(1, 3, CTX), jnp.float32)

    def make_denoiser(params):
        return CFGPrecond(
            model_fn=lambda x, t, c: unet.apply(
                {"params": params}, x, t,
                jnp.broadcast_to(ctx1, (x.shape[0],) + ctx1.shape[1:])),
            alphas_cumprod=linear_alphas_cumprod(0.00085, 0.012, 100),
            guidance_type="uncond", guidance_rate=1.0,
            img_resolution=8, img_channels=4)

    den = make_denoiser(params0)
    cfg = SolverConfig(solver="dpmpp", num_steps=4, schedule_type="discrete",
                       schedule_rho=1.0)
    kw = dict(sigma_fn=den.sigma, sigma_inv_fn=den.sigma_inv,
              max_batch_size=8)
    ref = generate(den, range(8), (8, 8, 4), cfg, mesh=pm.get_mesh(), **kw)

    mesh2d = tpmod.get_mesh_2d(2)
    params_tp = tpmod.shard_params_tp(params0, mesh2d)
    out = generate(make_denoiser(params_tp), range(8), (8, 8, 4), cfg,
                   mesh=mesh2d, **kw)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_sample_cli_tp(tmp_path, monkeypatch):
    """`--tp=2` on a latent tier shards the U-Net over a (data, model) mesh
    and produces the same images as the data-parallel run (within 1 uint8
    quantization level)."""
    from click.testing import CliRunner
    from PIL import Image

    from diff_sampler_tpu.cli.sample import main
    from diff_sampler_tpu.models import ldm as ldm_mod
    from test_sfd_ldm import _tiny_ldm_configs

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    outs = {}
    for tp in (1, 2):
        out = tmp_path / f"tp{tp}"
        res = CliRunner().invoke(main, [
            "--dataset_name=lsun_bedroom_ldm", "--model_path=random",
            f"--tp={tp}", "--seeds=0-3", "--batch=4", "--num_steps=3",
            f"--outdir={out}", "--subdirs=False"], catch_exceptions=False)
        assert res.exit_code == 0, res.output
        pngs = sorted(out.glob("*.png"))
        assert len(pngs) == 4
        outs[tp] = np.stack([np.asarray(Image.open(p), np.int16)
                             for p in pngs])
        if tp == 2:
            assert "Tensor parallel" in res.output
    assert np.abs(outs[1] - outs[2]).max() <= 1


@pytest.mark.slow
def test_train_sfd_cli_tp(tmp_path, monkeypatch):
    """`--tp=2` on a latent training tier: student/teacher weights and Adam
    moments live tensor-sharded on the (data, model) mesh for the whole run,
    and training completes with a finite loss."""
    import json

    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_sfd import main
    from diff_sampler_tpu.models import ldm as ldm_mod
    from test_sfd_ldm import _tiny_ldm_configs

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    res = CliRunner().invoke(main, [
        "--dataset_name=lsun_bedroom_ldm", f"--outdir={tmp_path}",
        "--model_path=random", "--total_kimg=1", "--batch=512", "--tp=2",
        "--num_steps=3", "--m=1", "--schedule_type=discrete",
        "--schedule_rho=1", "--afs=False", "--guidance_type=uncond",
        "--tick=1", "--snap=1"], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert "Tensor parallel" in res.output
    run = next(tmp_path.iterdir())
    stats = (run / "stats.jsonl").read_text().strip().splitlines()
    assert stats and np.isfinite(
        json.loads(stats[-1])["Loss/loss"]["mean"])


def test_adm_unet_tp_forward_parity():
    """The guided-diffusion naming (qkv / proj_out with a qkv sibling,
    in_layers/out_layers conv pairs) gets the same col/row treatment; the
    scale-shift-norm emb_layers (2*cout fused output) stays replicated."""
    from diff_sampler_tpu.models.adm import ADMUNet

    unet = ADMUNet(image_size=32, in_channels=3, out_channels=3,
                   model_channels=32, num_res_blocks=1,
                   attention_resolutions=(4,), num_heads=4,
                   num_head_channels=16, use_scale_shift_norm=True,
                   resblock_updown=True)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 32, 32, 3), jnp.float32)
    t = jnp.asarray([10.0, 100.0, 500.0, 900.0], jnp.float32)
    params = unet.init(jax.random.key(0), x, t)["params"]

    specs = tpmod.tp_param_specs(params, tp_size=2)
    flat = {k: tuple(v["kernel"]) for k, v in specs.items() if "kernel" in v}
    qkv = [k for k in flat if k.endswith("_qkv")]
    assert qkv and all(flat[k] == (None, None, None, "model") for k in qkv)
    pouts = [k for k in flat if k.endswith("_proj_out")]
    assert pouts and all(flat[k] == (None, None, "model", None)
                         for k in pouts)
    ins = [k for k in flat if k.endswith("_in_layers_2")]
    assert ins and all(flat[k] == (None, None, None, "model") for k in ins)
    outs = [k for k in flat if k.endswith("_out_layers_3")]
    assert outs and all(flat[k] == (None, None, "model", None) for k in outs)
    embs = [k for k in flat if k.endswith("_emb_layers_1")]
    assert embs and all(flat[k] == () for k in embs)  # ssn modulation

    ref = jax.jit(lambda p: unet.apply({"params": p}, x, t))(params)
    mesh = tpmod.get_mesh_2d(2)
    params_tp = tpmod.shard_params_tp(params, mesh, specs)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    out = jax.jit(lambda p, z: unet.apply({"params": p}, z, t),
                  out_shardings=NamedSharding(mesh, P()))(params_tp, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_train_amed_cli_tp(tmp_path, monkeypatch):
    """AMED `--tp=2` on the SD tier: the frozen CFG-doubled net the
    predictor trains through is tensor-sharded; training completes."""
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_amed import main
    from diff_sampler_tpu.models import ldm as ldm_mod
    from test_amed_tiers import RES, SD_KW

    tiny = dict(
        linear_start=0.00085, linear_end=0.0120, timesteps=100,
        scale_factor=0.18215, conditioning_key="crossattn", first_stage="kl",
        unet=dict(SD_KW),
        vae=dict(z_channels=4, resolution=RES * 2, ch=32, ch_mult=(1, 2),
                 num_res_blocks=1, attn_resolutions=(), double_z=True),
        embed_dim=4)
    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS",
                        {**ldm_mod.LDM_CONFIGS, "ms_coco": tiny})
    res = CliRunner().invoke(main, [
        f"--outdir={tmp_path}", "--dataset_name=ms_coco",
        "--model_path=random", "--guidance_type=cfg", "--guidance_rate=7.5",
        "--total_kimg=1", "--batch=512", "--tp=2", "--num_steps=3", "--m=1",
        "--sampler_tea=euler", "--schedule_type=discrete",
        "--schedule_rho=1", "--afs=False"], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert "Tensor parallel" in res.output


def _tiny_adm(heads=2):
    from diff_sampler_tpu.models.adm import ADMUNet

    return ADMUNet(image_size=16, in_channels=3, out_channels=3,
                   model_channels=32, num_res_blocks=1,
                   attention_resolutions=(2,), channel_mult=(1, 2),
                   num_heads=heads, num_head_channels=-1,
                   use_scale_shift_norm=True, resblock_updown=True)


def test_adm_tp_specs_and_forward_parity():
    """tp_param_specs understands the guided-diffusion module naming
    (in_layers_2 / out_layers_3 / qkv / proj_out) and the sharded ADM
    forward matches the replicated one -- the round-3 hard error on
    pixel-tier --tp is lifted."""
    net = _tiny_adm()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16, 16, 3), jnp.float32)
    t = jnp.ones((4,))
    params = jax.jit(net.init)(jax.random.key(0), x[:1], t[:1])["params"]

    specs = tpmod.tp_param_specs(params, tp_size=2)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_name = {".".join(str(getattr(p, "key", p)) for p in path): s
               for path, s in flat}
    assert any("in_layers_2" in k and tuple(s) != () for k, s in by_name.items())
    assert any("out_layers_3" in k and tuple(s) != () for k, s in by_name.items())
    assert any(k.endswith("qkv.kernel") and tuple(s) != ()
               for k, s in by_name.items())
    assert any("proj_out" in k and tuple(s) != () for k, s in by_name.items())

    fn = lambda p, x_, t_: net.apply({"params": p}, x_, t_)
    ref = jax.jit(fn)(params, x, t)
    mesh = tpmod.get_mesh_2d(2)
    params_tp = tpmod.shard_params_tp(params, mesh, specs)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    out = jax.jit(fn, out_shardings=NamedSharding(mesh, P()))(params_tp, xs, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_shard_pixel_tensor_parallel_cm():
    """The factory's pixel-tier TP helper rebuilds the CM closures over the
    sharded tree; the bound denoiser still matches the replicated one."""
    from diff_sampler_tpu.models.precond import CMPrecond, bind
    from diff_sampler_tpu.models import factory

    net = _tiny_adm()
    x = jnp.asarray(np.random.RandomState(2).randn(4, 16, 16, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.key(0), x[:1], jnp.ones((1,)))["params"]
    precond = CMPrecond(
        model_fn=lambda x_, t_, y_: net.apply({"params": params}, x_, t_, None),
        img_resolution=16, img_channels=3, label_dim=0,
        model_fn_bottleneck=factory._capture_middle(net, params))
    precond.net = net
    den = bind(precond)
    sigma = jnp.full((4,), 2.5)
    ref = jax.jit(lambda x_, s_: den(x_, s_))(x, sigma)

    mesh = tpmod.get_mesh_2d(2)
    sharded = factory.shard_pixel_tensor_parallel(precond, params, mesh, "cm")
    assert tpmod.count_sharded(tpmod.tp_param_specs(sharded, 2)) >= 4
    den_tp = bind(precond)
    out = jax.jit(lambda x_, s_: den_tp(x_, s_),
                  out_shardings=NamedSharding(mesh, P()))(
        jax.device_put(x, NamedSharding(mesh, P("data", None, None, None))),
        sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_sdpa_shard_map_under_tp_context():
    """With set_tp_context installed, sdpa routes flash attention through
    shard_map over the (data, model) mesh: the kernels see the LOCAL
    [B/dp, T, H/tp, d] block (no GSPMD gather of the opaque Pallas call)
    and the result matches the un-sharded dispatch."""
    from diff_sampler_tpu.ops import pallas_attention as PA

    b, t, h, d = 4, 256, 4, 32
    rng = np.random.RandomState(7)
    q, k, v = (jnp.asarray(rng.randn(b, t, h, d).astype(np.float32) * 0.3)
               for _ in range(3))
    ref = PA.sdpa(q, k, v, force_flash=True)

    mesh = tpmod.get_mesh_2d(2)
    local_shapes = []
    orig = PA.flash_attention_mh

    def spy(q_, k_, v_, *a, **kw):
        local_shapes.append(q_.shape)
        return orig(q_, k_, v_, *a, **kw)

    PA.flash_attention_mh = spy
    PA.set_tp_context(mesh)
    try:
        qs = jax.device_put(q, NamedSharding(mesh, P("data", None, "model", None)))
        ks = jax.device_put(k, NamedSharding(mesh, P("data", None, "model", None)))
        vs = jax.device_put(v, NamedSharding(mesh, P("data", None, "model", None)))
        out = jax.jit(
            lambda a_, b_, c_: PA.sdpa(a_, b_, c_, force_flash=True),
            out_shardings=NamedSharding(mesh, P()))(qs, ks, vs)
    finally:
        PA.set_tp_context(None)
        PA.flash_attention_mh = orig
    assert local_shapes and local_shapes[0] == (1, t, 2, d), local_shapes
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sdpa_tp_context_indivisible_heads_falls_through():
    """Heads not divisible by tp -> the shard_map branch declines and the
    plain dispatch still runs."""
    from diff_sampler_tpu.ops import pallas_attention as PA

    b, t, h, d = 4, 256, 3, 32  # 3 heads, tp=2
    rng = np.random.RandomState(9)
    q, k, v = (jnp.asarray(rng.randn(b, t, h, d).astype(np.float32) * 0.3)
               for _ in range(3))
    ref = PA.sdpa(q, k, v, force_flash=True)
    PA.set_tp_context(tpmod.get_mesh_2d(2))
    try:
        out = PA.sdpa(q, k, v, force_flash=True)
    finally:
        PA.set_tp_context(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sdpa_shard_map_gradients_match():
    """Training under TP: grads through the shard_map-wrapped flash kernels
    match the un-sharded dispatch (custom_vjp runs per shard)."""
    from diff_sampler_tpu.ops import pallas_attention as PA

    b, t, h, d = 4, 256, 4, 32
    rng = np.random.RandomState(13)
    q, k, v = (jnp.asarray(rng.randn(b, t, h, d).astype(np.float32) * 0.3)
               for _ in range(3))
    loss = lambda a_, b_, c_: (PA.sdpa(a_, b_, c_, force_flash=True) ** 2).sum()
    ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    mesh = tpmod.get_mesh_2d(2)
    PA.set_tp_context(mesh)
    try:
        got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    finally:
        PA.set_tp_context(None)
    for name, a, b_ in zip("qkv", got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4,
                                   atol=1e-5, err_msg=f"d{name}")
