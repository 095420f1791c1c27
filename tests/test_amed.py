"""AMED parity tests: predictor MLP vs torch reference, and full
AMED-solver/plugin sampling loops vs `amed-solver-main/solvers_amed.py` on an
identical tiny EDM SongUNet (weights shared through the torch importer)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_sampler_tpu.models import precond as P
from diff_sampler_tpu.models.torch_import import state_dict_to_params
from diff_sampler_tpu.ops import get_schedule
from diff_sampler_tpu.solvers import amed as A

RES, CH = 16, 3
UNET_KW = dict(model_channels=16, channel_mult=[1, 2], num_blocks=4,
               attn_resolutions=[8], dropout=0.0)


@pytest.fixture(scope="module")
def ref_amed(reference_dir):
    base = str(reference_dir / "amed-solver-main")
    sys.path.insert(0, base)
    for m in [k for k in list(sys.modules) if k == "models" or k.startswith("models.")
              or k in ("solvers_amed", "solver_utils", "training")
              or k.startswith("training.")]:
        del sys.modules[m]
    import solvers_amed
    from models import networks_edm
    from training import networks as amed_networks
    yield solvers_amed, networks_edm, amed_networks
    sys.path.remove(base)
    for m in [k for k in list(sys.modules) if k == "models" or k.startswith("models.")
              or k in ("solvers_amed", "solver_utils", "training")
              or k.startswith("training.")]:
        del sys.modules[m]


def _nets(ref_amed, scale_dir=0.01, scale_time=0.02):
    import torch

    solvers_amed, networks_edm, amed_networks = ref_amed
    torch.manual_seed(0)
    net_t = networks_edm.EDMPrecond(img_resolution=RES, img_channels=CH,
                                    label_dim=0, model_type="SongUNet", **UNET_KW)
    net_t.eval()
    pred_t = amed_networks.AMED_predictor(
        num_steps=4, sampler_stu="amed", sampler_tea="heun",
        img_resolution=RES, scale_dir=scale_dir, scale_time=scale_time)
    pred_t.eval()

    params = state_dict_to_params(net_t.state_dict())
    net_j = P.EDMPrecond(img_resolution=RES, img_channels=CH, label_dim=0,
                         model_type="SongUNet", model_kwargs=UNET_KW)
    pred_params = state_dict_to_params(pred_t.state_dict())
    pred_j = A.AMEDPredictor(scale_dir=scale_dir, scale_time=scale_time)
    den_b = A.bind_with_bottleneck(net_j, params,
                                   A.bottleneck_module_name(0, RES))

    def pred_apply(b, tc, tn):
        return pred_j.apply({"params": pred_params}, b, tc, tn)

    return net_t, pred_t, den_b, pred_apply


def test_predictor_parity(ref_amed):
    import torch

    _, _, amed_networks = ref_amed
    torch.manual_seed(1)
    pred_t = amed_networks.AMED_predictor(
        num_steps=4, sampler_stu="amed", sampler_tea="heun",
        img_resolution=RES, scale_dir=0.05, scale_time=0.1)
    pred_t.eval()
    pred_params = state_dict_to_params(pred_t.state_dict())
    pred_j = A.AMEDPredictor(scale_dir=0.05, scale_time=0.1)

    rng = np.random.RandomState(0)
    bott = rng.randn(3, 8, 8).astype(np.float32)
    with torch.no_grad():
        r_t, sd_t, st_t = pred_t(torch.as_tensor(bott),
                                 torch.tensor([2.5]), torch.tensor([0.7]))
    r_j, sd_j, st_j = pred_j.apply({"params": pred_params},
                                   jnp.asarray(bott.reshape(3, 64)),
                                   jnp.asarray(2.5), jnp.asarray(0.7))
    np.testing.assert_allclose(np.asarray(r_j).ravel(), r_t.numpy().ravel(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sd_j).ravel(), sd_t.numpy().ravel(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_j).ravel(), st_t.numpy().ravel(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["amed", "euler", "ipndm", "dpm", "dpmpp"])
def test_amed_sampler_parity(ref_amed, mode):
    import torch

    solvers_amed = ref_amed[0]
    net_t, pred_t, den_b, pred_apply = _nets(ref_amed)
    num_steps = 4
    rng = np.random.RandomState(2)
    lat = rng.randn(2, CH, RES, RES).astype(np.float32)

    ref_fn = {"amed": solvers_amed.amed_sampler,
              "euler": solvers_amed.euler_sampler,
              "ipndm": solvers_amed.ipndm_sampler,
              "dpm": solvers_amed.dpm_2_sampler,
              "dpmpp": solvers_amed.dpm_pp_sampler}[mode]
    with torch.no_grad():
        out_t = ref_fn(net_t, torch.as_tensor(lat), num_steps=num_steps,
                       AMED_predictor=pred_t, train=False, max_order=3).numpy()

    t_steps = get_schedule(num_steps, 0.002, 80.0, "polynomial", 7.0)
    sampler = A.AMED_SOLVER_REGISTRY[mode]
    out_j = sampler(den_b, pred_apply,
                    jnp.asarray(lat.transpose(0, 2, 3, 1)), t_steps,
                    max_order=3).x
    out_j = np.asarray(out_j).transpose(0, 3, 1, 2)
    err = np.abs(out_j - out_t).max()
    assert err < 5e-4, (mode, err)


@pytest.mark.slow
def test_amed_training_smoke():
    """AMED trainer end-to-end on the analytic path: loss finite and the
    predictor params actually move."""
    import optax

    from diff_sampler_tpu.training.amed import (AMEDConfig,
                                                make_amed_train_step,
                                                predictor_from_config)

    net_j = P.EDMPrecond(img_resolution=RES, img_channels=CH, label_dim=0,
                         model_type="SongUNet", model_kwargs=UNET_KW)
    params = net_j.init(jax.random.key(0), jnp.zeros((1, RES, RES, CH)),
                        jnp.ones((1,)))["params"]
    den_b = A.bind_with_bottleneck(net_j, params,
                                   A.bottleneck_module_name(0, RES))
    cfg = AMEDConfig(num_steps=4, M=1, sampler_stu="amed", sampler_tea="heun",
                     scale_dir=0.01, scale_time=0.0)
    pred = predictor_from_config(cfg)
    pred_params = pred.init(jax.random.key(1), jnp.zeros((2, 64)),
                            jnp.asarray(1.0), jnp.asarray(0.5))["params"]
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(pred_params)
    step = jax.jit(make_amed_train_step(pred, den_b, cfg, opt))

    lat = jax.random.normal(jax.random.key(2), (4, RES, RES, CH))
    new_params, opt_state, metrics = step(pred_params, opt_state, lat)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         pred_params, new_params)
    assert max(jax.tree.leaves(moved)) > 0.0


def test_amed_grad_accumulation_matches_full_batch():
    """batch_gpu microbatching (the reference's --batch-gpu accumulation
    rounds, amed training_loop.py:197-205) must produce the same update as
    the full-batch step up to fp reordering."""
    import dataclasses

    import optax

    from diff_sampler_tpu.training.amed import (AMEDConfig,
                                                make_amed_train_step,
                                                predictor_from_config)

    net_j = P.EDMPrecond(img_resolution=RES, img_channels=CH, label_dim=0,
                         model_type="SongUNet", model_kwargs=UNET_KW)
    params = net_j.init(jax.random.key(0), jnp.zeros((1, RES, RES, CH)),
                        jnp.ones((1,)))["params"]
    den_b = A.bind_with_bottleneck(net_j, params,
                                   A.bottleneck_module_name(0, RES))
    cfg = AMEDConfig(num_steps=3, M=1, sampler_stu="amed", sampler_tea="heun")
    pred = predictor_from_config(cfg)
    pred_params = pred.init(jax.random.key(1), jnp.zeros((2, 64)),
                            jnp.asarray(1.0), jnp.asarray(0.5))["params"]
    # SGD: updates are linear in the accumulated gradient, so equivalence is
    # testable (Adam's normalized update amplifies fp-reorder noise on
    # near-zero gradients into sign flips)
    opt = optax.sgd(0.1)
    lat = jax.random.normal(jax.random.key(2), (4, RES, RES, CH))

    outs = {}
    for bg in (None, 2):
        c = dataclasses.replace(cfg, batch_gpu=bg)
        step = jax.jit(make_amed_train_step(pred, den_b, c, opt))
        p2, _, m = step(pred_params, opt.init(pred_params), lat)
        outs[bg] = (p2, float(m["loss"]))
    pa, la = outs[None]
    pb, lb = outs[2]
    assert abs(la - lb) / abs(la) < 1e-4  # fp reordering only
    # params drift slightly more: updates are applied sequentially per
    # segment, so reorder noise feeds back through the U-Net between updates
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-3)


def test_amed_remat_traj_matches():
    """remat_traj=True (jax.checkpoint around the frozen-net evals) is
    checked where `jax.checkpoint` actually makes a guarantee:

    1. the loss replays identically (measured rel 2e-7 on this host);
    2. raw GRADIENTS match up to XLA re-fusion of the recomputed backward
       (measured max-abs 6e-5 against a grad scale of 1.6e3, i.e. ~4e-8
       relative to scale) -- asserted per-leaf at 1e-5 x the global grad
       scale;
    3. post-Adam params agree to atol = 2*lr. Adam's m/sqrt(v)
       normalization maps ANY nonzero grad element to a step of magnitude
       ~lr, so a re-fusion-level sign flip on a near-zero grad moves a
       param by up to 2*lr per update -- that is the analytic noise floor,
       NOT a remat bug (measured max-abs 2.4e-3 < lr/2 at lr=5e-3;
       VERDICT/ADVICE round 4)."""
    import dataclasses

    import optax

    from diff_sampler_tpu.ops import get_schedule
    from diff_sampler_tpu.training.amed import (AMEDConfig,
                                                make_amed_train_step,
                                                predictor_from_config)

    net_j = P.EDMPrecond(img_resolution=RES, img_channels=CH, label_dim=0,
                         model_type="SongUNet", model_kwargs=UNET_KW)
    params = net_j.init(jax.random.key(0), jnp.zeros((1, RES, RES, CH)),
                        jnp.ones((1,)))["params"]
    den_b = A.bind_with_bottleneck(net_j, params,
                                   A.bottleneck_module_name(0, RES))
    cfg = AMEDConfig(num_steps=3, M=1, sampler_stu="amed", sampler_tea="heun")
    pred = predictor_from_config(cfg)
    pred_params = pred.init(jax.random.key(1), jnp.zeros((2, 64)),
                            jnp.asarray(1.0), jnp.asarray(0.5))["params"]
    opt = optax.adam(cfg.lr)
    lat = jax.random.normal(jax.random.key(2), (4, RES, RES, CH))

    # (2) gradient parity through one trajectory segment
    t_steps = get_schedule(cfg.num_steps, cfg.sigma_min, cfg.sigma_max,
                           cfg.schedule_type, cfg.schedule_rho)
    seg_t = t_steps[0:2]
    x_in = lat * jnp.float32(t_steps[0])
    tea = jax.random.normal(jax.random.key(3), x_in.shape)

    def make_loss(rm):
        def loss_fn(pp):
            def pred_apply(b, tc, tn):
                return pred.apply({"params": pp}, b, tc, tn)
            res, _, _ = A._amed_family(
                den_b, pred_apply, x_in / jnp.float32(seg_t[0]), seg_t,
                mode="amed", train=True, step_idx=0,
                total_num_steps=cfg.num_steps, remat=rm)
            return ((res.x - tea) ** 2).sum() / x_in.shape[0]
        return loss_fn

    g0 = jax.jit(jax.grad(make_loss(False)))(pred_params)
    g1 = jax.jit(jax.grad(make_loss(True)))(pred_params)
    gscale = max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g0))
    assert gscale > 1.0  # the comparison below must not be vacuous
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5 * gscale)

    # (1) + (3) full train step: loss exact, params within the Adam floor
    outs = {}
    for rm in (False, True):
        c = dataclasses.replace(cfg, remat_traj=rm)
        step = jax.jit(make_amed_train_step(pred, den_b, c, opt))
        p2, _, m = step(pred_params, opt.init(pred_params), lat)
        outs[rm] = (p2, float(m["loss"]))
    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[True][0]),
                    jax.tree.leaves(outs[False][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2 * cfg.lr)
